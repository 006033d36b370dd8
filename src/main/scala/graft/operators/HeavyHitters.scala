package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact threshold heavy hitters without shuffling every distinct key —
  * the two-pass candidate/verify scheme built on Misra-Gries summaries
  * (Misra & Gries 1982; the mergeability analysis is Agarwal et al.,
  * PODS'12).
  *
  * Pass 1 (mapPartitions, no shuffle): each partition runs Misra-Gries
  * with `capacity` counters over its keys, emitting ≤ capacity surviving
  * candidates. The guarantee is the pigeonhole: a key with GLOBAL
  * frequency ≥ N/capacity must have partition frequency ≥ n_p/capacity in
  * at least one partition p (if it sat below the per-partition bar
  * everywhere, the partition frequencies would sum below N/capacity), and
  * MG never fully evicts a key with partition frequency > n_p/capacity.
  * So the union of partition survivors is a SUPERSET of every key with
  * global frequency ≥ N/capacity.
  *
  * Pass 2: exact recount of the candidate keys only (broadcast semi-join
  * + one aggregation), keep those with freq ≥ minFreq. Exact overall
  * because pass 1 only over-includes, and `require(minFreq · capacity ≥
  * N)` pins the no-false-negative precondition at runtime — an
  * under-provisioned sketch fails loudly instead of dropping hitters.
  *
  * Why it matters at 100 TB: `groupBy(key).count()` shuffles one record
  * per (partition, distinct key) — for heavy-tailed key domains (URLs,
  * user ids, tokens) that IS the job. This operator's shuffle is
  * O(partitions × capacity) regardless of the key domain, and the second
  * pass hash-joins against a broadcast candidate set, so non-candidate
  * rows never leave their input partition. This is the
  * per-partition-imperative case the design rules reserve mapPartitions
  * for: MG's decrement-all step has no declarative equivalent.
  *
  * Contract: keys are non-negative longs (Long.MinValue is the internal
  * per-partition row-count sentinel). Like [[TextOps.nearDupDropIds]],
  * the pass-1 summary is cached: it feeds both the precondition check
  * and the candidate set.
  */
object HeavyHitters {

  def thresholdHitters(df: DataFrame, keyCol: String,
                       capacity: Int, minFreq: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(capacity >= 1 && minFreq >= 1, s"bad capacity=$capacity minFreq=$minFreq")

    val keys = df.select(col(keyCol).cast("long")).as[Long]
    val partial = keys.mapPartitions { it =>
      val counts = new java.util.HashMap[java.lang.Long, java.lang.Long](capacity * 2)
      var np = 0L
      it.foreach { k =>
        require(k != Long.MinValue, "thresholdHitters: reserved key value")
        np += 1L
        val cur = counts.getOrDefault(k, 0L)
        if (cur > 0L || counts.size < capacity) counts.put(k, cur + 1L)
        else {
          // decrement-all: amortized O(1) per input row (every decrement
          // cancels exactly one earlier increment); zeros are evicted
          val entries = counts.entrySet().iterator()
          while (entries.hasNext) {
            val e = entries.next()
            if (e.getValue == 1L) entries.remove()
            else e.setValue(e.getValue - 1L)
          }
        }
      }
      Iterator.single((Long.MinValue, np)) ++
        counts.entrySet().asScala.iterator
          .map(e => (e.getKey.longValue(), e.getValue.longValue()))
    }.toDF("k", "c").cache()

    val n = partial.filter($"k" === Long.MinValue)
      .agg(coalesce(sum($"c"), lit(0L))).as[Long].head()
    require(minFreq * capacity >= n,
      s"thresholdHitters: minFreq=$minFreq × capacity=$capacity < N=$n — " +
        "the sketch could miss a qualifying key; raise capacity or minFreq")

    val cands = partial.filter($"k" =!= Long.MinValue)
      .select($"k".as(keyCol)).distinct()
    df.select(col(keyCol).cast("long").as(keyCol))
      .join(broadcast(cands), Seq(keyCol))
      .groupBy(keyCol).agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minFreq)
      .orderBy(keyCol)
  }
}
