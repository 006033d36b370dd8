package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame}
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
  * per-partition row-count sentinel). The pass-1 summary is cached only
  * for the instant both its consumers need it — the precondition check
  * and the candidate set are materialized eagerly (both bounded by
  * partitions × capacity, the same size the candidate broadcast already
  * requires to fit on the driver) and the cache is released before the
  * recount job runs, so repeated invocations in one session hold no
  * cached partitions (round-6 advice).
  */
object HeavyHitters {

  /** Fixed absolute threshold. Prefer [[thresholdHittersRel]] for
    * anything long-lived: an absolute bar silently stops meaning "heavy"
    * when the input grows (round-6 scale note on q98).
    */
  def thresholdHitters(df: DataFrame, keyCol: String,
                       capacity: Int, minFreq: Long): DataFrame =
    run(df, keyCol, capacity, _ => minFreq)

  /** N-relative threshold: keep keys with freq ≥ max(1, ⌈N·num/den⌉),
    * where N is the total row count measured in pass 1. The bound is
    * computed in exact integer arithmetic (`(N·num + den−1) / den`) so an
    * external oracle can reproduce it without float-rounding hazards, and
    * it scales with the data — the no-false-negative precondition
    * (minFreq·capacity ≥ N) holds at ANY scale once num·capacity ≥ den.
    */
  def thresholdHittersRel(df: DataFrame, keyCol: String, capacity: Int,
                          num: Long, den: Long): DataFrame = {
    require(num >= 1 && den >= 1, s"bad fraction $num/$den")
    require(num * capacity >= den,
      s"thresholdHittersRel: num/den=$num/$den below 1/capacity=1/$capacity — " +
        "the sketch could miss a qualifying key at some scale; raise capacity or the fraction")
    run(df, keyCol, capacity, n => ((n * num + den - 1) / den).max(1L))
  }

  private def run(df: DataFrame, keyCol: String,
                  capacity: Int, minFreqOf: Long => Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(capacity >= 1, s"bad capacity=$capacity")

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
    val minFreq = minFreqOf(n)
    require(minFreq >= 1, s"bad minFreq=$minFreq")
    require(minFreq * capacity >= n,
      s"thresholdHitters: minFreq=$minFreq × capacity=$capacity < N=$n — " +
        "the sketch could miss a qualifying key; raise capacity or minFreq")

    // Bounded collect (≤ partitions × capacity keys — the size the
    // broadcast below needs driver-resident anyway), then release the
    // pass-1 cache before the recount job.
    val candKeys = partial.filter($"k" =!= Long.MinValue)
      .select($"k").distinct().as[Long].collect()
    partial.unpersist()
    val cands = candKeys.toSeq.toDF(keyCol)
    df.select(col(keyCol).cast("long").as(keyCol))
      .join(broadcast(cands), Seq(keyCol))
      .groupBy(keyCol).agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minFreq)
      .orderBy(keyCol)
  }

  /** Count-min sketch (Cormode & Muthukrishnan '05) + per-key calibration:
    * build a d×w counter grid (row i counts keys by md5-derived bucket
    * hᵢ(k)), estimate each key's frequency as the MIN of its d counters,
    * and join the estimates against the exact counts so the sketch's
    * one-sided guarantee (est ≥ true, overshoot ≤ εN with prob 1−δ at
    * d = ln 1/δ, w = e/ε) is a MEASURED gate row, not a cited one — the
    * q87/q91 sketch-calibration discipline applied to frequencies.
    *
    * Scale shape: the grid build is one map-side-combined aggregation
    * onto a FIXED d·w counter domain — the shuffle never grows with the
    * key domain (the same property the Misra-Gries pass above buys;
    * count-min adds mergeability-by-addition, the form a 1000-executor
    * ingest pre-aggregates). The exact-count pass exists only for the
    * calibration join; production reads estimates straight off the grid.
    * Hashing is md5-based (engine-portable, oracle-checkable); keys are
    * rendered as strings so any key type sketches identically. */
  def countMin(df: DataFrame, keyCol: String, d: Int = 4,
               w: Int = 1024): DataFrame = {
    def bucket(i: Column, k: Column): Column =
      conv(substring(md5(concat(i.cast("string"), lit(":"), k)), 1, 8), 16, 10)
        .cast("long") % w
    val rowIdx = array((0 until d).map(lit(_)): _*)
    val keyed = df.select(col(keyCol).cast("string").as("k"))
    val cms = keyed.select(col("k"), explode(rowIdx).as("i"))
      .withColumn("bucket", bucket(col("i"), col("k")))
      .groupBy("i", "bucket").agg(count(lit(1)).as("cnt"))
    val exact = keyed.groupBy("k").agg(count(lit(1)).as("true_n"))
    exact.select(col("k"), col("true_n"), explode(rowIdx).as("i"))
      .withColumn("bucket", bucket(col("i"), col("k")))
      .join(cms, Seq("i", "bucket"))
      .groupBy("k", "true_n").agg(min("cnt").as("est_n"))
      .select(col("k"), col("true_n"), col("est_n"),
        when(col("est_n") >= col("true_n"), 1L).otherwise(0L).as("within_bound"))
  }
}
