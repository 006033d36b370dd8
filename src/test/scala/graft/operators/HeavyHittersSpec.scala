package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // skewed stream: two planted hitters + a uniform tail, 10k rows
  private def skewed = {
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(3000)(1L) ++ Seq.fill(1500)(2L) ++
      Seq.fill(5500)(3L + rnd.nextLong(997L))
    rnd.shuffle(rows).toDF("k").repartition(11)
  }

  test("equals the exact groupBy-count form under eviction pressure") {
    val df = skewed.cache()
    // capacity 100 over N=10000: minFreq 100 satisfies 100·100 ≥ 10000,
    // and 997 distinct tail keys >> capacity forces real MG evictions
    val got = HeavyHitters.thresholdHitters(df, "k", capacity = 100, minFreq = 100)
      .as[(Long, Long)].collect().toSeq
    val want = df.groupBy("k").agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= 100).orderBy("k")
      .as[(Long, Long)].collect().toSeq
    assert(got == want)
    assert(got.map(_._1).toSet == Set(1L, 2L))
    df.unpersist()
  }

  test("under-provisioned sketch fails loudly, not silently") {
    val e = intercept[IllegalArgumentException] {
      // 10·100 < 10000 — a qualifying key could be missed
      HeavyHitters.thresholdHitters(skewed, "k", capacity = 100, minFreq = 10)
        .collect()
    }
    assert(e.getMessage.contains("could miss"))
  }

  test("threshold with no qualifying keys returns empty") {
    val df = Seq.fill(100)(7L).toDF("k")
    val got = HeavyHitters.thresholdHitters(df, "k", capacity = 4, minFreq = 101)
    assert(got.isEmpty)
  }

  test("N-relative bar equals the exact form at two scales") {
    // freq ≥ ⌈N/100⌉: at N=10000 → 100 (same bar as the absolute spec);
    // doubling the data doubles the bar, so the SAME keys qualify — the
    // property an absolute minFreq loses under growth
    for (copies <- Seq(1, 2)) {
      val df = (1 to copies).map(_ => skewed).reduce(_ union _).cache()
      val n = df.count()
      val got = HeavyHitters.thresholdHittersRel(df, "k", capacity = 100,
          num = 1, den = 100)
        .as[(Long, Long)].collect().toSeq
      val want = df.groupBy("k").agg(count(lit(1)).as("freq"))
        .filter(col("freq") >= (n + 99) / 100).orderBy("k")
        .as[(Long, Long)].collect().toSeq
      assert(got == want, s"copies=$copies")
      assert(got.map(_._1).toSet == Set(1L, 2L))
      df.unpersist()
    }
  }

  test("a fraction below 1/capacity is rejected up front") {
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.thresholdHittersRel(skewed, "k", capacity = 100,
        num = 1, den = 1000)
    }
    assert(e.getMessage.contains("below 1/capacity"))
  }

  test("repeated invocations leave no cached partitions behind") {
    // delta check, not isEmpty: the suite session is shared and other
    // operators legitimately hold localCheckpoint blocks until GC
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = skewed
    HeavyHitters.thresholdHitters(df, "k", capacity = 100, minFreq = 100).count()
    HeavyHitters.thresholdHittersRel(df, "k", capacity = 100, num = 1, den = 100).count()
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.isEmpty,
      s"pass-1 summary cache must be released before the operator returns; leaked ids $added")
  }

  test("countMin: matches a Scala sketch replay; tiny grid forces collisions") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val keys = (0 until 400).map(_ => rnd.nextInt(30).toLong)
    val df = keys.toDF("k")
    val (d, w) = (2, 8) // 30 keys into 8 buckets: collisions guaranteed
    val got = HeavyHitters.countMin(df, "k", d = d, w = w)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // replay the md5 grid in Scala
    def bucket(i: Int, k: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$i:$k".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % w
    }
    val trueN = keys.groupBy(_.toString).view.mapValues(_.size.toLong).toMap
    val cms = keys.flatMap(k => (0 until d).map(i => (i, bucket(i, k.toString))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = trueN.toSeq.sortBy(_._1).map { case (k, n) =>
      val est = (0 until d).map(i => cms((i, bucket(i, k)))).min
      (k, n, est, if (est >= n) 1L else 0L)
    }
    assert(got == want)
    assert(got.forall(_._4 == 1L))           // one-sided bound always holds
    assert(got.exists(r => r._3 > r._2))     // the tiny grid DID collide
  }
}
