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
}
