package graft.operators

import graft.SparkSpec

class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin is result-identical to the plain join under heavy skew") {
    val rnd = new scala.util.Random(13)
    // 90% of rows share one hot key
    val large = Seq.fill(2000)((if (rnd.nextDouble() < 0.9) "hot" else s"k${rnd.nextInt(20)}",
      rnd.nextInt(1000))).toDF("key", "payload")
    val small = (Seq("hot") ++ (0 until 20).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, i * 10) }.toDF("key", "dim")
    val plain = large.join(small, "key")
      .groupBy("key", "payload", "dim").count()
      .as[(String, Int, Int, Long)].collect().toSet
    val salted = SkewOps.saltedJoin(large, small, "key", saltFactor = 8)
      .groupBy("key", "payload", "dim").count()
      .as[(String, Int, Int, Long)].collect().toSet
    assert(salted == plain)
  }
}
