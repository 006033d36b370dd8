package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AffinityOpsSpec extends SparkSpec {
  import spark.implicits._

  test("copurchasePairs: presence semantics, support floor, exact lift") {
    // baskets: {x,y} ×2, {x,y,z}, {z}, and one basket with x repeated
    // (multiplicity must NOT inflate support). N = 5 baskets.
    val items = Seq(
      (1L, "x"), (1L, "y"),
      (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "y"), (3L, "z"),
      (4L, "z"),
      (5L, "x"), (5L, "x"))
      .toDF("basket", "item")
    val got = AffinityOps.copurchasePairs(items, "basket", "item")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // supports: x=4, y=3, z=2; pairs: (x,y)=3, (x,z)=1, (y,z)=1
    // lift(x,y) = 3·5·1e6 div (4·3) = 1_250_000 (positively associated)
    assert(got(("x", "y")) == ((3L, 1250000L)))
    assert(got(("x", "z")) == ((1L, (5000000L / 8))))
    assert(got(("y", "z")) == ((1L, (5000000L / 6))))
    // the support floor prunes the tail
    val pruned = AffinityOps.copurchasePairs(items, "basket", "item", minSupport = 2L)
      .as[(String, String, Long, Long)].collect()
    assert(pruned.map(r => (r._1, r._2)).toSet == Set(("x", "y")))
  }

  test("copurchasePairs: each unordered pair appears exactly once, i < j") {
    val items = (1L to 50L).flatMap(b => Seq((b, s"i${b % 3}"), (b, s"i${(b + 1) % 3}")))
      .toDF("basket", "item")
    val got = AffinityOps.copurchasePairs(items, "basket", "item")
      .as[(String, String, Long, Long)].collect()
    assert(got.forall(r => r._1 < r._2))
    assert(got.map(r => (r._1, r._2)).distinct.length == got.length)
  }
}
