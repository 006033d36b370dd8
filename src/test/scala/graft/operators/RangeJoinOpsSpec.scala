package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinOpsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(17)
  // points over [0, 1000); intervals of mixed widths, some overlapping,
  // one empty (hi == lo) and one inverted (hi < lo) — both must match 0
  private lazy val points = Seq.fill(500)((rnd.nextLong(1000), rnd.nextInt(100)))
    .toDF("p", "payload")
  private lazy val intervals = (Seq((0, 0L, 64L), (1, 50L, 51L), (2, 100L, 100L),
    (3, 120L, 80L), (4, 0L, 1000L), (5, 900L, 1200L), (6, 333L, 334L)) ++
    (7 until 20).map(i => (i, rnd.nextLong(900), rnd.nextLong(900))))
    .toDF("iid", "lo", "hi")

  test("bucketRangeJoin equals the brute-force inequality join") {
    for (w <- Seq(1L, 7L, 64L, 4096L)) {
      val got = RangeJoinOps.bucketRangeJoin(points, "p", intervals, "lo", "hi", w)
        .select("iid", "p", "payload")
        .as[(Int, Long, Int)].collect().sorted
      val want = points.join(intervals, col("p") >= col("lo") && col("p") < col("hi"))
        .select("iid", "p", "payload")
        .as[(Int, Long, Int)].collect().sorted
      assert(got.sameElements(want), s"mismatch at bucketWidth=$w")
      assert(want.nonEmpty) // the fixture actually exercises matches
    }
  }

  test("each (point, interval) match is produced exactly once") {
    // a small bucket width forces wide intervals to replicate across many
    // buckets — every (iid, point-row) must still appear exactly once, so
    // each joined group's count equals that point row's multiplicity in
    // `points` (points can repeat in the random fixture)
    val mult = points.groupBy("p", "payload").count().withColumnRenamed("count", "n")
    val wrong = RangeJoinOps.bucketRangeJoin(points, "p", intervals, "lo", "hi", 16L)
      .groupBy("iid", "p", "payload").count()
      .join(mult, Seq("p", "payload"))
      .filter(col("count") =!= col("n"))
    assert(wrong.count() == 0)
  }

  test("the plan is an equi-join on the bucket — no nested loop, no cartesian") {
    val plan = RangeJoinOps.bucketRangeJoin(points, "p", intervals, "lo", "hi", 64L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // and the bucket key is what the join keys on
    assert(plan.contains("__bucket"), plan)
  }
}
