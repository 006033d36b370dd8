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

  test("bucketIntervalJoin equals the brute-force overlap join, exactly once") {
    // second interval set: mixed widths + empty/inverted rows, offset so
    // overlaps cross bucket boundaries at every tested width
    val right = (Seq((100, 10L, 10L), (101, 40L, 30L), (102, 0L, 2000L)) ++
      (103 until 120).map(i => (i, rnd.nextLong(900), rnd.nextLong(900))))
      .toDF("rid", "rlo", "rhi")
    for (w <- Seq(1L, 7L, 64L, 4096L)) {
      val got = RangeJoinOps
        .bucketIntervalJoin(intervals, "lo", "hi", right, "rlo", "rhi", w)
        .select("iid", "rid").as[(Int, Int)].collect().sorted
      // brute force mirrors the operator's contract: an empty or inverted
      // interval has no points, so it overlaps nothing — the raw strict-
      // inequality predicate alone would vacuously match it when its
      // degenerate endpoint sits inside the other interval
      val want = intervals.filter(col("hi") > col("lo"))
        .join(right.filter(col("rhi") > col("rlo")),
          col("lo") < col("rhi") && col("rlo") < col("hi"))
        .select("iid", "rid").as[(Int, Int)].collect().sorted
      assert(got.sameElements(want), s"mismatch at bucketWidth=$w")
      assert(want.nonEmpty && want.length == want.distinct.length)
      assert(got.length == got.distinct.length, s"dup pair at width=$w")
    }
  }

  test("the plan is an equi-join on the bucket — no nested loop, no cartesian") {
    val plan = RangeJoinOps.bucketRangeJoin(points, "p", intervals, "lo", "hi", 64L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // and the bucket key is what the join keys on
    assert(plan.contains("__bucket"), plan)
  }

  test("coalesceIntervals: overlap, touch, containment, gaps, per-group isolation") {
    val iv = Seq(
      // group 1: [0,5) overlaps [3,8); [8,10) touches → one island [0,10)×3;
      // [20,25) contains [21,22) → island [20,25)×2; [30,31) alone
      (1L, 0L, 5L), (1L, 3L, 8L), (1L, 8L, 10L),
      (1L, 20L, 25L), (1L, 21L, 22L), (1L, 30L, 31L),
      // group 2: same coordinates as group 1's gap — groups never mix
      (2L, 10L, 20L))
      .toDF("g", "lo", "hi")
    val got = RangeJoinOps.coalesceIntervals(iv, "g", "lo", "hi")
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      (1L, 0L, 10L, 3L), (1L, 20L, 25L, 2L), (1L, 30L, 31L, 1L),
      (2L, 10L, 20L, 1L)))
    // windows are partitioned by the group key (distributed scan), never
    // the single-partition global window
    val plan = RangeJoinOps.coalesceIntervals(iv, "g", "lo", "hi")
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(g"), plan)
    assert(!plan.contains("SinglePartition"), plan)
  }
}
