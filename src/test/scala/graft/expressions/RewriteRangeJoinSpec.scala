package graft.expressions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class RewriteRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // negatives included: floor-div bucketing must hold below zero
  private lazy val pts = {
    val rnd = new scala.util.Random(5)
    Seq.fill(2000)(rnd.nextLong(4000L) - 2000L).map(Tuple1(_)).toDF("p")
  }
  private lazy val ivs = {
    val rnd = new scala.util.Random(6)
    (0 until 40).map { i =>
      val lo = rnd.nextLong(3600L) - 1800L
      (i, lo, lo + rnd.nextLong(400L)) // some empty (len 0) intervals
    }.toDF("iv_id", "lo", "hi")
  }

  private def rangeJoin: DataFrame =
    pts.join(ivs, col("p") >= col("lo") && col("p") < col("hi"))
      .groupBy("iv_id").agg(count(lit(1)).as("n"))
      .orderBy("iv_id")

  private def withWidth[A](w: String)(body: => A): A = {
    spark.conf.set(RewriteRangeJoin.WidthConfKey, w)
    try body finally spark.conf.unset(RewriteRangeJoin.WidthConfKey)
  }

  test("rule off (default): nested loop; rule on: equi-join, same result") {
    val baseline = rangeJoin.as[(Int, Long)].collect().toSeq
    val basePlan = rangeJoin.queryExecution.executedPlan.toString
    assert(basePlan.contains("BroadcastNestedLoopJoin") ||
      basePlan.contains("CartesianProduct"), basePlan)

    withWidth("128") {
      val plan = rangeJoin.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan)
      assert(plan.contains("__bucket"), plan)
      assert(rangeJoin.as[(Int, Long)].collect().toSeq == baseline)
    }
  }

  test("operand orientation and side swap are normalized") {
    withWidth("64") {
      // lo <= p / hi > p, intervals on the LEFT — still rewritten, same rows
      val swapped = ivs.join(pts,
          col("lo") <= col("p") && col("hi") > col("p"))
        .groupBy("iv_id").agg(count(lit(1)).as("n")).orderBy("iv_id")
      val plan = swapped.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan)
      assert(swapped.as[(Int, Long)].collect().toSeq ==
        rangeJoin.as[(Int, Long)].collect().toSeq)
    }
  }

  test("non-matching shapes are untouched") {
    withWidth("64") {
      // closed upper bound: not the half-open pattern -> stays a loop join
      val closed = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
      val plan = closed.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("CartesianProduct"), plan)
      // an equi conjunct present: already a hash join; no bucket injection
      val withKey = pts.withColumn("k", col("p") % 10)
        .join(ivs.withColumn("k", col("lo") % 10),
          Seq("k")) // equi join, no range at all
      assert(!withKey.queryExecution.optimizedPlan.toString.contains("__bucket"))
    }
  }

  test("rule is excludable via spark.sql.optimizer.excludedRules") {
    withWidth("64") {
      spark.conf.set("spark.sql.optimizer.excludedRules",
        "graft.expressions.RewriteRangeJoin")
      try {
        val plan = rangeJoin.queryExecution.executedPlan.toString
        assert(plan.contains("BroadcastNestedLoopJoin") ||
          plan.contains("CartesianProduct"), plan)
      } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
    }
  }

  test("bucket math handles values far past 2^53 exactly") {
    withWidth("1000") {
      val bigPts = Seq(4611686018427387900L, 4611686018427387905L).toDF("p")
      val bigIvs = Seq((1, 4611686018427387000L, 4611686018427387903L)).toDF("iv_id", "lo", "hi")
      val got = bigPts.join(bigIvs, col("p") >= col("lo") && col("p") < col("hi"))
        .select("p").as[Long].collect().toSeq
      assert(got == Seq(4611686018427387900L))
    }
  }
}
