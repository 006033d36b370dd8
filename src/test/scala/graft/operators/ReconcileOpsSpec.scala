package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ReconcileOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon = concat_ws("|", col("k"), col("v"))

  test("tableDiff: equal tables diff to empty") {
    val a = (0L until 500L).map(i => (i, i * 3)).toDF("k", "v")
    assert(ReconcileOps.tableDiff(a, a, "k", canon).isEmpty)
  }

  test("tableDiff: finds every drift kind, and only the drifted keys") {
    val a = (0L until 500L).map(i => (i, i * 3)).toDF("k", "v")
    val b = a.filter(col("k") =!= 77)                       // 77 missing in b
      .withColumn("v", when(col("k") === 123, col("v") + 1) // 123 changed
        .otherwise(col("v")))
      .union(Seq((1000L, 5L)).toDF("k", "v"))               // 1000 only in b
    val got = ReconcileOps.tableDiff(a, b, "k", canon)
      .as[(Long, String)].collect().toMap
    assert(got == Map(77L -> "missing_b", 123L -> "changed", 1000L -> "missing_a"))
  }

  test("tableDiff: second pass reads only the disagreeing buckets") {
    // one drifted key with nb=8 → exactly one bucket disagrees; the
    // row-level slice must be bucket-pruned (≈1/8 of rows), not a full
    // second read of both sides
    val a = (0L until 800L).map(i => (i, i)).toDF("k", "v")
    val b = a.withColumn("v",
      when(col("k") === 9, col("v") + 1).otherwise(col("v")))
    val diff = ReconcileOps.tableDiff(a, b, "k", canon, nb = 8)
    assert(diff.as[(Long, String)].collect().toMap == Map(9L -> "changed"))
    // the bucket filter sits under the row-level join as a broadcast
    // semi-ish equi-join on bucket; both slices carry it
    val plan = diff.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast prune:\n$plan")
  }
}
