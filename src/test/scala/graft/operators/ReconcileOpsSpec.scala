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
    // two drifted keys in buckets 1 and 2 with nb=8 → exactly those
    // buckets disagree; the row-level slices must be bucket-pruned
    // (≈2/8 of rows) via an IN filter, not a full second read
    val a = (0L until 800L).map(i => (i, i)).toDF("k", "v")
    val b = a.withColumn("v",
      when(col("k") === 9 || col("k") === 18, col("v") + 1)
        .otherwise(col("v")))
    assert(ReconcileOps.badBuckets(a, b, "k", canon, 8).sorted
      .sameElements(Array(1L, 2L)))
    val diff = ReconcileOps.tableDiff(a, b, "k", canon, nb = 8)
    assert(diff.as[(Long, String)].collect().toMap ==
      Map(9L -> "changed", 18L -> "changed"))
    // the analyzed plan (pre-folding: over a LocalRelation input
    // Catalyst evaluates the pruned slices at optimization time, which
    // is the prune doing its job) must carry the bucket-IN filter
    val plan = diff.queryExecution.analyzed.toString
    assert(plan.contains(" IN (1,2)") || plan.contains(" IN (1, 2)"),
      s"no bucket-IN prune:\n$plan")
  }

  test("tableDiff: scattered drift skips the prune layer, same answer") {
    // every key drifted → all 8 buckets bad → pruning cannot help; the
    // adaptive path must drop the IN filter and still answer correctly
    val a = (0L until 80L).map(i => (i, i)).toDF("k", "v")
    val b = a.withColumn("v", col("v") + 1)
    val diff = ReconcileOps.tableDiff(a, b, "k", canon, nb = 8)
    assert(diff.filter(col("status") === "changed").count() == 80L)
    val plan = diff.queryExecution.analyzed.toString
    assert(!plan.contains(" IN ("), s"unexpected prune in degenerate case:\n$plan")
  }

  test("changeFeed: i/u/d classification, NEW payload carried, null-safe") {
    val a = Seq((1L, 10L, Option("x")), (2L, 20L, Option.empty[String]),
      (3L, 30L, Option("z")), (5L, 50L, Option("w")))
      .toDF("k", "v", "s")
    val b = Seq((1L, 10L, Option("x")),   // unchanged → absent from feed
      (2L, 20L, Option("now")),           // NULL→value must register as update
      (3L, 31L, Option("z")),             // changed payload
      (6L, 60L, Option.empty[String]))    // insert carrying a NULL column
      .toDF("k", "v", "s")                // key 5 deleted
    val got = ReconcileOps.changeFeed(a, b, "k", Seq("v", "s"))
      .as[(Long, String, Option[Long], Option[String])].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (2L, "u", Some(20L), Some("now")),
      (3L, "u", Some(31L), Some("z")),
      (5L, "d", None, None),
      (6L, "i", Some(60L), None)))
  }

  test("changeFeed/applyFeed round-trip law: applyFeed(a, feed) == b") {
    val a = (0L until 200L).map(i => (i, i * 7, s"s$i")).toDF("k", "v", "s")
    val b = a.filter(col("k") % 11 =!= 0)
      .withColumn("v",
        when(col("k") % 13 === 0, col("v") + 1).otherwise(col("v")))
      .unionByName(Seq((1000L, 1L, "new"), (1001L, 2L, "n2")).toDF("k", "v", "s"))
    val feed = ReconcileOps.changeFeed(a, b, "k", Seq("v", "s"))
    val applied = ReconcileOps.applyFeed(a, feed, "k", Seq("v", "s"))
    assert(applied.exceptAll(b).isEmpty && b.exceptAll(applied).isEmpty)
    // and a feed against itself is empty (reflexivity)
    assert(ReconcileOps.changeFeed(b, b, "k", Seq("v", "s")).isEmpty)
  }
}
