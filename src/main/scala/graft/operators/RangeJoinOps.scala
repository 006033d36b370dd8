package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) joins without a cartesian product.
  *
  * Spark has no native range-join optimization: `points JOIN intervals ON
  * p >= lo AND p < hi` has no equi-key, so Catalyst plans a
  * BroadcastNestedLoopJoin (if one side is small) or a full cartesian
  * product — O(|points|·|intervals|) comparisons either way, which is the
  * classic 100 TB cliff for event-to-window attribution.
  *
  * The standard fix (used by the Databricks range-join hint and
  * Flink/Trino interval joins alike) is BUCKET EXPANSION: pick a bucket
  * width W, replicate every interval once per W-aligned bucket it
  * overlaps, map every point to the single bucket containing it, then
  * equi-join on the bucket id and re-check the exact predicate as a
  * residual filter. Each (point, interval) match is produced exactly once
  * — in the point's bucket — so no dedup is needed. Cost:
  * O(|intervals|·span/W) replication on the (small) interval side buys a
  * shuffled hash join keyed on bucket for the big side; W tunes the
  * replication-vs-selectivity trade (W ≈ median interval length keeps
  * replication ≲2× while each bucket sees only nearby intervals).
  */
object RangeJoinOps {

  /** Join `points` to every interval with `lo <= point < hi` (half-open;
    * empty intervals match nothing). `pointCol`, `loCol`, `hiCol` must be
    * integral (long-compatible) columns; output = all columns of both
    * inputs (names must not collide) for each match.
    *
    * Scale: one shuffle of each side on the synthetic bucket key; the
    * exact predicate runs only within a bucket. No nested-loop, no
    * cartesian — `.queryExecution` shows a plain equi-join on `__bucket`
    * (RangeJoinOpsSpec asserts the plan has no BroadcastNestedLoop /
    * CartesianProduct node). */
  def bucketRangeJoin(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bad bucketWidth=$bucketWidth")
    // exact integer floor-div — (x - pmod(x, W)) div W — instead of
    // floor(x / W): double division silently loses precision past 2^53,
    // and pmod (not %) keeps the floor semantics for negative points
    def bucket(x: String): Column =
      expr(s"(($x) - pmod($x, $bucketWidth)) div $bucketWidth")
    val pts = points.withColumn("__bucket", bucket(pointCol))
    val ivs = intervals
      .filter(col(hiCol) > col(loCol)) // empty interval: no bucket, no match
      .withColumn("__bucket",
        explode(sequence(bucket(loCol), bucket(s"$hiCol - 1"))))
    pts.join(ivs, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }

  /** INTERVAL-OVERLAP join: every pair of half-open intervals with
    * `aLo < bHi AND bLo < aHi` — the two-sided sibling of
    * [[bucketRangeJoin]] (event windows × promo windows, session spans ×
    * outage spans). Same bucket-expansion idea, both sides replicated; an
    * overlapping pair co-occurs in EVERY bucket their spans share, so the
    * pair is kept only in the bucket containing the overlap's start,
    * `max(aLo, bLo)` — exactly-once without a distinct.
    *
    * Scale: replication is span/W per row on each side (W ≈ median
    * interval length keeps it ≲2×), then one shuffled equi-join on the
    * bucket id; the exact predicate and the owner-bucket check are
    * bucket-local residuals. No nested-loop, no cartesian, no dedup
    * shuffle. Column names across `a` and `b` must not collide. */
  def bucketIntervalJoin(a: DataFrame, aLo: String, aHi: String,
                         b: DataFrame, bLo: String, bHi: String,
                         bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bad bucketWidth=$bucketWidth")
    def bucket(x: String): Column =
      expr(s"(($x) - pmod($x, $bucketWidth)) div $bucketWidth")
    val ea = a.filter(col(aHi) > col(aLo))
      .withColumn("__bucket", explode(sequence(bucket(aLo), bucket(s"$aHi - 1"))))
    val eb = b.filter(col(bHi) > col(bLo))
      .withColumn("__bucket", explode(sequence(bucket(bLo), bucket(s"$bHi - 1"))))
    ea.join(eb, Seq("__bucket"))
      .filter(col(aLo) < col(bHi) && col(bLo) < col(aHi))
      .filter(col("__bucket") === bucket(s"greatest($aLo, $bLo)"))
      .drop("__bucket")
  }

  /** Coalesce overlapping-or-touching intervals per group into maximal
    * disjoint islands (gaps-and-islands): the calendar-merge every
    * availability / activity-span / retention pipeline needs. The naive
    * formulation is an interval self-join plus transitive closure; this
    * is instead the classic two-window linear scan — sort each group by
    * (lo, hi), mark a row as an island START iff its lo exceeds the
    * running max hi of everything before it (strictly: touching
    * intervals, lo == prev hi, merge), then island id = running count of
    * starts. One shuffle (the group partitioning), one sort, both
    * windows share it; no self-join, no iteration. Windows are
    * PARTITIONED by the group key, so the scan distributes — the
    * single-partition window trap this repo fences elsewhere doesn't
    * apply. Output: (group, lo, hi, n_merged) per island. */
  def coalesceIntervals(df: DataFrame, groupCol: String,
                        loCol: String, hiCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val order = Seq(col(loCol).asc, col(hiCol).asc)
    val prev = Window.partitionBy(col(groupCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val upto = Window.partitionBy(col(groupCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("__prev_hi", max(col(hiCol)).over(prev))
      .withColumn("__start",
        when(col("__prev_hi").isNull || col(loCol) > col("__prev_hi"), 1L)
          .otherwise(0L))
      .withColumn("__island", sum(col("__start")).over(upto))
      .groupBy(col(groupCol), col("__island"))
      .agg(min(col(loCol)).as(loCol), max(col(hiCol)).as(hiCol),
        count(lit(1)).as("n_merged"))
      .drop("__island")
  }
}
