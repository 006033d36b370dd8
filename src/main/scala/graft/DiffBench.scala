package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.ReconcileOps

/** Measured proof for ReconcileOps.tableDiff's three regimes (q155):
  *
  *  1. EQUAL tables cost essentially the two map-side checksum scans —
  *     zero bad buckets, the second pass folds to a constant-false
  *     filter, no cross-table shuffle at all;
  *  2. LOCALIZED drift (the real reconciliation case: a bad batch, a
  *     few corrupted keys) prunes the row-level compare to the
  *     disagreeing buckets; and
  *  3. SCATTERED drift (~0.4% uniform — dirties ALL 256 buckets) is the
  *     regime where bucketing cannot help; the adaptive skip must keep
  *     the cost at brute-force + one checksum pass, not worse. (The
  *     pre-adaptive form paid 2.3× brute here — that measurement is why
  *     tableDiff collects the bad-bucket list and decides driver-side.)
  *
  * Setup: the 10× orders copy (ScaleBench's materialization), compared
  * against (a) an identical copy, (b) ~25 re-priced keys (≡0 mod
  * 59999), and (c) the q155 drift pattern (≡0 mod 501 re-priced, ≡0 mod
  * 503 dropped, two injected keys). The brute-force baseline is the
  * oracle's full outer join on the key with a row-compare — the shape
  * everyone writes first.
  *
  * Result identity is asserted before timing: tableDiff(drifted) must
  * equal the brute-force diff row-for-row on the scattered case.
  *
  * Usage: `sbt "runMain graft.DiffBench [scaledDir]"` (default
  * /tmp/graft_scale; run ScaleBench first or any dir with
  * orders.parquet). Prints one JSON line {"metric":"diff",...};
  * results land in SCALECHECK.md's reconciliation section.
  */
object DiffBench {

  /** FULL-WIDTH rows: reconciliation compares every column (that is the
    * job), so the brute-force join must shuffle the whole table width
    * while the Merkle pass collapses each row to a 64-bit fingerprint
    * map-side. Width is the whole contest — a (key, one-long) projection
    * would hand the brute join an artificially easy shuffle. */
  private def baseTable(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("price_c"),
        col("o_orderdate").cast("string").as("odate_s"),
        col("o_orderpriority"))

  private val Payload = Seq("o_custkey", "o_orderstatus", "price_c",
    "odate_s", "o_orderpriority")

  /** ~25 of 1.5M keys re-priced — hits ≤25 of 256 buckets, the
    * localized regime where the prune layer earns its keep. */
  private def driftSmall(base: DataFrame): DataFrame = base
    .withColumn("price_c",
      when(col("o_orderkey") % 59999 === 0, col("price_c") + 1)
        .otherwise(col("price_c")))

  private def drift(base: DataFrame): DataFrame = base
    .filter(col("o_orderkey") % 503 =!= 0)
    .withColumn("price_c",
      when(col("o_orderkey") % 501 === 0, col("price_c") + 1)
        .otherwise(col("price_c")))
    .unionByName(base.limit(2).select(
      (col("o_orderkey") + 900000001L).as("o_orderkey"), col("o_custkey"),
      col("o_orderstatus"), col("price_c"), col("odate_s"),
      col("o_orderpriority")))

  private def canon = concat_ws("|",
    (Seq("o_orderkey") ++ Payload).map(col): _*)

  private def bruteDiff(a: DataFrame, b: DataFrame): DataFrame = {
    val changed = Payload.map(c => col(s"a.$c") =!= col(s"b.$c"))
      .reduce(_ || _)
    a.as("a")
      .join(b.as("b"), col("a.o_orderkey") === col("b.o_orderkey"), "full")
      .select(coalesce(col("a.o_orderkey"), col("b.o_orderkey")).as("key"),
        when(col("b.o_orderkey").isNull, lit("missing_b"))
          .when(col("a.o_orderkey").isNull, lit("missing_a"))
          .when(changed, lit("changed")).as("status"))
      .filter(col("status").isNotNull)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale")
    val spark = GraftSession.get("graft-diffbench")
    spark.range(1).count()

    val base = baseTable(spark, dir)
    val drifted = drift(base)
    val nRows = base.count()

    // result identity before timing: bucket-first == brute force
    val m = ReconcileOps.tableDiff(base, drifted, "o_orderkey", canon)
      .select(col("key"), col("status"))
    val bf = bruteDiff(base, drifted)
    val divergence = m.exceptAll(bf).count() + bf.exceptAll(m).count()
    require(divergence == 0, s"tableDiff diverged from brute force: $divergence rows")
    val nDiff = bf.count()
    spark.catalog.clearCache()

    def time(mk: () => DataFrame): Double = {
      val s = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - s) / 1e9
      spark.catalog.clearCache()
      t
    }
    def best2(mk: () => DataFrame): Double = { time(mk); math.min(time(mk), time(mk)) }

    val tEqual = best2(() =>
      ReconcileOps.tableDiff(base, baseTable(spark, dir), "o_orderkey", canon))
    val tSmall = best2(() =>
      ReconcileOps.tableDiff(base, driftSmall(baseTable(spark, dir)), "o_orderkey", canon))
    val tScattered = best2(() =>
      ReconcileOps.tableDiff(base, drift(baseTable(spark, dir)), "o_orderkey", canon))
    val tBruteSmall = best2(() => bruteDiff(base, driftSmall(baseTable(spark, dir))))
    val tBrute = best2(() => bruteDiff(base, drift(baseTable(spark, dir))))

    def fmt(d: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    println(s"""{"metric":"diff","rows":$nRows,"diff_rows":$nDiff,""" +
      s""""equal_sec":${fmt(tEqual)},"small_sec":${fmt(tSmall)},""" +
      s""""scattered_sec":${fmt(tScattered)},""" +
      s""""brute_small_sec":${fmt(tBruteSmall)},"brute_sec":${fmt(tBrute)}}""")
    spark.stop()
  }
}
