package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Round-12 GraftCsv surface: NaN-safe stats (min/max pushdown + file
  * skipping stand down for NaN-bearing double columns), tolerant keys
  * metadata, the per-task open-sink bound, GROUPED aggregate pushdown
  * over a key-pure layout, and planner statistics reporting
  * (SupportsReportStatistics → stats-driven join strategy). */
class GraftCsvStatsSpec extends SparkSpec {
  import spark.implicits._

  private val fmt = "graft.sources.v2.GraftCsv"

  test("NaN doubles: max()/min() pushdown declines; answer honors NaN-above-all") {
    import graft.sources.v2.GraftCsv
    val out = java.nio.file.Files.createTempDirectory("graftcsv-nan").toString
    val sch = StructType(Seq(StructField("id", LongType), StructField("x", DoubleType)))
    // file 1: finite values; file 2: contains a NaN (and the largest finite)
    Seq((1L, Some(1.5)), (2L, Some(2.5))).toDF("id", "x")
      .coalesce(1).write.format(fmt).mode("overwrite").save(out)
    Seq((3L, Some(9.5)), (4L, Some(Double.NaN)), (5L, Option.empty[Double]))
      .toDF("id", "x")
      .coalesce(1).write.format(fmt).mode("append").save(out)
    def rd = spark.read.schema(sch).format(fmt).load(out)
    // min/max over x must NOT be answered from the manifest (stats see
    // only finite values; Spark's max must be NaN)
    GraftCsv.lastAggPushdown.set("sentinel")
    val r = rd.agg(min($"x").as("mn"), max($"x").as("mx")).collect().head
    assert(GraftCsv.lastAggPushdown.get().isEmpty,
      "min/max over a NaN-bearing double must decline the manifest lane")
    assert(r.getDouble(0) == 1.5 && r.getDouble(1).isNaN)
    // count(x) is still manifest-answerable: NaN is a VALUE, not a null
    GraftCsv.lastAggPushdown.set("")
    val c = rd.agg(count(lit(1)).as("n"), count($"x").as("nx")).collect().head
    assert(GraftCsv.lastAggPushdown.get().nonEmpty, "count lanes must still push")
    assert(c.getLong(0) == 5 && c.getLong(1) == 4)
    // min/max over id (int lane, no NaN possible) still pushes
    GraftCsv.lastAggPushdown.set("")
    val ids = rd.agg(min($"id"), max($"id")).collect().head
    assert(GraftCsv.lastAggPushdown.get().nonEmpty)
    assert(ids.getLong(0) == 1L && ids.getLong(1) == 5L)
  }

  test("NaN doubles: file skipping never drops a NaN-bearing file on value predicates") {
    import graft.sources.v2.GraftCsv
    val out = java.nio.file.Files.createTempDirectory("graftcsv-nanskip").toString
    val sch = StructType(Seq(StructField("id", LongType), StructField("x", DoubleType)))
    // finite-only file spans [1.0, 2.0]; NaN file's finite span is [0.5, 0.6]
    // but holds a NaN — under Spark semantics NaN > 100.0 is TRUE, so the
    // NaN file must survive a `x > 100` probe its finite bounds fail
    Seq((1L, 1.0), (2L, 2.0)).toDF("id", "x")
      .coalesce(1).write.format(fmt).mode("overwrite").save(out)
    Seq((3L, 0.5), (4L, 0.6), (5L, Double.NaN)).toDF("id", "x")
      .coalesce(1).write.format(fmt).mode("append").save(out)
    def rd = spark.read.schema(sch).format(fmt).load(out)
    val got = rd.filter($"x" > 100.0).select("id").as[Long].collect().toSet
    assert(got == Set(5L), s"NaN row lost or extra rows: $got")
    val (kept, total) = GraftCsv.lastSkipStats.get()
    assert(total == 2 && kept == 1, s"finite file should skip, NaN file must not: $kept/$total")
    // an all-NaN file renders blank bounds + nan marker, never Infinity
    val out2 = java.nio.file.Files.createTempDirectory("graftcsv-allnan").toString
    Seq((1L, Double.NaN), (2L, Double.NaN)).toDF("id", "x")
      .coalesce(1).write.format(fmt).mode("overwrite").save(out2)
    val st = GraftCsv.readManifest(out2).values.head("x")
    assert(st.min == "" && st.max == "" && st.nan, s"bad all-NaN stats: $st")
    assert(spark.read.schema(sch).format(fmt).load(out2)
      .filter($"x" > 0.0).count() == 2) // NaN > 0.0 is true in Spark
  }

  test("corrupt _keys.csv degrades to the unordered layout, reads still succeed") {
    import graft.sources.v2.GraftCsv
    val out = java.nio.file.Files.createTempDirectory("graftcsv-badkeys").toString
    val sch = StructType(Seq(StructField("k", LongType), StructField("v", LongType)))
    (0 until 40).map(i => (i.toLong % 4, i.toLong)).toDF("k", "v")
      .repartition(4, $"k")
      .write.format(fmt).option("partition_col", "k").mode("overwrite").save(out)
    def rd = spark.read.schema(sch).format(fmt).load(out)
    assert(rd.count() == 40)
    // corrupt one value cell: the LINE drops, the layout claim voids
    // (one file now lacks a key), and the scan falls back to unordered —
    // instead of a NumberFormatException failing every read of the table
    val kf = new java.io.File(s"$out/_keys.csv")
    val lines = scala.io.Source.fromFile(kf).getLines().toList
    val pw = new java.io.PrintWriter(kf)
    pw.println(lines.head.split(",").take(2).mkString(",") + ",not-a-number")
    lines.tail.foreach(pw.println)
    pw.close()
    new java.io.File(kf.getParent, s".${kf.getName}.crc").delete()
    assert(GraftCsv.readKeys(out).size == lines.size - 1)
    assert(rd.count() == 40)
    assert(rd.agg(sum($"v")).collect().head.getLong(0) == (0 until 40).sum)
  }

  test("keyed write fails loudly past the per-task open-sink bound") {
    val out = java.nio.file.Files.createTempDirectory("graftcsv-sinks").toString
    // 1 task × 500 distinct keys > the 256-sink cap → loud contract error
    val wide = (0 until 500).map(i => (i.toLong, i.toLong)).toDF("k", "v").coalesce(1)
    val e = intercept[Exception] {
      wide.write.format(fmt).option("partition_col", "k").mode("overwrite").save(out)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("repartition by the partition column")), e.toString)
    // the documented fix — repartition by the key — succeeds
    (0 until 500).map(i => (i.toLong % 8, i.toLong)).toDF("k", "v")
      .repartition(8, $"k")
      .write.format(fmt).option("partition_col", "k").mode("overwrite").save(out)
    val sch = StructType(Seq(StructField("k", LongType), StructField("v", LongType)))
    assert(spark.read.schema(sch).format(fmt).load(out).count() == 500)
  }

  test("grouped aggregate pushdown: GROUP BY the partition key answers from the manifest") {
    import graft.sources.v2.GraftCsv
    val out = java.nio.file.Files.createTempDirectory("graftcsv-gagg").toString
    val sch = StructType(Seq(StructField("k", LongType),
      StructField("v", LongType), StructField("x", DoubleType)))
    val df = (0 until 400).map(i =>
      (i.toLong % 5, i.toLong, if (i % 10 == 0) None else Some(i * 0.5)))
      .toDF("k", "v", "x")
    df.repartition(4, $"k")
      .write.format(fmt).option("partition_col", "k").mode("overwrite").save(out)
    def rd = spark.read.schema(sch).format(fmt).load(out)
    def grouped = rd.groupBy($"k").agg(
      count(lit(1)).as("n"), count($"x").as("nx"),
      min($"v").as("mnv"), max($"v").as("mxv"))
    GraftCsv.lastAggPushdown.set("")
    val r1 = grouped.collect().sortBy(_.getLong(0))
    assert(GraftCsv.lastAggPushdown.get().contains("group_by=k"),
      s"grouped pushdown not accepted: '${GraftCsv.lastAggPushdown.get()}'")
    val expect = (0 until 400).map(i => (i.toLong % 5, i)).groupBy(_._1)
      .map { case (k, rows) =>
        (k, rows.size.toLong, rows.count(_._2 % 10 != 0).toLong,
          rows.map(_._2).min.toLong, rows.map(_._2).max.toLong)
      }.toSeq.sortBy(_._1)
    assert(r1.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq == expect)
    // the metadata-only proof, grouped: truncate every data file to its
    // header — the grouped answer must not move (manifest + keys only)
    GraftCsv.listDataFiles(out).foreach { p =>
      val f = new java.io.File(p.toUri.getPath)
      val header = scala.io.Source.fromFile(f).getLines().next()
      val w = new java.io.PrintWriter(f); w.println(header); w.close()
      new java.io.File(f.getParent, s".${f.getName}.crc").delete()
    }
    assert(rd.select("v").collect().isEmpty, "files were not truncated")
    val r2 = grouped.collect().sortBy(_.getLong(0))
    assert(r2.toSeq == r1.toSeq, "grouped manifest-only answer drifted")
  }

  test("grouped pushdown declines: non-key grouping, unkeyed table, expression group") {
    import graft.sources.v2.GraftCsv
    val out = java.nio.file.Files.createTempDirectory("graftcsv-gaggn").toString
    val sch = StructType(Seq(StructField("k", LongType),
      StructField("v", LongType), StructField("s", StringType)))
    val df = (0 until 100).map(i => (i.toLong % 4, i.toLong, s"s${i % 3}"))
      .toDF("k", "v", "s")
    df.repartition(4, $"k")
      .write.format(fmt).option("partition_col", "k").mode("overwrite").save(out)
    def rd = spark.read.schema(sch).format(fmt).load(out)
    def declined[T](body: => T): T = {
      GraftCsv.lastAggPushdown.set("sentinel")
      val r = body
      assert(GraftCsv.lastAggPushdown.get().isEmpty,
        "pushdown should have been declined")
      r
    }
    // GROUP BY a non-key column: files are not pure in it
    assert(declined(rd.groupBy($"s").agg(count(lit(1))).collect()).length == 3)
    // GROUP BY an expression over the key: no manifest lane
    assert(declined(rd.groupBy(($"k" % 2).as("k2")).agg(count(lit(1))).collect())
      .length == 2)
    // unkeyed table: GROUP BY anything declines
    val out2 = java.nio.file.Files.createTempDirectory("graftcsv-gaggn2").toString
    df.repartition(2).write.format(fmt).mode("overwrite").save(out2)
    assert(declined(spark.read.schema(sch).format(fmt).load(out2)
      .groupBy($"k").agg(count(lit(1))).collect()).length == 4)
  }

  test("a column literally named 'star' does not alias count(*)'s stats coverage") {
    import graft.sources.v2.GraftCsv
    val out = java.nio.file.Files.createTempDirectory("graftcsv-star").toString
    val sch = StructType(Seq(StructField("star", LongType), StructField("v", LongType)))
    (0 until 50).map(i => (i.toLong, i.toLong * 2)).toDF("star", "v")
      .repartition(2).write.format(fmt).mode("overwrite").save(out)
    def rd = spark.read.schema(sch).format(fmt).load(out)
    GraftCsv.lastAggPushdown.set("")
    val r = rd.agg(count(lit(1)).as("n"), count($"star").as("ns"),
      min($"star").as("mn")).collect().head
    assert(GraftCsv.lastAggPushdown.get().nonEmpty)
    assert(r.getLong(0) == 50 && r.getLong(1) == 50 && r.getLong(2) == 0L)
  }

  test("SupportsReportStatistics: exact rows + bytes drive the join strategy both ways") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false") // gate the STATIC planner decision
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
    val dimPath = java.nio.file.Files.createTempDirectory("graftcsv-dim").toString
    val factPath = java.nio.file.Files.createTempDirectory("graftcsv-fact").toString
    import s2.implicits._
    (0 until 20).map(i => (i.toLong, s"d$i")).toDF("k", "name")
      .coalesce(1).write.format(fmt).mode("overwrite").save(dimPath)
    (0 until 2000).map(i => (i.toLong % 20, i.toLong)).toDF("k", "v")
      .repartition(2).write.format(fmt).mode("overwrite").save(factPath)
    val dimSch = StructType(Seq(StructField("k", LongType), StructField("name", StringType)))
    val factSch = StructType(Seq(StructField("k", LongType), StructField("v", LongType)))
    def dim = s2.read.schema(dimSch).format(fmt).load(dimPath)
    def fact = s2.read.schema(factSch).format(fmt).load(factPath)
    def joined = fact.join(dim, "k").groupBy($"name")
      .agg(sum($"v").as("sv")).orderBy("name")
    // reported size (~a few hundred bytes) < 10 MB threshold → BHJ; a
    // source without stats reports Long.MaxValue and could never broadcast
    val p1 = joined.queryExecution.executedPlan.toString
    assert(p1.contains("BroadcastHashJoin"), s"stats did not enable BHJ:\n$p1")
    val r1 = joined.collect()
    // threshold below the reported dim size → the SAME join plans SMJ:
    // the flip proves a finite, specific size is being read off the scan
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "1b")
    val p2 = joined.queryExecution.executedPlan.toString
    assert(p2.contains("SortMergeJoin") && !p2.contains("BroadcastHashJoin"),
      s"threshold below reported size must plan SMJ:\n$p2")
    val r2 = joined.collect()
    assert(r1.toSeq == r2.toSeq, "join strategy changed the answer")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
    // numRows is exact: Catalyst's rowCount matches the table
    val stats = fact.queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(2000)), s"rowCount: ${stats.rowCount}")
  }
}
