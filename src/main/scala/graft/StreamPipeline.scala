package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.{Event, StreamOps}

/** End-to-end Structured Streaming demo — the incremental twin of the batch
  * [[Pipeline]]: the driver's `events` table is staged as time-ordered
  * chunk files (simulated log arrival, `maxFilesPerTrigger=1`), consumed by
  * three streaming queries, and each result is compared EXACTLY against its
  * batch twin on the same input:
  *
  *   1. exact-dedup within the watermark horizon (planted duplicate rows
  *      inside a chunk must collapse) → parquet sink;
  *   2. watermarked 10-minute windowed counts (append mode: a window row is
  *      emitted exactly once, when the watermark passes it) → parquet sink;
  *   3. stateful per-user running totals via mapGroupsWithState → memory
  *      sink, last update per user compared in integer cents (the stream
  *      adds cent-quantized doubles chronologically; bit-identity of the
  *      double total is not part of the contract, the cent total is).
  *
  * Append-mode caveat this demo makes explicit: a finite stream's last
  * windows never close on their own — the watermark only advances with new
  * data — so the stage appends one far-future sentinel event to flush them,
  * and the batch twin is compared below the sentinel's window.
  *
  * Usage: `sbt "runMain graft.StreamPipeline [sfDir]"`. Prints one line per
  * check; exits nonzero if any stream result diverges from its batch twin
  * or any stage is empty.
  */
object StreamPipeline {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.get("graft-stream-pipeline")
    import spark.implicits._

    val work = Files.createTempDirectory("graft_stream").toString
    val in = s"$work/in"
    var failed = false
    def check(name: String, diff: Long, rows: Long): Unit = {
      val ok = diff == 0 && rows > 0
      if (!ok) failed = true
      println(f"[stream] $name%-26s rows=$rows%-7d diff=$diff ${if (ok) "OK" else "FAIL"}")
    }

    // -- stage: 8 time-ordered chunks (log-file arrival), duplicates of the
    // 10 smallest event_ids planted INSIDE their own chunk (same-horizon
    // dups — the case streaming dedup guarantees), plus one far-future
    // sentinel event that advances the watermark past every real window.
    // GraftSession.canonTs surfaces ts as long nanos regardless of the
    // data drop's parquet timestamp unit; watermarks need a real
    // timestamp, so stage at microsecond precision via exact division.
    val events = GraftSession.canonTs(spark.read.parquet(s"$dir/events.parquet"))
      .select(col("event_id"),
        expr("timestamp_micros(ts div 1000)").as("ts"),
        col("user_id"), col("event_type"), col("value"))
    // Chunked staging shared by both domains: rank by orderCols, chunk =
    // rank*n/total, plant `plantDups(firstTen)` copies INSIDE their own
    // chunk, write one file per chunk in order. The global rank window is
    // staging-only code (simulating ordered log arrival at demo scale).
    def stageChunks(df: org.apache.spark.sql.DataFrame, orderCols: Seq[String],
                    nChunks: Int, path: String,
                    plantDups: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
        : Unit = {
      val total = df.count()
      val ranked = df
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(orderCols.map(col): _*)) - 1)
        .withColumn("chunk", (col("rk") * nChunks / total).cast("int"))
        .drop("rk")
        .cache() // 2×nChunks consumers below; uncached, each redoes the sort
      val dups = plantDups(ranked.orderBy(orderCols.last).limit(10))
      (0 until nChunks).foreach { i =>
        ranked.filter(col("chunk") === i).drop("chunk")
          .unionByName(dups.filter(col("chunk") === i).drop("chunk"))
          .coalesce(1).write.mode("append").parquet(path)
      }
      ranked.unpersist()
    }

    stageChunks(events, Seq("ts", "event_id"), 8, in, identity)
    events.agg(max("ts").as("maxts"))
      .select(lit(-1L).as("event_id"),
        (col("maxts") + expr("INTERVAL 24 HOURS")).as("ts"),
        lit(-1L).as("user_id"), lit("sentinel").as("event_type"),
        lit(0.0).as("value"))
      .coalesce(1).write.mode("append").parquet(in)

    val staged = spark.read.parquet(in) // = events + planted dups + sentinel
    val stream = spark.readStream.schema(staged.schema)
      .option("maxFilesPerTrigger", 1).parquet(in)

    // -- 1. streaming exact-dedup vs batch dropDuplicates
    val dedupOut = s"$work/dedup"
    val q1 = StreamOps.dedupStream(stream).writeStream
      .format("parquet").option("path", dedupOut)
      .option("checkpointLocation", s"$work/ckpt1")
      .outputMode("append").start()

    // -- 2. watermarked windowed counts vs batch twin (below the sentinel)
    val winOut = s"$work/win"
    val q2 = StreamOps.windowedCounts(stream).writeStream
      .format("parquet").option("path", winOut)
      .option("checkpointLocation", s"$work/ckpt2")
      .outputMode("append").start()

    // -- 3. stateful running totals (NoTimeout: bounded key set; see
    // StreamOps.userRunningTotals for the timeout trade-off) → memory sink
    val q3 = StreamOps.userRunningTotals(stream.as[Event], idleTimeout = None)
      .writeStream.format("memory").queryName("user_totals")
      .option("checkpointLocation", s"$work/ckpt3")
      .outputMode("update").start()

    // -- 4. streaming corpus intake over the documents table (the LLM-side
    // twin: content-hash dedup + quality gate), staged as 4 doc_id-ordered
    // chunks with the 10 smallest doc_ids duplicated inside their chunk
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val dIn = s"$work/docs_in"
    stageChunks(docs, Seq("doc_id"), 4, dIn,
      d => d.select((col("doc_id") + 1000000L).as("doc_id"), col("text"), col("chunk")))
    val dStaged = spark.read.parquet(dIn)
    val docStream = spark.readStream.schema(dStaged.schema)
      .option("maxFilesPerTrigger", 1).parquet(dIn)
    val cleanOut = s"$work/clean"
    val q4 = StreamOps.cleanDocStream(docStream).writeStream
      .format("parquet").option("path", cleanOut)
      .option("checkpointLocation", s"$work/ckpt4")
      .outputMode("append").start()

    // -- 5. session windows (append: a session emits once the watermark
    // passes its end + gap; the sentinel flushes the final sessions)
    val sessOut = s"$work/sess"
    val q5 = StreamOps.sessionizeStream(stream, gap = "5 minutes").writeStream
      .format("parquet").option("path", sessOut)
      .option("checkpointLocation", s"$work/ckpt5")
      .outputMode("append").start()

    // -- 6. stream-stream interval join: purchase→view attribution with
    // watermark-bounded join state on both sides
    val attrOut = s"$work/attr"
    val q6 = StreamOps.attributionJoin(
        stream.filter(col("event_type") === "purchase"),
        stream.filter(col("event_type") === "view")).writeStream
      .format("parquet").option("path", attrOut)
      .option("checkpointLocation", s"$work/ckpt6")
      .outputMode("append").start()

    val queries = Seq(q1, q2, q3, q4, q5, q6)
    queries.foreach(_.processAllAvailable())
    queries.foreach(_.stop())

    // checks, each as exceptAll in both directions
    val dedupStreamed = spark.read.parquet(dedupOut)
    // distinct(), not dropDuplicates("event_id"): the planted dups are
    // exact row copies so the twins are semantically identical, and
    // exceptAll over a subset-dropDuplicates child hits a Spark 4.1.2
    // analyzer bug (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND in the ExceptAll
    // sum-rewrite losing the non-key attributes)
    val dedupBatch = staged.distinct()
    val d1 = dedupStreamed.exceptAll(dedupBatch)
      .unionAll(dedupBatch.exceptAll(dedupStreamed)).count()
    check("dedup == batch", d1, dedupStreamed.count())

    // the sentinel's own window never closes (nothing follows it), so the
    // batch twin compares below it — its window holds only the sentinel,
    // so dropping the sentinel's event_type group is exact
    val winStreamed = spark.read.parquet(winOut)
    val winBatch = StreamOps.windowedCountsBatch(staged)
      .filter(col("event_type") =!= "sentinel")
    val d2 = winStreamed.exceptAll(winBatch)
      .unionAll(winBatch.exceptAll(winStreamed)).count()
    check("windows == batch", d2, winStreamed.count())

    // the LAST update per user is the one with max n_events (cumulative,
    // strictly increasing per update); max_by keeps its cents total
    val lastTotals = spark.table("user_totals")
      .groupBy("user_id").agg(max("n_events").as("n_events"),
        max_by(round(col("total_value") * 100), col("n_events")).as("cents"))
    val batchTotals = staged.groupBy("user_id").agg(
      count(lit(1)).as("n_events"),
      sum(round(col("value") * 100)).as("cents"))
    val d3 = lastTotals.exceptAll(batchTotals)
      .unionAll(batchTotals.exceptAll(lastTotals)).count()
    check("running totals == batch", d3, lastTotals.count())

    // WHICH row survives content dedup is arbitrary on both sides (same
    // micro-batch / same partition scan), so the contract is the surviving
    // text_hash SET — unique after dedup, and the quality gate decides
    // identically for identical texts
    val cleanStreamed = spark.read.parquet(cleanOut).select("text_hash")
    val cleanBatch = StreamOps.cleanDocStream(dStaged).select("text_hash")
    val d4 = cleanStreamed.exceptAll(cleanBatch)
      .unionAll(cleanBatch.exceptAll(cleanStreamed)).count()
    check("doc clean == batch", d4, cleanStreamed.count())

    // batch twin = the same session_window plan on the bounded staged
    // frame, sentinel session excluded (it never closes upstream)
    val sessStreamed = spark.read.parquet(sessOut)
    val sessBatch = StreamOps.sessionizeStream(staged, gap = "5 minutes")
      .filter(col("user_id") =!= -1L)
    val d5 = sessStreamed.exceptAll(sessBatch)
      .unionAll(sessBatch.exceptAll(sessStreamed)).count()
    check("sessions == batch", d5, sessStreamed.count())

    // inner interval join: append-mode results are exactly the bounded
    // join of the same inputs (planted dup rows match identically on both
    // sides, so multiset equality still holds)
    val attrStreamed = spark.read.parquet(attrOut)
    val attrBatch = StreamOps.attributionJoin(
      staged.filter(col("event_type") === "purchase"),
      staged.filter(col("event_type") === "view"))
    val d6 = attrStreamed.exceptAll(attrBatch)
      .unionAll(attrBatch.exceptAll(attrStreamed)).count()
    check("attribution == batch", d6, attrStreamed.count())

    spark.stop()
    if (failed) sys.exit(1)
  }
}
