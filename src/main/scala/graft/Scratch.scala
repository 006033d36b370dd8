package graft

/** Throwaway profiling main (not part of the engine). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-scratch")
    spark.range(1).count()
    val name = args.headOption.getOrElse("q70_semdedup")
    // one-off probes beyond the gate queries: semdedup_k<K> runs SemDeDup
    // with K clusters over the dir's embeddings (the q70 gate pins k=4;
    // production scales k with the corpus — this measures that claim)
    val fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
      if (name.startsWith("semdedup_k")) { (s, dir) =>
        val k = name.stripPrefix("semdedup_k").toInt
        graft.operators.SimilarityOps.semDedup(
          s.read.parquet(s"$dir/embeddings.parquet").select("vec_id", "embedding"),
          k = k, iters = 2, dim = 64, threshold = 0.99)
      } else SparkEntry.queries(name)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    var jobLog = List.empty[(Int, Long, Int)]
    var stageLog = List.empty[(Int, Long, Long, String)] // id, wallMs, taskMs, site
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = jobs.getOrDefault(je.jobId, 0L)
        jobLog = (je.jobId, (System.nanoTime() - t0) / 1000000, 0) :: jobLog
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for (a <- si.completionTime; b <- si.submissionTime) yield a - b).getOrElse(-1L)
        stageLog = (si.stageId, wall, si.taskMetrics.executorRunTime,
          si.name.take(80)) :: stageLog
      }
    })
    if (sys.env.contains("SPARK_GRAFT_STREAM_PROGRESS")) {
      spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          val p = e.progress
          val st = p.stateOperators.map(s =>
            s"commit=${s.commitTimeMs}ms rows=${s.numRowsTotal}").mkString(";")
          println(s"[stream] batch=${p.batchId} rows=${p.numInputRows} " +
            s"durations=${p.durationMs} state=[$st]")
        }
      })
    }
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
      println(fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }
    for (rep <- 1 to 3) {
      spark.catalog.clearCache() // honest single-shot: no cross-rep cache reuse
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // forces analysis + optimization + planning
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      println(f"[scratch] $name rep$rep build=${(t1 - t0) / 1e9}%.3f plan=${(t2 - t1) / 1e9}%.3f exec=${(t3 - t2) / 1e9}%.3f")
      Thread.sleep(200)
      println(s"[scratch] rep$rep jobs=${jobLog.size} ms=${jobLog.map(_._2).sum} top=${jobLog.sortBy(-_._2).take(8).map(j => s"j${j._1}:${j._2}ms").mkString(",")}")
      stageLog.sortBy(-_._2).take(10).foreach { case (id, w, t, n) =>
        println(f"[scratch]   stage$id wall=${w}ms task=${t}ms  $n")
      }
      jobLog = Nil
      stageLog = Nil
    }
    spark.stop()
  }
}
