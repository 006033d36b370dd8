package graft

import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` output for named gate queries to files —
  * the per-round plan evidence (`plans/r<N>/<query>_{before,after}.txt`).
  * Not part of the engine; measurement/deliverable tooling only.
  *
  * Usage: `sbt "runMain graft.PlanDump <sfDir> <outDir> <suffix> q1,q2,..."`
  * writes `<outDir>/<query>_<suffix>.txt` per query. Run it once from a
  * worktree at the pre-change commit (`before`) and once from the current
  * tree (`after`).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    Files.createDirectories(Paths.get(outDir))
    val spark = GraftSession.get("graft-plandump")
    spark.range(1).count()
    names.foreach { name =>
      val out = Paths.get(outDir, s"${name}_$suffix.txt")
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(out, txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        System.err.println(s"[plandump] wrote $out (${txt.length} chars)")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: $e")
          sys.exit(1)
      }
    }
    spark.stop()
  }
}
