package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the lakehouse maintenance operator every
  * streaming/incremental pipeline eventually needs: micro-batch sinks and
  * per-task writers leave thousands of KB-scale parquet files, and scan
  * cost at 100 TB is dominated by per-file overhead (footer reads, task
  * scheduling) long before bytes. Compaction rewrites a table directory
  * into ≈`targetBytes` files without changing its contents.
  *
  * Shape: size the directory, `coalesce(ceil(size/target))` — coalesce,
  * not repartition: it merges existing partitions WITHOUT a shuffle, so
  * the rewrite is one read + one write pass — then a rename-aside swap:
  * write to `<path>__compacting`, rename the old generation to
  * `<path>__old`, rename the new into place, delete `__old`. Each rename
  * is atomic on a real filesystem, so a reader racing the swap sees the
  * old generation, the new generation, or (in the instant between the
  * two renames) a missing path — never a MIX of generations — and a
  * crash at any point leaves a complete generation recoverable by name.
  * A production lakehouse replaces the swap with a manifest/
  * transaction-log flip (Delta/Iceberg shape), which closes even the
  * missing-path instant — the rewrite pass is identical.
  *
  * Result-invariance is the operator's contract (same rows, any file
  * layout) — the gate hashes the compacted table against the original's
  * oracle. */
object Compaction {

  /** Compact `path` (a parquet directory) to ≈targetBytes files; returns
    * (filesBefore, filesAfter). */
  def compact(spark: SparkSession, path: String, targetBytes: Long): (Int, Int) = {
    require(targetBytes > 0, s"bad targetBytes=$targetBytes")
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    def dataFiles(dir: Path): Int =
      fs.listStatus(dir).count(s => s.isFile && !s.getPath.getName.startsWith("_"))
    val before = dataFiles(p)
    val bytes = fs.getContentSummary(p).getLength
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val tmp = new Path(path + "__compacting")
    spark.read.parquet(path).coalesce(n)
      .write.mode("overwrite").parquet(tmp.toString)
    // rename-aside swap (see scaladoc): the old generation is moved, not
    // deleted, before the new one lands — a crash mid-swap always leaves
    // one complete generation on disk
    val old = new Path(path + "__old")
    if (fs.exists(old)) require(fs.delete(old, true),
      s"compaction: could not clear stale $old")
    require(fs.rename(p, old), s"compaction: could not set aside old generation $p")
    require(fs.rename(tmp, p), s"compaction: swap rename failed for $tmp")
    require(fs.delete(old, true), s"compaction: could not remove old generation $old")
    (before, dataFiles(p))
  }
}
