package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Session factory for the graft engine.
  *
  * Local-mode defaults tuned for the test harness (local[32], 32 shuffle
  * partitions, AQE on). On a real cluster the same builder settings apply
  * except master/partitions come from the deployment; AQE re-coalesces
  * shuffle partitions at runtime so the static value only seeds the initial
  * plan.
  */
object GraftSession {
  // Derby (the q51 JDBC round-trip + Pipeline sink) writes derby.log into
  // the process CWD unless told otherwise — keep the repo tree clean by
  // pointing its error stream at the JVM temp dir (must be set before the
  // Derby driver class loads, hence here in the session factory).
  System.setProperty("derby.stream.error.file",
    s"${System.getProperty("java.io.tmpdir")}/graft_derby.log")

  def builder(appName: String = "graft", cores: String = "32"): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // Streaming checkpoint I/O: the default FileContext-based manager
      // shells out (fork+exec of chmod/ls) on EVERY temp-file create and
      // rename when libhadoop's NativeIO is absent — measured as the
      // dominant cost of late-session streaming gates (stack sampler:
      // Shell.runCommand under renameTempFile/createTempFile, ~7k of the
      // hot samples in q361/q362; exec latency also grows with process
      // size, so long sessions pay 2-4x). The FileSystem-based manager
      // does plain JVM renames — atomic on local/POSIX filesystems, which
      // is where this engine's checkpoints live. On HDFS/object stores a
      // deployment would leave the default in place (this is the builder
      // default, overridable like any conf).
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager")
      // the harness events table stores TIMESTAMP(NANOS) parquet; surface as long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  /** Canonicalize an events-style `ts` column to epoch-NANOS long — the
    * engine-wide convention every `ts div 1000` (= epoch-µs) site assumes.
    * Early harness data drops stored ts as parquet TIMESTAMP(NANOS), which
    * `nanosAsLong` already surfaces as the long; later drops store
    * TIMESTAMP(MICROS), which Spark reads as TIMESTAMP_NTZ — that form is
    * converted here (µs·1000, exact; the session zone is pinned UTC so the
    * NTZ→TZ cast is value-preserving and agrees with DuckDB's
    * `epoch_us(ts)` on the same naive column). Tables without a timestamp
    * `ts` column pass through untouched. */
  def canonTs(df: DataFrame): DataFrame =
    df.schema.fields.find(f => f.name == "ts" &&
        (f.dataType == TimestampType || f.dataType == TimestampNTZType))
      .map(_ => df.withColumn("ts", expr("unix_micros(CAST(ts AS TIMESTAMP)) * 1000")))
      .getOrElse(df)

  def get(appName: String = "graft"): SparkSession = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = builder(appName, cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
