package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) data clustering for multi-column scan pruning —
  * the write-side half of data skipping (Morton 1966; the same layout
  * trick Delta/Iceberg OPTIMIZE ZORDER applies).
  *
  * Parquet keeps min/max statistics per column per row group, and the
  * reader prunes row groups whose stats exclude the pushed predicate. A
  * single-column sort gives perfect pruning on that column and NONE on
  * any other; interleaving the bits of two columns gives every row group
  * a tight bounding BOX in (x, y) space, so 2-D box predicates prune on
  * both columns at once. On a 100 TB table the difference is "scan the
  * 0.1% of row groups whose box intersects the query" vs "scan
  * everything that matches neither sort prefix".
  *
  * `zValue` is pure integer arithmetic (shift/and/multiply by disjoint
  * powers of two, so + is |) — stays inside whole-stage codegen; no UDF.
  * Contract: inputs in [0, 65535] (16 bits per dimension, 32-bit code).
  */
object ZOrder {

  /** Morton code: bit i of x → bit 2i, bit i of y → bit 2i+1. */
  def zValue(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)).cast("long") * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)).cast("long") * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** Write `df` clustered on the Morton code of (xCol, yCol): range
    * partition into `files` output files, sort inside each — every file
    * covers a compact Z-curve segment, i.e. a tight (x, y) bounding box. */
  def writeClustered(df: DataFrame, xCol: String, yCol: String,
                     path: String, files: Int = 8): Unit =
    df.withColumn("_z", zValue(col(xCol), col(yCol)))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)

  /** Per-file (x, y) bounding boxes of a parquet layout — the measurable
    * locality of the clustering (spec + scale evidence, not a query op). */
  def fileBoxes(df: DataFrame, xCol: String, yCol: String): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(min(xCol).as("x_min"), max(xCol).as("x_max"),
        min(yCol).as("y_min"), max(yCol).as("y_max"))
}
