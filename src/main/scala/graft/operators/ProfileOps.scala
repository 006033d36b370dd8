package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Dataset profiling — the "what is in this table" pass every ingestion
  * pipeline runs before trusting 100 TB of new parquet: per-column row /
  * null / distinct counts and value ranges, computed in ONE aggregation
  * over the data.
  *
  * Shape matters at scale: profiling k columns as k separate queries scans
  * the table k times. A single `agg` with all the measures scans ONCE —
  * Spark plans the multiple `count(DISTINCT …)` measures as an Expand
  * (k× row multiplication inside the stage, the standard multi-distinct
  * plan) feeding one partial/final aggregate pair, so the I/O and shuffle
  * cost stay those of one pass. The per-column result rows are then
  * unpivoted driver-free from the single aggregate row.
  */
object ProfileOps {

  /** Profile `cols` of `df` in one scan. Output: one row per column —
    * (col_name, n_nonnull, n_null, n_distinct, min_val, max_val), min/max
    * rendered as canonical strings (timestamps as "yyyy-MM-dd HH:mm:ss" in
    * the session zone, everything else via CAST) so heterogeneous column
    * types fit one schema. `n_distinct` counts non-null values. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    def fmt(c: Column, name: String): Column = types(name) match {
      // CAST(timestamp AS string) is engine-specific about fractional
      // seconds; pin the render format instead
      case TimestampType => date_format(c, "yyyy-MM-dd HH:mm:ss")
      case _ => c.cast("string")
    }
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__cnt"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).as(s"${c}__min"),
        max(col(c)).as(s"${c}__max"))
    } :+ count(lit(1)).as("__total")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"${c}__cnt").as("n_nonnull"),
        (col("__total") - col(s"${c}__cnt")).as("n_null"),
        col(s"${c}__nd").as("n_distinct"),
        fmt(col(s"${c}__min"), c).as("min_val"),
        fmt(col(s"${c}__max"), c).as("max_val"))
    }
    row.select(explode(array(entries: _*)).as("p")).select("p.*")
  }
}
