package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Validated tabular source (SURVEY.md §2.1 S7): extension-sniffing reader
  * with required-column validation, case-insensitive canonicalization, and
  * numeric coercion with the −1 sentinel — the reference's defensive POI
  * loader (precompute_poi_reach.py:32-61, test_path.py:248-260).
  */
object ValidatedSource {

  /** Columns the reference's POI reader requires (precompute_poi_reach.py:40). */
  val PoiRequired: Seq[String] = Seq("poi_id", "category", "node_idx", "lon", "lat")

  /** Read parquet or CSV by extension (CSV falls back to header+infer like
    * pandas.read_csv in the reference; pin schemas in production). */
  def readAuto(spark: SparkSession, path: String): DataFrame =
    if (path.endsWith(".csv") || path.endsWith(".csv.d"))
      spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    else spark.read.parquet(path)

  /** Case-insensitively resolve `required` columns to their canonical names;
    * fail listing ALL missing columns (reference raises on the full set,
    * precompute_poi_reach.py:44-47). Extra columns pass through untouched. */
  def canonicalize(df: DataFrame, required: Seq[String]): DataFrame = {
    val byLower = df.columns.map(c => c.toLowerCase -> c).toMap
    val missing = required.filterNot(r => byLower.contains(r.toLowerCase))
    require(missing.isEmpty, s"missing required columns: ${missing.mkString(", ")}")
    required.foldLeft(df) { (d, r) =>
      val actual = byLower(r.toLowerCase)
      if (actual == r) d else d.withColumnRenamed(actual, r)
    }
  }

  /** Coerce to a numeric type with the −1 sentinel for unparseable/missing
    * values (reference `pd.to_numeric(errors="coerce").fillna(-1)`,
    * precompute_poi_reach.py:58-60). */
  def coerceSentinel(df: DataFrame, cols: Seq[String], to: String = "bigint"): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c, coalesce(expr(s"try_cast($c AS $to)"), lit(-1).cast(to)))
    }

  /** The full validated POI read: sniff → canonicalize → coerce → cast to
    * the declared schema (reference snap_poi_to_nodes.py:225-233 final
    * projection). */
  def readPois(spark: SparkSession, path: String): DataFrame =
    coerceSentinel(canonicalize(readAuto(spark, path), PoiRequired),
      Seq("poi_id", "node_idx"))
      .select(
        col("poi_id").cast("long"),
        col("category").cast("string"),
        col("node_idx").cast("int"),
        col("lon").cast("double"),
        col("lat").cast("double"))
}
