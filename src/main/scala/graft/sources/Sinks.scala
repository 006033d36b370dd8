package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** File + database sinks/sources (SURVEY.md §2.1 S6, S10-S12, S16).
  *
  * The reference's pipeline stages hand data to each other through files:
  * CSV debug/summary dumps (graph_construction.py:245-281,
  * precompute_poi_reach.py:222-228), a JSON grid file
  * (grid_creation.py:134-138), a one-id-per-line text file
  * (json_to_txt_conversion.py:26-29), and a PROMISED-but-absent database
  * stage (README.md:2). Here each boundary is a thin, typed wrapper over
  * Spark's native writers/readers — partition-parallel by construction —
  * plus the JDBC sink the reference never shipped.
  */
object Sinks {

  // ---------------------------------------------------------------- CSV (S10)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Schema-pinned CSV read: never infer types at scale (inference is an
    * extra full pass over the data). */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  // --------------------------------------------------------------- JSON (S11)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  // --------------------------------------------------- text id lists (S12/U3)

  /** One value per line (reference json_to_txt_conversion.py:26-29). */
  def writeTextLines(df: DataFrame, column: String, path: String): Unit =
    df.select(col(column).cast("string").as("value"))
      .write.mode("overwrite").text(path)

  /** Tolerant id-list reader (reference extract_map_from_json.py:18-38):
    * splits lines on commas, trims, drops blanks and '#' comments, dedups
    * keeping FIRST-SEEN order.
    *
    * First-seen order is well-defined for a SINGLE text file (the
    * reference's shape): `monotonically_increasing_id` follows Spark's
    * split packing, so across a multi-file directory "first" follows
    * partition order, not any particular file order — which is itself
    * undefined for a directory. Feed one file when order matters. */
  def readIdLines(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.text(path)
      .withColumn("line", monotonically_increasing_id())
      // posexplode: keep the WITHIN-line position too — ids on one line
      // share the line id, and first-seen order must respect both
      .select(col("line"), posexplode(split(col("value"), ",")).as(Seq("elem", "id")))
      .select(col("line"), col("elem"), trim(col("id")).as("id"))
      .filter(col("id") =!= "" && !col("id").startsWith("#"))
    raw.groupBy("id")
      .agg(min(struct(col("line"), col("elem"))).as("pos"))
      .orderBy("pos")
      .select("id")
  }

  // ----------------------------------------------------------------- ORC (S6)

  /** Columnar sibling of the parquet sink (S6): same self-describing
    * schema, predicate-pushdown and column-pruning story, different
    * container — the interchange format when the downstream consumer is
    * Hive/Trino-shaped. Spark's reader recovers types (including IEEE
    * doubles, bit-exact) without a caller-supplied schema. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  // ----------------------------------------------------------------- XML (S6c)

  /** XML sink/source over Spark 4's NATIVE xml data source (the spark-xml
    * package was folded into core in 4.0) — the interchange format when
    * the downstream consumer is a feed/config system. Values are escaped
    * by the writer, so arbitrary text columns survive; the reader is
    * schema-pinned like [[readCsv]] (inference is an extra pass, and XML
    * carries no types of its own). */
  def writeXml(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("rowTag", "row").xml(path)

  def readXml(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("rowTag", "row").schema(schema).xml(path)

  // --------------------------------------------------------------- JDBC (S16)

  /** The DB-persistence stage the reference promises but never implements
    * (README.md:2) — the declared engine approach supplies it. Plain
    * `df.write.jdbc`: Spark parallelizes one INSERT batch per partition.
    * Tested against in-memory Derby (the JDBC driver shipped with Spark). */
  def writeJdbc(df: DataFrame, url: String, table: String,
                props: Properties = new Properties()): Unit =
    df.write.mode("overwrite").jdbc(url, table, props)

  def readJdbc(spark: SparkSession, url: String, table: String,
               props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, props)
}
