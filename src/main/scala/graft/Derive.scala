package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic derivation of the engine's geospatial domain tables
  * (nodes / edges / pois — SURVEY.md §1.1) from the driver's TPC-H-ish
  * testdata, so every graph operator can be verified against the DuckDB
  * oracle on the same inputs.
  *
  * The derivation is pure integer/decimal arithmetic expressed identically
  * as DataFrame ops (here) and as SQL CTEs (`Sql.*`), so Spark and DuckDB
  * produce bit-identical values. Edge weights are integer-valued doubles —
  * path sums stay exact, which makes the Dijkstra oracle hash-stable.
  *
  * This is test scaffolding: at production scale nodes/edges/pois come from
  * the OSM converter output (SURVEY §2.1 S1-S3), partitioned by grid_id.
  */
object Derive {

  /** Grid width of the synthetic graph: node i connects to i+1 (same row)
    * and i+GridW (next row) — a sparse planar graph like a street network. */
  val GridW = 40

  /** The reference's 20 POI categories (reference snap_poi_to_nodes.py:88-114). */
  val Cats: Seq[String] = Seq(
    "bus_stop", "playground", "convenience", "school", "park", "supermarket",
    "parcel_locker", "kinder_childcare", "pharmacy", "bakery", "clinic_hospital",
    "tram_stop", "library", "university", "pub", "rail_station", "veterinary",
    "fitness_centre", "pet_shop", "nightclub")

  private def parquet(spark: SparkSession, dir: String, t: String): DataFrame =
    spark.read.parquet(s"$dir/$t.parquet")

  /** nodes(node_idx, osm_node_id, lon, lat) from `customer`.
    *
    * `c_custkey` is dense 0..N-1 in the driver's testdata, so the node index
    * is pure arithmetic — no global-window `row_number` (the round-1
    * scale-killer: a single-partition WindowExec every graph query funneled
    * through). `osm_node_id` is deliberately sparse (10k+7) so the J1 rekey
    * join (GraphOps.rekeyEdges) is non-trivial to exercise. */
  def nodes(spark: SparkSession, dir: String): DataFrame =
    parquet(spark, dir, "customer").select(
      col("c_custkey").cast("int").as("node_idx"),
      (col("c_custkey") * 10 + 7).as("osm_node_id"),
      (lit(18.4) + (col("c_custkey") % 97) * lit(2e-3)).as("lon"),
      (lit(54.3) + ((col("c_custkey") * 13) % 89) * lit(2e-3)).as("lat"))

  /** Directed forward edges (u < v) of the grid graph with integer-valued
    * weights w ∈ [250, 350]: ≤4 hops fit the 1000 m reach limit, keeping the
    * recursive-CTE oracle tractable while exercising real multi-hop routing. */
  def edges(nodes: DataFrame): DataFrame = {
    val idx = nodes.select(col("node_idx"))
    val a = idx.as("a"); val b = idx.as("b")
    val right = a.join(b,
        col("b.node_idx") === col("a.node_idx") + 1 &&
          (col("a.node_idx") + 1) % GridW =!= 0)
      .select(col("a.node_idx").as("u"), col("b.node_idx").as("v"))
    val down = a.join(b, col("b.node_idx") === col("a.node_idx") + GridW)
      .select(col("a.node_idx").as("u"), col("b.node_idx").as("v"))
    right.union(down)
      .withColumn("w", (lit(250) + (col("u") * 37 + col("v") * 61) % 101).cast("double"))
  }

  /** pois(poi_id, category, node_idx, lon, lat) from `part`, snapped onto
    * pseudo-random nodes; position = node position + a small deterministic
    * offset (exercises the NN-snap join). */
  def pois(spark: SparkSession, dir: String): DataFrame = {
    val n = nodes(spark, dir)
    val nCnt = n.groupBy().agg(count(lit(1)).cast("int").as("n_nodes"))
    parquet(spark, dir, "part")
      .crossJoin(broadcast(nCnt))
      .select(
        col("p_partkey").as("poi_id"),
        element_at(array(Cats.map(lit): _*), (col("p_partkey") % 20 + 1).cast("int")).as("category"),
        ((col("p_partkey") * 7919) % col("n_nodes")).cast("int").as("node_idx"),
        col("p_partkey"))
      .join(n.select(col("node_idx"), col("lon").as("node_lon"), col("lat").as("node_lat")), Seq("node_idx"))
      .select(
        col("poi_id"), col("category"), col("node_idx"),
        (col("node_lon") + (col("p_partkey") % 7 - 3) * lit(1e-4)).as("lon"),
        (col("node_lat") + (col("p_partkey") % 5 - 2) * lit(1e-4)).as("lat"))
  }

  /** SQL CTE mirrors of the above, composable into oracle queries. */
  object Sql {
    val nodes: String =
      """nodes AS (
        |  SELECT CAST(c_custkey AS INT) AS node_idx,
        |         c_custkey * 10 + 7 AS osm_node_id,
        |         18.4 + (c_custkey % 97) * 2e-3 AS lon,
        |         54.3 + ((c_custkey * 13) % 89) * 2e-3 AS lat
        |  FROM customer)""".stripMargin

    val edges: String =
      s"""edges AS (
         |  SELECT u, v, CAST(250 + (u*37 + v*61) % 101 AS DOUBLE) AS w FROM (
         |    SELECT a.node_idx AS u, b.node_idx AS v
         |    FROM nodes a JOIN nodes b ON b.node_idx = a.node_idx + 1
         |      AND (a.node_idx + 1) % $GridW <> 0
         |    UNION ALL
         |    SELECT a.node_idx, b.node_idx
         |    FROM nodes a JOIN nodes b ON b.node_idx = a.node_idx + $GridW))""".stripMargin

    /** Symmetrized (undirected-as-doubled-directed) edge view. */
    val symEdges: String =
      """sym AS (
        |  SELECT u, v, w FROM edges UNION ALL SELECT v AS u, u AS v, w FROM edges)""".stripMargin

    val catsArray: String = Cats.map(c => s"'$c'").mkString("[", ", ", "]")

    val pois: String =
      s"""pois AS (
         |  SELECT p.poi_id, p.category, p.node_idx,
         |         n.lon + (p.p_partkey % 7 - 3) * 1e-4 AS lon,
         |         n.lat + (p.p_partkey % 5 - 2) * 1e-4 AS lat
         |  FROM (
         |    SELECT p_partkey AS poi_id,
         |           $catsArray[CAST(p_partkey % 20 + 1 AS INT)] AS category,
         |           CAST((p_partkey * 7919) % (SELECT count(*) FROM nodes) AS INT) AS node_idx,
         |           p_partkey
         |    FROM part) p
         |  JOIN nodes n ON n.node_idx = p.node_idx)""".stripMargin

    /** Full prelude: nodes + edges + sym + pois. */
    val prelude: String = Seq(nodes, edges, symEdges, pois).mkString(",\n")
  }
}
