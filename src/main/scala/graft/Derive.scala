package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Geo-consistent node layout for the spatial-tiling path: node i sits at
    * lattice cell (row = i/GridW, col = i%GridW) with 2e-3° spacing, so
    * grid-graph neighbors are ~130-223 m apart geographically — the
    * street-network premise (edge geo-length ≪ tile buffer) that makes
    * tile-local routing exact. Real OSM input satisfies it by construction
    * (an edge IS a street segment); [[nodes]] deliberately scatters
    * positions to stress the snap join, which breaks it, so the Pipeline's
    * tiling demo uses this table. Same node_idx set as [[nodes]], so
    * [[edges]] and all graph operators are unchanged. */
  def geoNodes(spark: SparkSession, dir: String): DataFrame =
    parquet(spark, dir, "customer").select(
      col("c_custkey").cast("int").as("node_idx"),
      (col("c_custkey") * 10 + 7).as("osm_node_id"),
      (lit(18.4) + (col("c_custkey") % GridW) * lit(2e-3)).as("lon"),
      (lit(54.3) + floor(col("c_custkey") / GridW) * lit(2e-3)).as("lat"))

  /** Neighbor candidates of the dense lattice in CLOSED FORM — one map
    * pass over the node scan, existence decided against the max index.
    * PRECONDITION: node_idx is dense (min..max with no holes), which
    * customer keys satisfy at every SF and the ScaleBench materializer
    * preserves by construction ("dense synthetic keys stay dense"). Under
    * density this equals the self-join construction the DuckDB mirror
    * (Sql.edges) keeps — so the oracle re-proves the equivalence on every
    * gate run. The former per-neighbor self-joins broadcast the FULL node
    * list once per join (4-8 hash-relation builds per consumer query) — a
    * driver cost growing linearly with the graph that ScaleBench caught as
    * q11's 13.2× at 10× (5-6 s of the 8 s wall was sequential broadcast
    * builds, not executor work). The max index is a 1-row driver-side
    * steering scalar (same class as the k-means/BPE control sites): a
    * constant-key 1-row join would constant-fold into a
    * BroadcastNestedLoopJoin and trip the plan contract, whereas inlining
    * the bound as a literal keeps every consumer plan join-free. */
  private def neighborEdges(nodes: DataFrame, diag: Boolean): DataFrame = {
    val hi = nodes.agg(max(col("node_idx"))).head.getInt(0)
    val vs = Seq(
      when((col("node_idx") + 1) % GridW =!= 0, col("node_idx") + 1), // right
      col("node_idx") + GridW) ++ // down (existence via the hi bound)
      (if (diag) Seq(when((col("node_idx") + 1) % GridW =!= 0,
        col("node_idx") + GridW + 1)) else Nil) // down-right diagonal
    nodes.select(col("node_idx").as("u"), explode(array(vs: _*)).as("v"))
      .where(col("v").isNotNull && col("v") <= lit(hi))
      .select(col("u"), col("v"))
  }

  /** Directed forward edges (u < v) of the grid graph with integer-valued
    * weights w ∈ [250, 350]: ≤4 hops fit the 1000 m reach limit, keeping the
    * recursive-CTE oracle tractable while exercising real multi-hop routing. */
  def edges(nodes: DataFrame): DataFrame =
    neighborEdges(nodes, diag = false)
      .withColumn("w", (lit(250) + (col("u") * 37 + col("v") * 61) % 101).cast("double"))

  /** Lattice edges plus each cell's down-right diagonal — a triangulated
    * planar graph (2 triangles per full cell; the plain lattice is
    * triangle-free). Input to the triangle-count operator. */
  def edgesDiag(nodes: DataFrame): DataFrame =
    neighborEdges(nodes, diag = true)

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

  /** Messy OSM-ish tag values — mixed case, padding, nulls — to exercise the
    * P1 tag-normalization path (reference graph_construction.py:34-35). */
  val HighwayVals: Seq[String] = Seq(
    "footway", " Path ", "PEDESTRIAN", "primary", "motorway", "residential",
    null, "secondary", "trunk", "steps", "service", "cycleway", "track",
    "tertiary", "living_street", "unclassified", "crossing")
  val FootVals: Seq[String] = Seq("yes", null, "no", "designated", "permissive")
  val SidewalkVals: Seq[String] = Seq(null, "both", "no", "left", "right", "yes")
  val MotorroadVals: Seq[String] = Seq(null, "yes", "no")
  val OnewayVals: Seq[String] = Seq("yes", null)

  private def pick(vals: Seq[String], key: Column): Column =
    element_at(array(vals.map(v => lit(v).cast("string")): _*),
      (key % vals.size + 1).cast("int"))

  /** ways(way_id, highway, foot, sidewalk, motorroad, oneway) from `orders` —
    * a raw OSM way-tags table with dirty values for P1/P2. */
  def ways(spark: SparkSession, dir: String): DataFrame =
    parquet(spark, dir, "orders").select(
      col("o_orderkey").as("way_id"),
      pick(HighwayVals, col("o_orderkey")).as("highway"),
      pick(FootVals, col("o_orderkey")).as("foot"),
      pick(SidewalkVals, col("o_orderkey")).as("sidewalk"),
      pick(MotorroadVals, col("o_orderkey")).as("motorroad"),
      pick(OnewayVals, col("o_orderkey")).as("oneway"))

  /** messy(p_partkey, id_str, NODE_IDX, name) from `part` — dirty ingest rows
    * for the P9-P13 coercion pipeline: nullable string ids, non-numeric
    * node indices, an UPPERCASE column for case-insensitive resolution. */
  def messy(spark: SparkSession, dir: String): DataFrame =
    parquet(spark, dir, "part").select(
      col("p_partkey"),
      when(col("p_partkey") % 7 === 0, lit(null))
        .otherwise((col("p_partkey") * 3).cast("string")).as("id_str"),
      when(col("p_partkey") % 11 === 0, lit("n/a"))
        .otherwise((col("p_partkey") % 50).cast("string")).as("NODE_IDX"),
      col("p_name").as("name"))

  /** (key,value) tag vocabulary for the synthetic OSM-elements table: the 26
    * TAG_MAP pairs plus 4 noise pairs that no category matches. */
  val ElementTags: Seq[(String, String)] =
    operators.PoiExtract.TagMap.map { case (_, k, v) => (k, v) } ++
      Seq(("shop", "shoes"), ("amenity", "fuel"), ("highway", "primary"), ("landuse", "grass"))

  /** elements(elem_id, key, value, name, lon, lat) from `part` — a raw
    * OSM-elements table (one tag pair per element) for S2/S3/U2. */
  def elements(spark: SparkSession, dir: String): DataFrame = {
    val keys = ElementTags.map(_._1)
    val vals = ElementTags.map(_._2)
    val idx = (col("p_partkey") % ElementTags.size + 1).cast("int")
    parquet(spark, dir, "part").select(
      col("p_partkey").as("elem_id"),
      element_at(array(keys.map(lit): _*), idx).as("key"),
      element_at(array(vals.map(lit): _*), idx).as("value"),
      when(col("p_partkey") % 5 === 0, lit(null)).otherwise(col("p_name")).as("name"),
      (lit(18.4) + (col("p_partkey") * 31 % 970) * lit(2e-4)).as("lon"),
      (lit(54.3) + (col("p_partkey") * 17 % 890) * lit(2e-4)).as("lat"))
  }

  /** wayMembers(way_id, node_id, lon, lat) from `orders` — 4-node ways
    * spread over a wide area so a bbox crop splits many ways (S4
    * complete_ways semantics). */
  def wayMembers(spark: SparkSession, dir: String): DataFrame =
    parquet(spark, dir, "orders").select(
      floor(col("o_orderkey") / 4).cast("long").as("way_id"),
      col("o_orderkey").as("node_id"),
      (lit(18.0) + (col("o_orderkey") * 13 % 1000) * lit(1e-3)).as("lon"),
      (lit(54.0) + (col("o_orderkey") * 29 % 800) * lit(1e-3)).as("lat"))

  /** SQL CTE mirrors of the above, composable into oracle queries. */
  object Sql {

    /** Degrees→radians exactly as java.lang.Math.toRadians (x/180*π) — NOT
      * DuckDB's radians(), whose multiplication order may differ in the last
      * ulp. Parity with Spark's `radians` expression (which calls toRadians). */
    def rad(x: String): String = s"($x / 180.0 * pi())"

    /** Haversine mirror of GeoFunctions.haversineM: explicit squares (no
      * pow), same operation order. `r2` is 2·R precomputed. */
    def havM(lon1: String, lat1: String, lon2: String, lat2: String,
             r2: String = "12742000.0"): String = {
      val dLat = s"(${rad(lat2)} - ${rad(lat1)})"
      val dLon = s"(${rad(lon2)} - ${rad(lon1)})"
      val a = s"(sin($dLat/2)*sin($dLat/2) + cos(${rad(lat1)})*cos(${rad(lat2)})*sin($dLon/2)*sin($dLon/2))"
      s"($r2 * asin(sqrt($a)))"
    }

    /** Mirror of GeoFunctions.haversineWeightM (R=6371008.8, a clamped,
      * exact-zero → 0.01 m). */
    def havWeightM(lon1: String, lat1: String, lon2: String, lat2: String): String = {
      val dLat = s"(${rad(lat2)} - ${rad(lat1)})"
      val dLon = s"(${rad(lon2)} - ${rad(lon1)})"
      val a = s"greatest(0.0, least(1.0, sin($dLat/2)*sin($dLat/2) + cos(${rad(lat1)})*cos(${rad(lat2)})*sin($dLon/2)*sin($dLon/2)))"
      val d = s"(12742017.6 * asin(sqrt($a)))"
      s"(CASE WHEN $d = 0.0 THEN 0.01 ELSE $d END)"
    }

    private def sqlList(vals: Seq[String]): String =
      vals.map(v => if (v == null) "NULL" else s"'$v'").mkString("[", ", ", "]")

    val ways: String =
      s"""ways AS (
         |  SELECT o_orderkey AS way_id,
         |         (${sqlList(HighwayVals)})[CAST(o_orderkey % ${HighwayVals.size} AS INT) + 1] AS highway,
         |         (${sqlList(FootVals)})[CAST(o_orderkey % ${FootVals.size} AS INT) + 1] AS foot,
         |         (${sqlList(SidewalkVals)})[CAST(o_orderkey % ${SidewalkVals.size} AS INT) + 1] AS sidewalk,
         |         (${sqlList(MotorroadVals)})[CAST(o_orderkey % ${MotorroadVals.size} AS INT) + 1] AS motorroad,
         |         (${sqlList(OnewayVals)})[CAST(o_orderkey % ${OnewayVals.size} AS INT) + 1] AS oneway
         |  FROM orders)""".stripMargin

    val elements: String = {
      val keys = ElementTags.map(t => s"'${t._1}'").mkString("[", ", ", "]")
      val vals = ElementTags.map(t => s"'${t._2}'").mkString("[", ", ", "]")
      val n = ElementTags.size
      s"""elements AS (
         |  SELECT p_partkey AS elem_id,
         |         ($keys)[CAST(p_partkey % $n AS INT) + 1] AS key,
         |         ($vals)[CAST(p_partkey % $n AS INT) + 1] AS value,
         |         CASE WHEN p_partkey % 5 = 0 THEN NULL ELSE p_name END AS name,
         |         18.4 + (p_partkey * 31 % 970) * 2e-4 AS lon,
         |         54.3 + (p_partkey * 17 % 890) * 2e-4 AS lat
         |  FROM part)""".stripMargin
    }

    /** VALUES-list mirror of PoiExtract.TagMap. */
    val tagDim: String = {
      val rows = operators.PoiExtract.TagMap
        .map { case (c, k, v) => s"('$c', '$k', '$v')" }.mkString(", ")
      s"tagdim(category, key, value) AS (VALUES $rows)"
    }

    val wayMembers: String =
      """way_members AS (
        |  SELECT CAST(floor(o_orderkey / 4) AS BIGINT) AS way_id,
        |         o_orderkey AS node_id,
        |         18.0 + (o_orderkey * 13 % 1000) * 1e-3 AS lon,
        |         54.0 + (o_orderkey * 29 % 800) * 1e-3 AS lat
        |  FROM orders)""".stripMargin

    val messy: String =
      """messy AS (
        |  SELECT p_partkey,
        |         CASE WHEN p_partkey % 7 = 0 THEN NULL
        |              ELSE CAST(p_partkey * 3 AS VARCHAR) END AS id_str,
        |         CASE WHEN p_partkey % 11 = 0 THEN 'n/a'
        |              ELSE CAST(p_partkey % 50 AS VARCHAR) END AS node_idx,
        |         p_name AS name
        |  FROM part)""".stripMargin
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

    /** Mirror of [[Derive.edgesDiag]]: lattice + down-right diagonals. */
    val edgesDiag: String =
      s"""ediag AS (
         |  SELECT a.node_idx AS u, b.node_idx AS v
         |  FROM nodes a JOIN nodes b ON b.node_idx = a.node_idx + 1
         |    AND (a.node_idx + 1) % $GridW <> 0
         |  UNION ALL
         |  SELECT a.node_idx, b.node_idx
         |  FROM nodes a JOIN nodes b ON b.node_idx = a.node_idx + $GridW
         |  UNION ALL
         |  SELECT a.node_idx, b.node_idx
         |  FROM nodes a JOIN nodes b ON b.node_idx = a.node_idx + $GridW + 1
         |    AND (a.node_idx + 1) % $GridW <> 0)""".stripMargin

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
