package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Sinks

/** End-to-end pipeline demo — the reference's full batch chain (SURVEY §3),
  * run as ONE Spark job graph instead of five file-chained scripts:
  *
  *   elements → tag extraction → NN snap → graph build (walkability +
  *   symmetrize/dedup) → REAL multi-tile reach (Grid.assignBuffered lattice
  *   tiling + per-tile Dijkstra kernels + owner-tile dedup, with an in-job
  *   equality proof against a global single-tile run) → summary → JDBC
  *   persistence (the stage the reference promised but never built) → a
  *   point query against the materialized reach.
  *
  * Usage: `sbt "runMain graft.Pipeline [sfDir]"`. Prints one line per
  * stage with row counts; exits nonzero if any stage yields zero rows, if
  * the lattice degenerates to a single tile, or if the tiled reach differs
  * from the global one.
  */
object Pipeline {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.get("graft-pipeline")
    import spark.implicits._

    val counts = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    def stage(name: String, n: Long): Long = {
      println(f"[pipeline] $name%-28s rows=$n"); counts(name) = n; n
    }

    // 1. ingest + POI extraction (S2/S3/U2)
    val elements = Derive.elements(spark, dir)
    val pois0 = PoiExtract.extractJoin(PoiExtract.tagPreFilter(elements)).cache()
    stage("poi_extract", pois0.count())

    // 2. NN snap onto the node set (J2/J3). geoNodes, not nodes: spatial
    //    tiling below needs graph neighbors to be geographic neighbors
    //    (true for real OSM input; the scattered `nodes` table trades that
    //    away to stress the snap join).
    val nodes = Derive.geoNodes(spark, dir).cache()
    val snapped = SnapJoin.nearestNode(
        pois0.select(col("elem_id").as("poi_id"), col("lon"), col("lat")),
        nodes, "poi_id")
      .filter(col("node_idx") >= 0)
      .join(pois0.select(col("elem_id").as("poi_id"), col("category")), Seq("poi_id"))
      .cache()
    stage("poi_snap", snapped.count())

    // 3. graph build: walkability-filtered ways exercise P1/P2; the routing
    //    graph itself comes from the derived edge table (U1/P4/A1)
    val walkable = GraphOps.cleanWalkableEdges(Derive.ways(spark, dir))
    stage("walkable_ways", walkable.count())
    val sym = GraphOps.symmetrizeDedup(Derive.edges(nodes))
    stage("graph_edges", sym.count())

    // 4. spatial tiling + per-tile bounded multi-source Dijkstra (G1/G5/§4):
    //    a 3 km lattice over the node bbox, buffered tile assignment (2 km
    //    buffer ≥ 2× the 1000 m limit, the reference's own convention), an
    //    edge in every tile whose buffer holds BOTH endpoints, per-tile
    //    kernels, then owner-tile dedup. Sound because every node within
    //    1000 m network distance is ≤4 hops × ≤223 m geo away — far inside
    //    the buffer.
    val Row(minLon: Double, maxLon: Double, minLat: Double, maxLat: Double) =
      nodes.agg(min("lon"), max("lon"), min("lat"), max("lat")).head
    val l = Grid.Lattice(minLon, minLat, maxLon, maxLat, tileKm = 3.0, bufferKm = 2.0)
    val nodeTiles = Grid.assignBuffered(nodes, l)
      .select(col("node_idx"), col("grid_id")).cache()
    val edgesT = sym
      .join(nodeTiles.withColumnRenamed("node_idx", "u"), Seq("u"))
      .join(nodeTiles.withColumnRenamed("node_idx", "v"), Seq("v", "grid_id"))
      .select(col("grid_id").as("tile"), col("u"), col("v"), col("w"))
      .as[TileEdge]
    val srcsT = snapped.join(nodeTiles, Seq("node_idx"))
      .select(col("grid_id").as("tile"), col("category"), col("node_idx"), col("poi_id"))
      .as[TileSource]
    val owner = Grid.assignOwner(nodes, l)
      .select(col("node_idx"), col("grid_id").as("tile"))
    val reach = Dijkstra.reach(edgesT, srcsT, limitM = 1000.0).toDF()
      .join(owner, Seq("tile", "node_idx"))
      .select("tile", "category", "node_idx", "dist_m", "time_s", "poi_id")
      .cache()
    stage("reach_tiles", reach.select("tile").distinct().count())
    stage("reach", reach.count())

    // tiling proof: owner-deduped multi-tile reach must EQUAL a global
    // single-tile run on the same graph + sources, and must have used >1
    // cogroup task (a degenerate 1-tile lattice would pass trivially)
    val reach1 = Dijkstra.reach(
      sym.select(lit("t0").as("tile"), col("u"), col("v"), col("w")).as[TileEdge],
      snapped.select(lit("t0").as("tile"), col("category"), col("node_idx"), col("poi_id"))
        .as[TileSource],
      limitM = 1000.0).toDF()
    val cols = Seq("category", "node_idx", "dist_m", "time_s", "poi_id").map(col)
    val diff = reach.select(cols: _*).exceptAll(reach1.select(cols: _*))
      .unionAll(reach1.select(cols: _*).exceptAll(reach.select(cols: _*)))
      .count()
    println(s"[pipeline] multi-tile vs global reach diff rows = $diff")
    if (diff != 0 || counts("reach_tiles") < 2) {
      println("[pipeline] TILING MISMATCH"); spark.stop(); sys.exit(1)
    }
    val summary = Dijkstra.reachSummary(
      reach, snapped.select("category", "poi_id"), limitM = 1000.0)
    stage("reach_summary", summary.count())

    // 5. persistence: the reference's promised-but-missing DB stage (S16)
    val url = "jdbc:derby:memory:pipelinedb;create=true"
    Sinks.writeJdbc(reach, url, "reach")
    Sinks.writeJdbc(summary, url, "reach_summary")
    stage("jdbc_roundtrip", Sinks.readJdbc(spark, url, "reach").count())

    // 6. point query against the materialized reach (entry point C) —
    //    query next to a node KNOWN to have reach rows, so the gate tests
    //    the query layer rather than data luck
    val tgt = reach.agg(min("node_idx").as("node_idx")).join(nodes, Seq("node_idx"))
    val qp = tgt.select(lit(0L).as("query_id"), (col("lon") + 1e-4).as("lon"), col("lat"))
    val answer = QueryLayer.pointQuery(
      QueryLayer.snapPoints(qp, nodes), Sinks.readJdbc(spark, url, "reach"), radiusM = 1000.0)
      .cache()
    stage("point_query", answer.count())
    answer.orderBy("dist_m").show(5, truncate = false)

    // every stage must produce rows (the docstring's contract — ALL stages)
    val empty = counts.collect { case (k, 0) => k }
    if (empty.nonEmpty) println(s"[pipeline] EMPTY stages: ${empty.mkString(", ")}")
    spark.stop()
    if (empty.nonEmpty) sys.exit(1)
  }
}
