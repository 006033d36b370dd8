package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions._

/** Nearest-node spatial snap join (SURVEY.md §2.3 J2-J4) — the one genuinely
  * custom join of the engine.
  *
  * The reference snaps with a scipy cKDTree built over all nodes in EPSG:3857
  * (snap_poi_to_nodes.py:81-86, 176-188; graph_construction.py:74-95), with a
  * max-snap cutoff that yields node -1 beyond 300 m (test_path.py:374,
  * poi_query.py:21-47). A KD-tree is a single-machine index; the distributed
  * redesign is grid-cell bucketing:
  *
  *   1. project both sides to Web-Mercator meters (same metric space the
  *      reference's KD-tree queries in — dist_to_node_m is PLANAR 3857
  *      meters, not haversine, kept for parity);
  *   2. bucket nodes into square cells of side maxSnapM;
  *   3. replicate each point into its 3×3 neighbor cells (any node within
  *      maxSnapM of a point provably lies in that window: a disk of radius r
  *      centered anywhere in a cell of side r is covered by the 3×3 block);
  *   4. equi-join on the cell key — ONE shuffle, no cross join, skew bounded
  *      by cell density (dense downtown cells can further AQE-split);
  *   5. per-point argmin via the `min_by` AGGREGATE over (dist, node_idx) —
  *      partial aggregation collapses each partition's candidates to one
  *      row per point BEFORE the shuffle (a row_number window would sort
  *      the full candidate table per key instead); the node_idx tie-break
  *      makes equidistant snaps deterministic, which the reference's
  *      KD-tree is not (it returns whichever leaf wins).
  *
  * Scale: both inputs shuffle once on the cell key; the points side fans out
  * ×9. With cell = 300 m a 10×10 km tile is ~1.1k cells; a planet-scale node
  * table keys on (grid_id, cell) and stays co-partitioned with its tile.
  */
object SnapJoin {

  /** Snap each point to its nearest node within `maxSnapM` planar meters.
    *
    * `points` must have (`idCol`, lon, lat); `nodes` must have
    * (node_idx, lon, lat). Returns one row per point:
    * (`idCol`, node_idx, dist_to_node_m) with node_idx = -1 and null distance
    * when no node is within the cutoff (reference poi_query.py:44-47).
    *
    * `quantize` ≥ 0 rounds the PROJECTED coordinates to that many decimals
    * before any distance math — used by the oracle-checked queries: the
    * Mercator projection's ln/tan can drift 1 ulp between libm and the JVM,
    * but once both engines agree on the (quantized) coordinates, the
    * distance arithmetic (subtract/multiply/sqrt) is bit-identical by IEEE
    * 754. Pass -1 for raw doubles in production.
    */
  def nearestNode(points: DataFrame, nodes: DataFrame, idCol: String,
                  maxSnapM: Double = 300.0, quantize: Int = -1): DataFrame = {
    val cell = maxSnapM
    def q(c: org.apache.spark.sql.Column) = if (quantize >= 0) round(c, quantize) else c
    val nx = nodes.select(
      col("node_idx"),
      q(mercatorX(col("lon"))).as("nxm"),
      q(mercatorY(col("lat"))).as("nym"))
      .withColumn("cx", floor(col("nxm") / cell).cast("long"))
      .withColumn("cy", floor(col("nym") / cell).cast("long"))
    val px = points.select(
      col(idCol),
      q(mercatorX(col("lon"))).as("pxm"),
      q(mercatorY(col("lat"))).as("pym"))
    val neighbors = array((-1 to 1).map(lit): _*)
    val rep = px
      .withColumn("dx", explode(neighbors))
      .withColumn("dy", explode(neighbors))
      .select(col(idCol), col("pxm"), col("pym"),
        (floor(col("pxm") / cell).cast("long") + col("dx")).as("cx"),
        (floor(col("pym") / cell).cast("long") + col("dy")).as("cy"))
    val dist =
      sqrt((col("pxm") - col("nxm")) * (col("pxm") - col("nxm")) +
           (col("pym") - col("nym")) * (col("pym") - col("nym")))
    val cand = rep.join(nx, Seq("cx", "cy"))
      .withColumn("dist", dist)
      .filter(col("dist") <= maxSnapM)
    // min_by over the (dist, node_idx) struct = lexicographic argmin, the
    // same winner the former row_number window picked — but as a hash
    // aggregate with map-side combine, so candidate volume collapses to
    // |points| rows before the shuffle instead of sorting per key after it
    val best = cand
      .groupBy(col(idCol))
      .agg(min_by(struct(col("node_idx"), col("dist")),
        struct(col("dist"), col("node_idx"))).as("pick"))
      .select(col(idCol), col("pick.node_idx").as("node_idx"),
        col("pick.dist").as("dist_to_node_m"))
    points.select(idCol).join(best, Seq(idCol), "left")
      .withColumn("node_idx", coalesce(col("node_idx"), lit(-1)))
  }
}
