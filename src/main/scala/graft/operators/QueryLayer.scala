package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions._

/** The user-facing query layer (SURVEY.md §3.3, reference entry point C —
  * poi_query.py): snap a (lon, lat) to its nearest graph node, look the
  * node up in the precomputed reach table, filter by radius, sort by
  * distance.
  *
  * The reach table is the materialized view the whole design rests on
  * (precompute-then-O(1)-lookup split, reference precompute_poi_reach.py:
  * 4-9 / poi_query.py:89-99): point queries never touch the graph.
  */
object QueryLayer {

  /** J4: snap query points to nearest nodes — equirectangular d² pre-rank
    * over all nodes, exact haversine refine on the winner, −1 beyond
    * `maxSnapM` (reference poi_query.py:21-47 brute-force scan + the
    * cKDTree cutoff variant, test_path.py:262-268).
    *
    * Each query point is one global argmin: a min_by aggregate per point —
    * distributed partial aggregation over the node table, no global sort,
    * no window. `points` must have (query_id, lon, lat). */
  def snapPoints(points: DataFrame, nodes: DataFrame,
                 maxSnapM: Double = 300.0): DataFrame = {
    val d2 = equirectDist2(col("q_lon"), col("q_lat"), col("lon"), col("lat"))
    val best = points.select(col("query_id"), col("lon").as("q_lon"), col("lat").as("q_lat"))
      .crossJoin(nodes.select(col("node_idx"), col("lon"), col("lat")))
      .groupBy("query_id", "q_lon", "q_lat")
      .agg(min_by(struct(col("node_idx"), col("lon"), col("lat")), struct(d2, col("node_idx"))).as("nn"))
      .select(col("query_id"), col("q_lon"), col("q_lat"),
        col("nn.node_idx").as("node_idx"), col("nn.lon").as("n_lon"), col("nn.lat").as("n_lat"))
    best
      .withColumn("snap_dist_m",
        haversineM(col("q_lon"), col("q_lat"), col("n_lon"), col("n_lat")))
      .select(col("query_id"),
        when(col("snap_dist_m") > maxSnapM, lit(-1)).otherwise(col("node_idx")).as("node_idx"),
        col("snap_dist_m"))
  }

  /** P7 + W6 + U4: per-category reach lookup for snapped query points.
    * Returns only rows within `radiusM` (the in-range split; out-of-range =
    * anti-join recoverable downstream), sorted for display (S15 analog). */
  def pointQuery(snapped: DataFrame, reach: DataFrame, radiusM: Double): DataFrame =
    snapped
      .filter(col("node_idx") >= 0)
      .join(reach, Seq("node_idx"))
      .filter(col("dist_m") <= radiusM)
      .select(col("query_id"), col("category"), col("dist_m"), col("time_s"), col("poi_id"))

  /** P8: distance-window node filter with k-nearest fallback — keep nodes
    * within `radiusM` of the center; if NONE qualify, fall back to the k
    * nearest (reference test_path.py:337-343). One aggregation pass decides
    * which branch applies — no driver round-trip, and the global ranking
    * window sits BEHIND an `n_in === 0` filter, so in the common (non-empty
    * radius) case it sorts zero rows instead of the whole node table. */
  def nodesNear(nodes: DataFrame, lon: Double, lat: Double,
                radiusM: Double, fallbackK: Int = 200): DataFrame = {
    val d = haversineM(lit(lon), lit(lat), col("lon"), col("lat"))
    val withD = nodes.withColumn("center_dist_m", d)
    val anyIn = broadcast(withD.agg(
      coalesce(sum(when(col("center_dist_m") <= radiusM, 1L)), lit(0L)).as("n_in")))
    val inRadius = withD.crossJoin(anyIn)
      .filter(col("n_in") > 0 && col("center_dist_m") <= radiusM)
    val w = Window.orderBy(col("center_dist_m"), col("node_idx"))
    val fallback = withD.crossJoin(anyIn)
      .filter(col("n_in") === 0) // empty unless the radius found nothing
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= fallbackK)
      .drop("rnk")
    inRadius.unionByName(fallback).drop("n_in")
  }

  /** S4: bbox crop — the osmium-extract analog. `completeWays` keeps every
    * node of any way with at least one node inside the bbox (osmium's
    * `-s complete_ways`, reference extract_map_from_json.py:60-74):
    * in-bbox nodes → semi-join to their ways → semi-join back to members. */
  def cropToBbox(nodes: DataFrame, minLon: Double, minLat: Double,
                 maxLon: Double, maxLat: Double): DataFrame =
    nodes.filter(
      col("lon").between(minLon, maxLon) && col("lat").between(minLat, maxLat))

  def cropCompleteWays(wayMembers: DataFrame, // (way_id, node_id, lon, lat)
                       minLon: Double, minLat: Double,
                       maxLon: Double, maxLat: Double): DataFrame = {
    val inBox = cropToBbox(wayMembers, minLon, minLat, maxLon, maxLat)
    val keepWays = inBox.select("way_id").distinct()
    wayMembers.join(keepWays, Seq("way_id"), "left_semi")
  }

  /** S5/A6: element counts by type (osmium count analog; empty-extract
    * deletion pairs it with the q05 anti-join). */
  def countsByType(elements: DataFrame, typeCol: String = "key"): DataFrame =
    elements.groupBy(col(typeCol).as("type")).agg(count(lit(1)).as("n"))

  /** A7: the accuracy scalar over a validation table with the reference's
    * tolerance rule — passed ⇔ |map_m − algo_m| ≤ tolerance + offset_m
    * (Documents/metrics.csv methodology, 0.93 baseline). */
  def accuracy(validation: DataFrame, toleranceM: Double = 20.0): DataFrame =
    validation
      .withColumn("passed",
        when(abs(col("map_m") - col("algo_m")) <= lit(toleranceM) + col("offset_m"), 1)
          .otherwise(0))
      .agg((sum("passed") / count(lit(1))).as("accuracy"), count(lit(1)).as("n_cases"))
}
