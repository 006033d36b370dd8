package graft.operators

import graft.SparkSpec

class QueryLayerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val nodes = Seq(
    (0, 18.600, 54.350), (1, 18.601, 54.350), (2, 18.700, 54.400), (3, 18.900, 54.500))
    .toDF("node_idx", "lon", "lat")

  test("snapPoints: nearest node, haversine cutoff yields -1") {
    val pts = Seq((10L, 18.6002, 54.3501), (11L, 18.0, 54.0)).toDF("query_id", "lon", "lat")
    val got = QueryLayer.snapPoints(pts, nodes, maxSnapM = 300.0)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(10L) == 0)
    assert(got(11L) == -1) // ~45 km away from everything
  }

  test("nodesNear: radius branch when matches exist, k-nearest fallback otherwise") {
    val inRadius = QueryLayer.nodesNear(nodes, 18.600, 54.350, radiusM = 200.0)
      .select("node_idx").as[Int].collect().toSet
    assert(inRadius == Set(0, 1))
    val fallback = QueryLayer.nodesNear(nodes, 10.0, 50.0, radiusM = 100.0, fallbackK = 2)
      .select("node_idx").as[Int].collect().toSet
    assert(fallback.size == 2) // nothing within 100 m -> 2 nearest instead
  }

  test("pointQuery joins reach and filters by radius") {
    val snapped = Seq((10L, 0), (11L, -1)).toDF("query_id", "node_idx")
    val reach = Seq((0, "supermarket", 400.0, 360.0, 7L), (0, "school", 900.0, 810.0, 8L))
      .toDF("node_idx", "category", "dist_m", "time_s", "poi_id")
    val got = QueryLayer.pointQuery(snapped, reach, radiusM = 800.0)
      .select("query_id", "category").as[(Long, String)].collect().toSeq
    assert(got == Seq((10L, "supermarket"))) // school filtered, -1 snap dropped
  }

  test("cropCompleteWays keeps whole ways touching the bbox") {
    val members = Seq(
      (1L, 1L, 18.25, 54.25), (1L, 2L, 18.9, 54.9), // way 1 straddles
      (2L, 3L, 19.5, 55.5), (2L, 4L, 19.6, 55.6)) // way 2 fully outside
      .toDF("way_id", "node_id", "lon", "lat")
    val got = QueryLayer.cropCompleteWays(members, 18.0, 54.0, 18.5, 54.5)
      .select("node_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L)) // both members of way 1, incl. the outside one
  }

  test("accuracy applies the 20m + offset tolerance rule") {
    val v = Seq(
      (100.0, 110.0, 0.0), // |d|=10 <= 20 -> pass
      (100.0, 135.0, 0.0), // |d|=35 > 20 -> fail
      (100.0, 135.0, 20.0)) // |d|=35 <= 40 -> pass
      .toDF("map_m", "algo_m", "offset_m")
    val r = QueryLayer.accuracy(v).head
    assert(r.getDouble(0) == 2.0 / 3.0 && r.getLong(1) == 3L)
  }
}
