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

  test("snapPoints: bucketed path == brute-force argmin on a dense lattice") {
    // 21×21 node lattice at ~70 m pitch; query points sit at lattice
    // points, cell corners, mid-edges, and far outside — exercising the
    // resolved path, cell-boundary ties, and the -1 fallback. The oracle
    // is the argmin the ORIGINAL all-pairs operator computed: equirect d²
    // rank (node_idx tie-break), haversine on the winner, -1 past cutoff.
    val latticeNodes = (for { i <- 0 until 21; j <- 0 until 21 }
      yield (i * 21 + j, 18.60 + i * 0.001, 54.35 + j * 0.001)).toSeq
    val nodesDf = latticeNodes.toDF("node_idx", "lon", "lat")
    val qpts = (for { i <- 0 until 10; j <- 0 until 10 }
      yield ((i * 10 + j).toLong, 18.6002 + i * 0.0021, 54.3498 + j * 0.0019)).toSeq ++
      Seq((900L, 18.0, 54.0), (901L, 18.62003, 54.36001))
    val ptsDf = qpts.toDF("query_id", "lon", "lat")
    val got = QueryLayer.snapPoints(ptsDf, nodesDf, maxSnapM = 300.0)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq.sortBy(_._1)
    def equirect2(qlon: Double, qlat: Double, lon: Double, lat: Double): Double = {
      val x = math.toRadians(lon - qlon) * math.cos(math.toRadians(qlat))
      val y = math.toRadians(lat - qlat)
      x * x + y * y
    }
    def hav(qlon: Double, qlat: Double, lon: Double, lat: Double): Double = {
      val a = math.pow(math.sin(math.toRadians(lat - qlat) / 2), 2) +
        math.cos(math.toRadians(qlat)) * math.cos(math.toRadians(lat)) *
          math.pow(math.sin(math.toRadians(lon - qlon) / 2), 2)
      2.0 * 6371000.0 * math.asin(math.sqrt(a))
    }
    val want = qpts.map { case (id, qlon, qlat) =>
      val (ni, nlon, nlat) = latticeNodes
        .minBy { case (ni, lon, lat) => (equirect2(qlon, qlat, lon, lat), ni) }
      val d = hav(qlon, qlat, nlon, nlat)
      (id, if (d > 300.0) -1 else ni, d)
    }.sortBy(_._1)
    assert(got.map(r => (r._1, r._2)) == want.map(r => (r._1, r._2)))
    got.zip(want).foreach { case (g, w) => assert(math.abs(g._3 - w._3) < 1e-9) }
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
