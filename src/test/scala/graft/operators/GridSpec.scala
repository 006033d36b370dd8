package graft.operators

import graft.SparkSpec

class GridSpec extends SparkSpec {
  import spark.implicits._

  private val lattice = Grid.Lattice(18.30, 54.25, 18.80, 54.65, 10.0, 2.0)

  test("tiles: lattice covers the bbox, ids well-formed, buffers 2km wider") {
    val ts = Grid.tiles(spark, lattice).collect()
    assert(ts.nonEmpty)
    ts.foreach { r =>
      val gid = r.getAs[String]("grid_id")
      assert(gid == s"r${r.getAs[Int]("row")}_c${r.getAs[Int]("col")}")
      assert(r.getAs[Double]("b_minlon") < r.getAs[Double]("t_minlon"))
      assert(r.getAs[Double]("b_maxlat") > r.getAs[Double]("t_maxlat"))
      // tile overlaps the bbox (the reference's continue-filter)
      assert(r.getAs[Double]("t_maxlon") > lattice.minlon)
      assert(r.getAs[Double]("t_minlon") < lattice.maxlon)
    }
    // every bbox point is inside exactly one tile (owner uniqueness):
    val rnd = new scala.util.Random(3)
    val pts = Seq.fill(100)((
      rnd.between(lattice.minlon + 1e-6, lattice.maxlon - 1e-6),
      rnd.between(lattice.minlat + 1e-6, lattice.maxlat - 1e-6)))
    pts.foreach { case (lon, lat) =>
      val owners = ts.filter(r =>
        lon >= r.getAs[Double]("t_minlon") && lon < r.getAs[Double]("t_maxlon") &&
          lat >= r.getAs[Double]("t_minlat") && lat < r.getAs[Double]("t_maxlat"))
      assert(owners.length == 1, s"($lon,$lat) owned by ${owners.length} tiles")
    }
  }

  test("assignBuffered matches a brute-force containment join") {
    val rnd = new scala.util.Random(9)
    val pts = Seq.fill(200)((rnd.nextLong().abs,
      rnd.between(lattice.minlon - 0.05, lattice.maxlon + 0.05),
      rnd.between(lattice.minlat - 0.05, lattice.maxlat + 0.05)))
      .toDF("id", "lon", "lat")
    val got = Grid.assignBuffered(pts, lattice)
      .select("id", "grid_id").as[(Long, String)].collect().toSet
    val tiles = Grid.tiles(spark, lattice).collect()
    val expected = (for {
      r <- pts.as[(Long, Double, Double)].collect()
      t <- tiles
      if r._2 >= t.getAs[Double]("b_minlon") && r._2 <= t.getAs[Double]("b_maxlon") &&
        r._3 >= t.getAs[Double]("b_minlat") && r._3 <= t.getAs[Double]("b_maxlat")
    } yield (r._1, t.getAs[String]("grid_id"))).toSet
    assert(got == expected)
  }

  test("assignOwner: one row per point, tile-bbox containment, subset of buffered") {
    val rnd = new scala.util.Random(17)
    val pts = Seq.fill(300)((rnd.nextLong().abs,
      rnd.between(lattice.minlon + 1e-9, lattice.maxlon - 1e-9),
      rnd.between(lattice.minlat + 1e-9, lattice.maxlat - 1e-9)))
      .toDF("id", "lon", "lat")
    val owner = Grid.assignOwner(pts, lattice)
      .select("id", "grid_id", "lon", "lat").collect()
    assert(owner.length == 300) // exactly one owner per point, no explode
    val tiles = Grid.tiles(spark, lattice).collect()
      .map(r => r.getAs[String]("grid_id") -> r).toMap
    owner.foreach { r =>
      val t = tiles(r.getAs[String]("grid_id"))
      val lon = r.getAs[Double]("lon"); val lat = r.getAs[Double]("lat")
      // nearest-center IS containment for in-bbox points (spacing = width)
      assert(lon >= t.getAs[Double]("t_minlon") - 1e-12 &&
        lon <= t.getAs[Double]("t_maxlon") + 1e-12)
      assert(lat >= t.getAs[Double]("t_minlat") - 1e-12 &&
        lat <= t.getAs[Double]("t_maxlat") + 1e-12)
    }
    // the owner row is always one of the buffered-replication rows, so
    // owner-filtering buffered results can never lose a node
    val buffered = Grid.assignBuffered(pts, lattice)
      .select("id", "grid_id").as[(Long, String)].collect().toSet
    owner.foreach { r =>
      assert(buffered.contains((r.getAs[Long]("id"), r.getAs[String]("grid_id"))))
    }
  }

  test("gridDensityClusters: diagonal adjacency, singleton, and the mean cut") {
    import spark.implicits._
    // unit cells; planted occupancy: an L of three 5-point cells (touching
    // by side and DIAGONAL), one isolated 5-point cell, 8 background
    // 1-point cells -> total 28 pts / 12 cells -> mean 2 -> dense = the 5s
    def pts(cy: Int, cx: Int, n: Int): Seq[(Double, Double)] =
      Seq.fill(n)((cy + 0.3, cx + 0.6))
    val cloud = pts(0, 0, 5) ++ pts(0, 1, 5) ++ pts(1, 1, 5) ++ pts(5, 5, 5) ++
      (10 to 17).map(i => (i + 0.5, 0.5))
    val df = cloud.toDF("lat", "lon")
    val got = Grid.gridDensityClusters(df, invCellDeg = 1.0)
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (0L, 3L, 15L, 0L, 1L, 0L, 1L),          // the L merges via the diagonal
      (5000005L, 1L, 5L, 5L, 5L, 5L, 5L)))    // isolated dense cell survives
  }
}
