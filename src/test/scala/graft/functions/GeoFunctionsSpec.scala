package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import GeoFunctions._

/** Property-style tests over seeded random sample batches (one Spark job
  * per property; deterministic — no framework-level randomness). */
class GeoFunctionsSpec extends SparkSpec {
  import spark.implicits._

  /** 200 seeded random (lon1, lat1, lon2, lat2) samples. */
  private lazy val samples = {
    val rnd = new scala.util.Random(42)
    Seq.fill(200)((rnd.between(-179.0, 179.0), rnd.between(-85.0, 85.0),
      rnd.between(-179.0, 179.0), rnd.between(-85.0, 85.0)))
      .toDF("lon1", "lat1", "lon2", "lat2")
  }

  test("haversine: zero at identical points, symmetric, non-negative") {
    val rows = samples.select(
      haversineM(col("lon1"), col("lat1"), col("lon1"), col("lat1")).as("self"),
      haversineM(col("lon1"), col("lat1"), col("lon2"), col("lat2")).as("ab"),
      haversineM(col("lon2"), col("lat2"), col("lon1"), col("lat1")).as("ba"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == 0.0)
      val (ab, ba) = (r.getDouble(1), r.getDouble(2))
      assert(ab >= 0.0 && math.abs(ab - ba) <= 1e-9 * math.max(1.0, ab))
    }
  }

  test("haversine matches a known Gdansk-Gdynia distance (~20km)") {
    val d = Seq(1).toDF("x")
      .select(haversineM(lit(18.6466), lit(54.3520), lit(18.5305), lit(54.5189)))
      .as[Double].head()
    assert(d > 19500 && d < 20500, s"got $d")
  }

  test("graph-weight haversine replaces exact zero with 0.01 m, no floor") {
    val r = Seq(1).toDF("x").select(
      haversineWeightM(lit(18.0), lit(54.0), lit(18.0), lit(54.0)).as("z"),
      haversineWeightM(lit(18.0), lit(54.0), lit(18.0 + 1e-9), lit(54.0)).as("tiny"))
      .head
    assert(r.getDouble(0) == 0.01)
    assert(r.getDouble(1) > 0.0 && r.getDouble(1) < 0.01) // (0, 0.01) passes through
  }

  test("three radii: graph radius > query radius; grid variant in km") {
    val r = Seq(1).toDF("x").select(
      haversineWeightM(lit(18.6466), lit(54.3520), lit(18.5305), lit(54.5189)).as("g"),
      haversineM(lit(18.6466), lit(54.3520), lit(18.5305), lit(54.5189)).as("q"),
      haversineGridKm(lit(18.6466), lit(54.3520), lit(18.5305), lit(54.5189)).as("k"))
      .head
    assert(r.getDouble(0) > r.getDouble(1))
    assert(math.abs(r.getDouble(2) * 1000 - r.getDouble(1)) < 30)
  }

  test("equirect d2 ranks nearby points like haversine") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(200)((rnd.between(-170.0, 170.0), rnd.between(-80.0, 80.0),
      rnd.between(1e-4, 5e-3), rnd.between(1e-4, 5e-3)))
      .toDF("lon", "lat", "d1", "d2")
    val rows = pts.select(
      equirectDist2(col("lon"), col("lat"), col("lon") + col("d1"), col("lat")).as("near"),
      equirectDist2(col("lon"), col("lat"), col("lon") + col("d1") + col("d2"), col("lat")).as("far"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) < r.getDouble(1)))
  }

  test("web-mercator: x linear in lon, y monotone in lat") {
    val r = Seq(1).toDF("x").select(
      mercatorX(lit(10.0)).as("x1"), mercatorX(lit(20.0)).as("x2"), mercatorX(lit(30.0)).as("x3"),
      mercatorY(lit(50.0)).as("y1"), mercatorY(lit(51.0)).as("y2")).head
    assert(math.abs((r.getDouble(2) - r.getDouble(1)) - (r.getDouble(1) - r.getDouble(0))) < 1e-6)
    assert(r.getDouble(3) < r.getDouble(4))
  }

  test("sanitize_key: specials, collapse, strip, default, truncate-60") {
    val cases = Seq(
      "Weird Cat/Name!" -> "weird_cat_name",
      "__x__" -> "x",
      "###" -> "cat",
      "a.b-c_d" -> "a.b-c_d",
      ("x" * 80) -> ("x" * 60),
      // single-pass-equivalence edge cases (the scaladoc's argument that
      // one [^a-z0-9.-]+ pass + trim('_') equals the three-pass spec):
      "a_!_b" -> "a_b",   // junk-and-underscore mixed run collapses once
      "-_-" -> "-_-",     // lone underscore between kept chars survives
      "_" -> "cat",       // pure underscore strips to empty -> default
      "a.__.b" -> "a._.b") // underscore run between dots still collapses
    val got = cases.map(_._1).toDF("s").select(sanitizeKey(col("s"))).as[String].collect()
    assert(got.toSeq == cases.map(_._2))
  }

  test("quantizeE7 truncates toward zero (numpy astype semantics)") {
    val got = Seq(18.123456789, -18.123456789).toDF("c")
      .select(quantizeE7(col("c"))).as[Int].collect()
    assert(got.toSeq == Seq(181234567, -181234567))
  }

  test("gridId formats r{row}_c{col}") {
    assert(Seq((3, 17)).toDF("r", "c")
      .select(gridId(col("r"), col("c"))).as[String].head() == "r3_c17")
  }

  test("bboxFromPointRadius spans ~2r meters of latitude") {
    val row = Seq(1).toDF("x")
      .select(bboxFromPointRadius(lit(18.6), lit(54.35), lit(500.0)).as("b"))
      .select(col("b.minlat"), col("b.maxlat")).head
    val heightM = (row.getDouble(1) - row.getDouble(0)) / 180.0 * math.Pi * R_QUERY_M
    assert(math.abs(heightM - 1000.0) < 1.0)
  }
}
