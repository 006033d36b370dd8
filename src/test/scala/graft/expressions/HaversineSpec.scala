package graft.expressions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GeoFunctions

class HaversineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val pts = {
    val rnd = new scala.util.Random(17)
    // the node-cloud band plus a few extreme/high-lat points and a null
    (0 until 500).map { i =>
      (i.toLong, Some(18.4 + rnd.nextDouble() * 0.2),
        Some(54.3 + rnd.nextDouble() * 0.2))
    } ++ Seq((900L, Some(0.0), Some(89.97)), (901L, Some(-179.9), Some(-89.97)),
      (902L, None: Option[Double], Some(54.3)), (903L, Some(18.4), None))
  }.toDF("id", "lon", "lat")

  private def nativeDist = call_function("graft_haversine_m",
    col("lon"), col("lat"), lit(18.45), lit(54.36))

  test("graft_haversine_m is bit-identical to the oracle-association column form") {
    // the composed form with the SAME ((cos·cos)·sin)·sin association the
    // SQL mirror (Derive.Sql.havM) uses — this is the raw-double contract
    val dLat = radians(lit(54.36)) - radians(col("lat"))
    val dLon = radians(lit(18.45)) - radians(col("lon"))
    val a = sin(dLat / 2) * sin(dLat / 2) +
      cos(radians(col("lat"))) * cos(radians(lit(54.36))) *
        sin(dLon / 2) * sin(dLon / 2)
    val composed = lit(12742000.0) * asin(sqrt(a))
    val diff = pts.na.drop()
      .select((nativeDist - composed).as("d")).as[Double].collect()
    assert(diff.forall(_ == 0.0)) // EXACT, not approximate
    // and within a relative ulp-scale tolerance of the GeoFunctions form
    // (different association -> possibly different last bits, same value)
    val rel = pts.na.drop().select((abs(nativeDist - GeoFunctions.haversineM(
      col("lon"), col("lat"), lit(18.45), lit(54.36))) /
      greatest(nativeDist, lit(1e-9))).as("r")).as[Double].collect()
    assert(rel.forall(_ < 1e-12))
  }

  private def radiusQuery(df: DataFrame) =
    df.filter(nativeDist <= lit(2500.0)).select("id").orderBy("id")

  private def withoutRule[A](body: => A): A = {
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "graft.expressions.RewriteRadiusPredicate")
    try body finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  test("rule injects the bbox, pushes to parquet, and is result-identical") {
    val path = java.nio.file.Files.createTempDirectory("hav").toString + "/pts"
    pts.write.mode("overwrite").parquet(path)
    val onDisk = spark.read.parquet(path)
    val q = radiusQuery(onDisk)
    // optimized plan carries the four bbox comparisons on lat/lon
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains(">= 54.3") && opt.contains("<= 54.3"), opt)
    // the bbox (NOT the haversine) reaches the parquet scan
    val phys = q.queryExecution.executedPlan.toString
    assert(phys.contains("PushedFilters") &&
      phys.matches("(?s).*PushedFilters:.*GreaterThanOrEqual\\(lat.*"), phys)
    // result identity vs the un-rewritten plan, nulls dropped identically
    val withRule = q.as[Long].collect().toSeq
    val baseline = withoutRule {
      val b = radiusQuery(onDisk)
      assert(!b.queryExecution.optimizedPlan.toString.contains(">= 54.3"))
      b.as[Long].collect().toSeq
    }
    assert(withRule == baseline && withRule.nonEmpty)
  }

  test("high-latitude center still result-identical (dLon clamp path)") {
    val q = pts.filter(call_function("graft_haversine_m",
      col("lon"), col("lat"), lit(0.0), lit(89.96)) <= lit(5000.0))
      .select("id").orderBy("id")
    val got = q.as[Long].collect().toSeq
    assert(got == withoutRule {
      pts.filter(call_function("graft_haversine_m",
        col("lon"), col("lat"), lit(0.0), lit(89.96)) <= lit(5000.0))
        .select("id").orderBy("id").as[Long].collect().toSeq
    })
    assert(got.contains(900L)) // the pole-adjacent point is inside
  }

  test("antimeridian-crossing window: lon conjuncts suppressed, rows kept") {
    // center (179.9, 0) r=50km: the naive lon BETWEEN 179.9±0.45 would drop
    // the wrapped-side point at lon=-179.9 (22.2 km away by haversine)
    val wrap = Seq((1L, Some(-179.9), Some(0.0)), (2L, Some(179.95), Some(0.0)),
      (3L, Some(178.0), Some(0.0))).toDF("id", "lon", "lat")
    def q(df: DataFrame) = df.filter(call_function("graft_haversine_m",
      col("lon"), col("lat"), lit(179.9), lit(0.0)) <= lit(50000.0))
      .select("id").orderBy("id")
    val got = q(wrap).as[Long].collect().toSeq
    assert(got == Seq(1L, 2L)) // the wrapped point survives
    assert(got == withoutRule(q(wrap).as[Long].collect().toSeq))
    // lat conjuncts are still injected (always containing) — visible on the
    // pre-folding plan; the LocalRelation constant-folds the optimized one
    val injected = RewriteRadiusPredicate(
      q(wrap).queryExecution.analyzed).toString
    assert(injected.contains(">= -0.4"), injected)
  }

  test("disk touching a pole: lon conjuncts suppressed, far-side row kept") {
    // center (0, 89.998) r=600m: the point (180, 89.999) is 334 m away
    // across the pole but 180° away in raw lon — any finite lon window
    // derived from a clamped cos(phiMax) wrongly excludes it
    val polar = Seq((1L, Some(180.0), Some(89.999)), (2L, Some(0.0), Some(89.9985)),
      (3L, Some(0.0), Some(89.9))).toDF("id", "lon", "lat")
    def q(df: DataFrame) = df.filter(call_function("graft_haversine_m",
      col("lon"), col("lat"), lit(0.0), lit(89.998)) <= lit(600.0))
      .select("id").orderBy("id")
    val got = q(polar).as[Long].collect().toSeq
    assert(got == Seq(1L, 2L)) // the trans-polar point survives
    assert(got == withoutRule(q(polar).as[Long].collect().toSeq))
  }

  test("negative shapes: column center and > direction do not fire") {
    val colCenter = pts.filter(call_function("graft_haversine_m",
      col("lon"), col("lat"), col("lon"), lit(54.36)) <= lit(2500.0))
    assert(!colCenter.queryExecution.optimizedPlan.toString.contains(">= 54.3"))
    val outside = pts.filter(nativeDist > lit(2500.0))
    val opt = outside.queryExecution.optimizedPlan.toString
    // keep-outside-the-disk admits no bounding box; nothing may be added
    assert(!opt.contains(">= 54.3") || opt.contains("NOT"))
  }

  test("idempotent: re-optimizing an already-rewritten plan adds nothing") {
    val once = radiusQuery(pts).queryExecution.optimizedPlan
    val twice = RewriteRadiusPredicate(once)
    assert(twice.toString == once.toString)
  }
}
