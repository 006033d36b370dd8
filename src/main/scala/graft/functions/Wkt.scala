package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** WKT geometry → centroid normalization (SURVEY §2.2 P12; reference
  * snap_poi_to_nodes.py:43-70 `safe_centroid`/`to_points`).
  *
  * The engine's data model has no geometry column type (SURVEY §1.1): the
  * OSM converter is contracted to emit point coordinates. This module closes
  * the last-mile gap for users ingesting raw WKT anyway — the day-one case
  * of a POI that is a building polygon, not a point. It covers the
  * geometry types the reference's POI ingest sees after pyrosm extraction
  * (POINT / MULTIPOINT / LINESTRING / POLYGON outer ring), with shapely's
  * centroid semantics: the point itself, the arithmetic mean of member
  * points, the segment-length-weighted mean of segment midpoints, and the
  * shoelace area centroid respectively. Anything else —
  * unparseable text, unsupported types, degenerate geometry (zero length /
  * zero area) — yields null, mirroring `safe_centroid`'s None-and-drop
  * (snap_poi_to_nodes.py:57-60, 73-78).
  *
  * Everything is `org.apache.spark.sql.functions` expressions — no UDF, no
  * geometry library — so the computation stays codegen'd, columnar, and
  * oracle-checkable. Like TextOps.shinglesFromWords, the two-stage API
  * ([[parse]] → [[centroid]]) exists so the point array is a BOUND attribute
  * before the higher-order centroid lambdas consume it (HOF lambdas capture
  * expression subtrees, not values — the measured O(L²) inlining trap).
  */
object Wkt {

  /** Geometry type token: leading A-Z word of the (trimmed) WKT. */
  def geomType(wkt: Column): Column =
    regexp_extract(upper(trim(wkt)), "^([A-Z]+)", 1)

  /** array<struct<x,y>> of the first coordinate ring: the single paren group
    * for POINT/LINESTRING, the first inner ring for POLYGON (holes — later
    * rings — are intentionally ignored; the reference's POIs have none).
    * A coordinate that fails numeric parse yields a null x/y, which
    * [[centroid]] turns into a null centroid. */
  def points(wkt: Column): Column = {
    val inner = when(geomType(wkt) === "POLYGON",
        regexp_extract(wkt, "\\(\\s*\\(([^()]*)\\)", 1))
      // MULTIPOINT allows per-point parens — "((1 2), (3 4))" and
      // "(1 2, 3 4)" are both legal; take the whole outer group and strip
      // the inner parens, the comma split below handles the rest
      .when(geomType(wkt) === "MULTIPOINT",
        regexp_replace(regexp_extract(wkt, "\\((.+)\\)", 1), "[()]", ""))
      .otherwise(regexp_extract(wkt, "\\(\\s*([^()]*?)\\s*\\)", 1))
    when(length(inner) > 0,
      transform(split(inner, ","), s => {
        val parts = split(trim(s), "\\s+")
        // try_element_at + try_cast, not element_at/cast: ANSI mode
        // (Spark 4 default) throws on a missing index ("POINT (3)", a
        // trailing comma) or a malformed numeric; the contract here is
        // null-and-drop
        struct(try_element_at(parts, lit(1)).try_cast("double").as("x"),
          try_element_at(parts, lit(2)).try_cast("double").as("y"))
      }))
  }

  /** One-row convenience for tests/small frames; hot paths should stage
    * [[geomType]] and [[points]] through their own projection first (see
    * object scaladoc) and call [[centroid]] on the bound columns. */
  def centroidFromWkt(wkt: Column): Column =
    centroid(geomType(wkt), points(wkt))

  /** struct<x,y> centroid of a parsed ring, by geometry type; null when the
    * ring is missing/malformed or the geometry is degenerate. `typ`/`pts`
    * should be bound attributes from [[geomType]]/[[points]]. */
  def centroid(typ: Column, pts: Column): Column = {
    def pt(c: Column) = struct(c.getField("x").as("x"), c.getField("y").as("y"))
    val bad = pts.isNull || size(pts) === 0 ||
      exists(pts, p => p.getField("x").isNull || p.getField("y").isNull)

    // LINESTRING: length-weighted mean of segment midpoints. Left fold in
    // array order (Spark `aggregate`); the SQL mirror may sum in any order
    // for ≤2 segments because IEEE + is commutative. The division happens
    // in aggregate's FINISH lambda, where the accumulator is a bound
    // variable: referencing the fold via getField would re-embed (and,
    // HOFs being CodegenFallback, re-EVALUATE) the whole aggregate once
    // per field access — the same subtree-inlining trap as
    // TextOps.shinglesFromWords, just per-field instead of per-element.
    val segs = transform(sequence(lit(1), size(pts) - 1), i => {
      val p = element_at(pts, i); val q = element_at(pts, i + 1)
      val dx = q.getField("x") - p.getField("x")
      val dy = q.getField("y") - p.getField("y")
      val len = sqrt(dx * dx + dy * dy)
      struct(((p.getField("x") + q.getField("x")) / 2 * len).as("sx"),
        ((p.getField("y") + q.getField("y")) / 2 * len).as("sy"),
        len.as("sl"))
    })
    val zero = struct(lit(0.0).as("sx"), lit(0.0).as("sy"), lit(0.0).as("sl"))
    val merge = (a: Column, s: Column) => struct(
      (a.getField("sx") + s.getField("sx")).as("sx"),
      (a.getField("sy") + s.getField("sy")).as("sy"),
      (a.getField("sl") + s.getField("sl")).as("sl"))
    val nullC = lit(null).cast("struct<x:double,y:double>")
    val lineC = when(size(pts) >= 2,
      aggregate(segs, zero, merge, acc =>
        when(acc.getField("sl") > 0.0,
          struct((acc.getField("sx") / acc.getField("sl")).as("x"),
            (acc.getField("sy") / acc.getField("sl")).as("y")))
          .otherwise(nullC)))

    // POLYGON: shoelace area centroid over the closed outer ring
    // (cx = Σ(x_i+x_{i+1})·cross_i / (3·Σcross_i)); sign-independent, so
    // ring orientation doesn't matter. Zero signed area → null. Same
    // finish-lambda staging as the linestring fold.
    val crosses = transform(sequence(lit(1), size(pts) - 1), i => {
      val p = element_at(pts, i); val q = element_at(pts, i + 1)
      val cross = p.getField("x") * q.getField("y") - q.getField("x") * p.getField("y")
      struct(((p.getField("x") + q.getField("x")) * cross).as("sx"),
        ((p.getField("y") + q.getField("y")) * cross).as("sy"),
        cross.as("sa"))
    })
    val zeroA = struct(lit(0.0).as("sx"), lit(0.0).as("sy"), lit(0.0).as("sa"))
    val mergeA = (a: Column, s: Column) => struct(
      (a.getField("sx") + s.getField("sx")).as("sx"),
      (a.getField("sy") + s.getField("sy")).as("sy"),
      (a.getField("sa") + s.getField("sa")).as("sa"))
    val closed = element_at(pts, 1) === element_at(pts, size(pts))
    val polyC = when(size(pts) >= 4 && closed,
      aggregate(crosses, zeroA, mergeA, acc =>
        when(acc.getField("sa") =!= 0.0,
          struct((acc.getField("sx") / (acc.getField("sa") * 3)).as("x"),
            (acc.getField("sy") / (acc.getField("sa") * 3)).as("y")))
          .otherwise(nullC)))

    // MULTIPOINT: shapely's centroid of a point collection is the plain
    // arithmetic mean — integer-coordinate sums are exact, so the single
    // division per axis is engine-identical
    val multiC = when(size(pts) >= 1,
      aggregate(pts,
        struct(lit(0.0).as("sx"), lit(0.0).as("sy")),
        (a, p) => struct((a.getField("sx") + p.getField("x")).as("sx"),
          (a.getField("sy") + p.getField("y")).as("sy")),
        acc => struct((acc.getField("sx") / size(pts)).as("x"),
          (acc.getField("sy") / size(pts)).as("y"))))

    when(bad, lit(null).cast("struct<x:double,y:double>"))
      .when(typ === "POINT" && size(pts) === 1, pt(element_at(pts, 1)))
      .when(typ === "MULTIPOINT", multiC)
      .when(typ === "LINESTRING", lineC)
      .when(typ === "POLYGON", polyC)
      .otherwise(lit(null).cast("struct<x:double,y:double>"))
  }
}
