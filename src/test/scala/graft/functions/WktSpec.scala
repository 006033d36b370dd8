package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WktSpec extends SparkSpec {
  import spark.implicits._

  private def centroids(wkts: (Long, String)*): Map[Long, Option[(Double, Double)]] =
    wkts.toSeq.toDF("id", "wkt")
      .select(col("id"), Wkt.centroidFromWkt(col("wkt")).as("c"))
      .select(col("id"), col("c.x"), col("c.y"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getDouble(1), r.getDouble(2)))))
      .toMap

  test("POINT: the point itself; whitespace and case tolerated") {
    val c = centroids(1L -> "POINT (3 4)", 2L -> "  point(-1.5 2.25)  ")
    assert(c(1L).contains((3.0, 4.0)))
    assert(c(2L).contains((-1.5, 2.25)))
  }

  test("MULTIPOINT: arithmetic mean; both paren syntaxes accepted") {
    val c = centroids(
      1L -> "MULTIPOINT ((1 2), (3 5))",
      2L -> "MULTIPOINT (1 2, 3 5)",
      3L -> "MULTIPOINT (4 4)",
      4L -> "MULTIPOINT ()")
    assert(c(1L).contains((2.0, 3.5)))
    assert(c(2L).contains((2.0, 3.5)))
    assert(c(3L).contains((4.0, 4.0)))
    assert(c(4L).isEmpty)
  }

  test("LINESTRING: length-weighted midpoint mean (shapely semantics)") {
    // segments (0,0)-(2,0) len 2 mid (1,0); (2,0)-(2,2) len 2 mid (2,1)
    // -> centroid ((1*2+2*2)/4, (0*2+1*2)/4) = (1.5, 0.5)
    val c = centroids(1L -> "LINESTRING (0 0, 2 0, 2 2)")
    assert(c(1L).contains((1.5, 0.5)))
    // unequal weights: (0,0)-(3,0) len 3, (3,0)-(3,1) len 1
    // -> ((1.5*3 + 3*1)/4, (0*3 + 0.5*1)/4) = (1.875, 0.125)
    val d = centroids(2L -> "LINESTRING (0 0, 3 0, 3 1)")
    assert(d(2L).contains((1.875, 0.125)))
  }

  test("POLYGON: shoelace area centroid, orientation-independent") {
    val c = centroids(
      1L -> "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", // square -> (2,2)
      2L -> "POLYGON ((0 0, 0 4, 4 4, 4 0, 0 0))", // reversed orientation
      3L -> "POLYGON ((0 0, 3 0, 0 3, 0 0))") // triangle -> (1,1)
    assert(c(1L).contains((2.0, 2.0)))
    assert(c(2L).contains((2.0, 2.0)))
    assert(c(3L).contains((1.0, 1.0)))
    // area centroid != vertex mean: L-shape; shapely gives (7/3, 7/3)... use
    // a right trapezoid (0,0)(4,0)(4,2)(0,1): A = 6? shoelace:
    // crosses: (0,0)x(4,0)=0; (4,0)x(4,2)=8; (4,2)x(0,1)=4-0=4; (0,1)x(0,0)=0
    // 2A = 12, cx = [(0+4)*0+(4+4)*8+(4+0)*4]/(3*12) = (64+16)/36 = 20/9
    val t = centroids(4L -> "POLYGON ((0 0, 4 0, 4 2, 0 1, 0 0))")
    assert(t(4L).exists { case (x, y) =>
      math.abs(x - 20.0 / 9) < 1e-12 && y > 0 })
  }

  test("degenerate, unsupported, and garbage inputs are null") {
    val c = centroids(
      1L -> "POLYGON ((0 0, 2 0, 4 0, 0 0))", // zero area
      2L -> "POLYGON ((0 0, 1 0, 0 1))", // unclosed ring
      3L -> "LINESTRING (5 5, 5 5)", // zero length
      4L -> "MULTIPOLYGON (((0 0, 1 0, 0 1, 0 0)))", // unsupported type
      5L -> "POINT (a b)", // non-numeric
      6L -> "complete garbage",
      7L -> "POINT ()",
      8L -> "POINT (3)", // one-token coordinate (ANSI element_at trap)
      9L -> "LINESTRING (0 0, 2 0,)") // trailing comma -> empty coordinate
    (1L to 9L).foreach(i => assert(c(i).isEmpty, s"id $i should be null"))
  }

  test("property: random integer triangles match the closed-form centroid") {
    val rnd = new scala.util.Random(41)
    val cases = Seq.fill(60)((rnd.between(-50, 50), rnd.between(-50, 50),
      rnd.between(1, 9), rnd.between(1, 9)))
    val c = centroids(cases.zipWithIndex.map { case ((a, b, w, h), i) =>
      i.toLong -> s"POLYGON (($a $b, ${a + w} $b, $a ${b + h}, $a $b))"
    }: _*)
    // a triangle's area centroid is its vertex mean: (a + w/3, b + h/3)
    cases.zipWithIndex.foreach { case ((a, b, w, h), i) =>
      val Some((x, y)) = c(i.toLong)
      assert(math.abs(x - (a + w / 3.0)) < 1e-9, s"case $i x")
      assert(math.abs(y - (b + h / 3.0)) < 1e-9, s"case $i y")
    }
  }

  test("property: random linestrings match a reference fold") {
    val rnd = new scala.util.Random(42)
    val cases = Seq.fill(60) {
      val n = rnd.between(2, 7)
      // distinct consecutive points so no zero-length segments
      Iterator.iterate((rnd.between(-40, 40), rnd.between(-40, 40))) { case (x, y) =>
        (x + rnd.between(1, 10), y + rnd.between(-9, 10))
      }.take(n).toSeq
    }
    val c = centroids(cases.zipWithIndex.map { case (ps, i) =>
      i.toLong -> ps.map { case (x, y) => s"$x $y" }.mkString("LINESTRING (", ", ", ")")
    }: _*)
    cases.zipWithIndex.foreach { case (ps, i) =>
      var sx = 0.0; var sy = 0.0; var sl = 0.0
      ps.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
        val len = math.sqrt((x2 - x1).toDouble * (x2 - x1) + (y2 - y1).toDouble * (y2 - y1))
        sx += (x1 + x2) / 2.0 * len; sy += (y1 + y2) / 2.0 * len; sl += len
      }
      val Some((x, y)) = c(i.toLong)
      assert(math.abs(x - sx / sl) < 1e-9 && math.abs(y - sy / sl) < 1e-9, s"case $i")
    }
  }

  test("staged two-stage form equals the convenience form") {
    val df = Seq(
      (1L, "POINT (1 2)"),
      (2L, "LINESTRING (0 0, 2 0, 2 2)"),
      (3L, "POLYGON ((0 0, 3 0, 0 3, 0 0))")).toDF("id", "wkt")
    val staged = df
      .select(col("id"), Wkt.geomType(col("wkt")).as("typ"), Wkt.points(col("wkt")).as("pts"))
      .select(col("id"), Wkt.centroid(col("typ"), col("pts")).as("c"))
    val inline = df.select(col("id"), Wkt.centroidFromWkt(col("wkt")).as("c"))
    assert(staged.collect().sortBy(_.getLong(0)).sameElements(
      inline.collect().sortBy(_.getLong(0))))
  }
}
