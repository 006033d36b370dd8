package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class ValidatedSourceSpec extends SparkSpec {
  import spark.implicits._

  test("canonicalize: case-insensitive rename; error lists ALL missing") {
    val df = Seq((1L, "x")).toDF("POI_ID", "Category")
    val fixed = ValidatedSource.canonicalize(df, Seq("poi_id", "category"))
    assert(fixed.columns.toSeq == Seq("poi_id", "category"))
    val e = intercept[IllegalArgumentException] {
      ValidatedSource.canonicalize(df, Seq("poi_id", "node_idx", "lon"))
    }
    assert(e.getMessage.contains("node_idx") && e.getMessage.contains("lon"))
  }

  test("coerceSentinel: unparseable and null become -1") {
    val df = Seq(("12", "3"), ("nope", null), (null, "7.9")).toDF("a", "b")
    val got = ValidatedSource.coerceSentinel(df, Seq("a", "b"))
      .as[(Long, Long)].collect().toSet
    assert(got == Set((12L, 3L), (-1L, -1L), (-1L, -1L)))
  }

  test("readPois end-to-end from a messy CSV (S7)") {
    val dir = Files.createTempDirectory("graft-pois").resolve("pois.csv").toString
    Seq("POI_ID,CATEGORY,Node_Idx,lon,lat,extra",
      "10,supermarket,3,18.5,54.3,x",
      "bad,school,nope,18.6,54.4,y")
      .toDF("value").coalesce(1).write.text(dir)
    // readAuto sniffs .csv via extension; path ends with .csv here
    val got = ValidatedSource.readPois(spark, dir)
      .as[(Long, String, Int, Double, Double)].collect().toSet
    assert(got == Set(
      (10L, "supermarket", 3, 18.5, 54.3),
      (-1L, "school", -1, 18.6, 54.4)))
  }
}
