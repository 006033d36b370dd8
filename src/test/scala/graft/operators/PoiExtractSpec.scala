package graft.operators

import graft.SparkSpec

class PoiExtractSpec extends SparkSpec {
  import spark.implicits._

  private lazy val elements = Seq(
    (1L, "shop", "supermarket", "Biedronka"),
    (2L, "shop", "shoes", "not-a-poi"),
    (3L, "amenity", "clinic", "clinic A"),
    (4L, "amenity", "hospital", "hospital B"),
    (5L, "railway", "station", "Gdansk Gl"),
    (6L, "public_transport", "station", "dworzec"),
    (7L, "landuse", "grass", "noise"))
    .toDF("elem_id", "key", "value", "name")

  test("tagPreFilter keeps exactly the TAG_MAP pairs") {
    val kept = PoiExtract.tagPreFilter(elements).select("elem_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L, 5L, 6L))
  }

  test("extractUnion assigns categories per TAG_MAP (multi-pair categories merge)") {
    val got = PoiExtract.extractUnion(elements)
      .select("elem_id", "category").as[(Long, String)].collect().toSet
    assert(got == Set(
      (1L, "supermarket"), (3L, "clinic_hospital"), (4L, "clinic_hospital"),
      (5L, "rail_station"), (6L, "rail_station")))
  }

  test("extractJoin (broadcast form) produces identical rows to extractUnion") {
    val a = PoiExtract.extractUnion(elements)
      .select("elem_id", "category", "key", "value", "name")
      .as[(Long, String, String, String, String)].collect().toSet
    val b = PoiExtract.extractJoin(elements)
      .select("elem_id", "category", "key", "value", "name")
      .as[(Long, String, String, String, String)].collect().toSet
    assert(a == b)
  }
}
