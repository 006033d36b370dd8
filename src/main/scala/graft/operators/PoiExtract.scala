package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** POI tag extraction (SURVEY.md §2.1 S2/S3 + §2.6 U2).
  *
  * The reference walks TAG_MAP — 20 categories over (key,value) OSM tag
  * pairs (snap_poi_to_nodes.py:88-114) — issuing one tag-filtered extract
  * per category and concatenating the frames (:120-171). Two forms here:
  *
  *  - [[extractUnion]] — the reference's own shape: per-category filter +
  *    `unionByName` (U2). Semantically canonical; N passes over the source
  *    plan, so only appropriate when the elements table is small or cached.
  *  - [[extractJoin]] — the at-scale form: broadcast the 26-row tag
  *    dimension and inner-join once. One scan, one broadcast hash join, no
  *    shuffle; this is what a 100 TB elements table wants.
  *
  * Both produce identical rows (asserted in PoiExtractSpec).
  */
object PoiExtract {

  /** (category, key, value) — verbatim TAG_MAP constants from reference
    * snap_poi_to_nodes.py:88-114 (unavoidable domain taxonomy). */
  val TagMap: Seq[(String, String, String)] = Seq(
    ("supermarket", "shop", "supermarket"),
    ("convenience", "shop", "convenience"),
    ("bakery", "shop", "bakery"),
    ("pet_shop", "shop", "pet"),
    ("pharmacy", "amenity", "pharmacy"),
    ("clinic_hospital", "amenity", "clinic"),
    ("clinic_hospital", "amenity", "hospital"),
    ("parcel_locker", "amenity", "parcel_locker"),
    ("university", "amenity", "university"),
    ("university", "amenity", "college"),
    ("library", "amenity", "library"),
    ("nightclub", "amenity", "nightclub"),
    ("school", "amenity", "school"),
    ("kinder_childcare", "amenity", "kindergarten"),
    ("kinder_childcare", "amenity", "childcare"),
    ("veterinary", "amenity", "veterinary"),
    ("pub", "amenity", "pub"),
    ("fitness_centre", "leisure", "fitness_centre"),
    ("playground", "leisure", "playground"),
    ("park", "leisure", "park"),
    ("bus_stop", "highway", "bus_stop"),
    ("tram_stop", "railway", "tram_stop"),
    ("rail_station", "railway", "station"),
    ("rail_station", "railway", "halt"),
    ("rail_station", "public_transport", "station"),
    ("rail_station", "public_transport", "halt"))

  /** S3 analog: the ingest pre-filter predicate — keep only elements whose
    * (key,value) appears in TAG_MAP (reference osm_poi_filter_script.txt:1-23
    * runs the same reduction with `osmium tags-filter` before any parsing).
    * Pure `isin`-of-structs composition: pushes to the scan. */
  def tagPreFilter(elements: DataFrame): DataFrame = {
    val pred = TagMap
      .map { case (_, k, v) => col("key") === k && col("value") === v }
      .reduce(_ || _)
    elements.filter(pred)
  }

  /** U2 (reference shape): per-category filter + union-by-name. */
  def extractUnion(elements: DataFrame): DataFrame =
    TagMap.groupBy(_._1).toSeq.sortBy(_._1).map { case (cat, pairs) =>
      val pred = pairs
        .map { case (_, k, v) => col("key") === k && col("value") === v }
        .reduce(_ || _)
      elements.filter(pred).withColumn("category", lit(cat))
    }.reduce(_ unionByName _)

  /** At-scale form: one broadcast join against the tag dimension. */
  def extractJoin(elements: DataFrame): DataFrame = {
    val spark = elements.sparkSession
    import spark.implicits._
    val dim = TagMap.toDF("category", "key", "value")
    elements.join(broadcast(dim), Seq("key", "value"))
  }
}
