package graft.operators

import graft.SparkSpec

class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val assets = Seq(
    (1L, Array[Byte](0xFF.toByte, 0xD8.toByte, 1, 2, 3, 4, 5, 6)),
    (2L, Array[Byte](0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte, 9, 9)),
    (3L, "RIFFxxxxWAVE".getBytes("UTF-8")),
    (4L, Array[Byte](1, 2, 3)))
    .toDF("asset_id", "payload")

  test("extractFeatures: schema, format sniffing, deterministic features") {
    val got = MultimodalOps.extractFeatures(assets).collect()
      .map(m => m.asset_id -> m).toMap
    assert(got(1L).format == "jpeg" && got(2L).format == "png" &&
      got(3L).format == "wav" && got(4L).format == "bin")
    assert(got.values.forall(_.features.length == 8))
    assert(got(3L).n_bytes == 12L)
    // determinism: a second run yields identical features
    val again = MultimodalOps.extractFeatures(assets).collect()
      .map(m => m.asset_id -> m.features.toSeq).toMap
    assert(got.view.mapValues(_.features.toSeq).toMap == again)
  }

  test("sampleFrames emits nFrames rows per asset with feature vectors") {
    val got = MultimodalOps.sampleFrames(assets, nFrames = 3).collect()
    assert(got.length == 4 * 3)
    val frames = got.map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(frames == (for (a <- 1L to 4L; f <- 0 until 3) yield (a, f)).toSet)
  }
}
