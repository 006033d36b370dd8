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
    // truncated magic-only payloads: plumbing fixtures, so pin the STUB
    // decoder explicitly (the AutoDecoder default would — correctly —
    // refuse to decode 8 bytes of fake jpeg)
    val got = MultimodalOps.extractFeatures(assets, MultimodalOps.StubDecoder)
      .collect().map(m => m.asset_id -> m).toMap
    assert(got(1L).format == "jpeg" && got(2L).format == "png" &&
      got(3L).format == "wav" && got(4L).format == "bin")
    assert(got.values.forall(_.features.length == 8))
    assert(got(3L).n_bytes == 12L)
    // determinism: a second run yields identical features
    val again = MultimodalOps.extractFeatures(assets, MultimodalOps.StubDecoder)
      .collect().map(m => m.asset_id -> m.features.toSeq).toMap
    assert(got.view.mapValues(_.features.toSeq).toMap == again)
  }

  test("ImageIoDecoder: real PNG decode reproduces the generated pixel law") {
    import MultimodalOps.{ImageIoDecoder, gradientPng}
    val (w, h, seed) = (20, 12, 5)
    val png = gradientPng(w, h, seed)
    assert(ImageIoDecoder.format(png) == "png")
    assert(ImageIoDecoder.dims(png) == (w, h))
    // exact integer band sums straight from the pixel law — a fake decode
    // (md5 of bytes, size-derived dims) cannot reproduce these
    val want = new Array[Long](4)
    for (y <- 0 until h; x <- 0 until w) {
      val r = x * 255 / (w - 1); val g = y * 255 / (h - 1)
      val b = (x + y + seed) % 256
      want(y * 4 / h) += 299L * r + 587L * g + 114L * b
    }
    assert(ImageIoDecoder.lumaBandSums1000(png, 4).toSeq == want.toSeq)
  }

  test("ImageIoDecoder: PNG features agree with PpmDecoder on the same pixels") {
    import MultimodalOps._
    // h divisible by the band count -> both band schemes partition rows
    // identically; features are mean luma in [0,1] on both paths
    val (w, h, seed) = (16, 8, 2)
    val png = ImageIoDecoder.features(gradientPng(w, h, seed), 4)
    val ppm = PpmDecoder.features(gradientPpm(w, h, seed), 4)
    png.zip(ppm).foreach { case (a, b) => assert(math.abs(a - b) < 1e-4f) }
  }

  test("ImageIoDecoder: real WAV decode via javax.sound.sampled") {
    import MultimodalOps.{ImageIoDecoder, syntheticWav}
    val n = 1000
    val wav = syntheticWav(n, sampleRate = 8000, seed = 7)
    assert(ImageIoDecoder.format(wav) == "wav")
    assert(ImageIoDecoder.dims(wav) == (n, 1))
    val got = ImageIoDecoder.features(wav, 4)
    val want = (0 until 4).map { band =>
      val idx = (0 until n).filter(i => i.toLong * 4 / n == band)
      idx.map(i => math.abs((i * 10) % 8192 - 4096).toDouble).sum / idx.size / 32768.0
    }
    got.zip(want).foreach { case (a, b) => assert(math.abs(a - b) < 1e-6) }
  }

  test("extractFeatures with the AutoDecoder default decodes real payloads") {
    import MultimodalOps._
    val real = Seq(
      (10L, gradientPng(9, 6, 1)),
      (11L, syntheticWav(600, 8000, 4)),
      (12L, gradientPpm(5, 4, 0)),
      (13L, Array[Byte](1, 2, 3))) // no JDK codec -> stub fallback
      .toDF("asset_id", "payload")
    val got = extractFeatures(real).collect().map(m => m.asset_id -> m).toMap
    assert(got(10L).format == "png" && got(10L).width == 9 && got(10L).height == 6)
    assert(got(11L).format == "wav" && got(11L).width == 600 && got(11L).height == 1)
    assert(got(12L).format == "ppm" && got(12L).width == 5 && got(12L).height == 4)
    assert(got(13L).format == "bin")
    assert(got.values.forall(_.features.length == 8))
  }

  test("sampleFrames emits nFrames rows per asset with feature vectors") {
    val got = MultimodalOps.sampleFrames(assets, nFrames = 3).collect()
    assert(got.length == 4 * 3)
    val frames = got.map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(frames == (for (a <- 1L to 4L; f <- 0 until 3) yield (a, f)).toSet)
  }

  test("PpmDecoder: real header parse, real pixel luma features") {
    import MultimodalOps.PpmDecoder
    val img = MultimodalOps.gradientPpm(8, 6, seed = 0)
    assert(PpmDecoder.format(img) == "ppm")
    assert(PpmDecoder.dims(img) == (8, 6))
    // comment + extra whitespace in the header parse
    val commented = ("P6\n# a comment\n 8  6\n255\n".getBytes("US-ASCII") ++
      img.drop("P6\n8 6\n255\n".length))
    assert(PpmDecoder.dims(commented) == (8, 6))
    // hand-checked luma: uniform white image -> every band 1.0
    val white = {
      val head = "P6\n4 4\n255\n".getBytes("US-ASCII")
      head ++ Array.fill(4 * 4 * 3)(0xFF.toByte)
    }
    assert(PpmDecoder.features(white, 4).forall(f => math.abs(f - 1.0f) < 1e-6))
    // gradient: green channel grows with y, so band luma strictly increases
    val bands = PpmDecoder.features(img, 3)
    assert(bands(0) < bands(1) && bands(1) < bands(2), bands.toSeq.toString)
    // non-P6 payloads fall back to the stub
    assert(PpmDecoder.format("RIFFxxxxWAVE".getBytes("UTF-8")) == "wav")
  }

  test("PpmDecoder fails loudly on adversarial or unsupported headers") {
    import MultimodalOps.PpmDecoder
    // 65536x65536: w*h*3 wraps to 0 in Int — must still be rejected
    val overflow = "P6\n65536 65536\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3)
    intercept[IllegalArgumentException](PpmDecoder.dims(overflow))
    // 16-bit samples (maxval > 255) are not supported: decoding them as
    // 1-byte would silently produce garbage luma
    val deep = "P6\n2 2\n65535\n".getBytes("US-ASCII") ++ Array.fill(24)(0.toByte)
    intercept[IllegalArgumentException](PpmDecoder.dims(deep))
    // maxval 0 would make luma 0/0
    val zero = "P6\n2 2\n0\n".getBytes("US-ASCII") ++ Array.fill(12)(0.toByte)
    intercept[IllegalArgumentException](PpmDecoder.dims(zero))
    // truncated pixel data
    val short = "P6\n4 4\n255\n".getBytes("US-ASCII") ++ Array.fill(10)(7.toByte)
    intercept[IllegalArgumentException](PpmDecoder.dims(short))
    // non-whitespace byte where the single maxval/pixel separator belongs:
    // silently consuming it would shift the pixel frame
    val badSep = "P6\n2 2\n255X".getBytes("US-ASCII") ++ Array.fill(12)(0.toByte)
    intercept[IllegalArgumentException](PpmDecoder.dims(badSep))
  }

  test("PpmDecoder.resize: nearest-neighbor on real pixels") {
    import MultimodalOps.PpmDecoder
    val img = MultimodalOps.gradientPpm(8, 8, seed = 3)
    val half = PpmDecoder.resize(img, 4, 4)
    assert(PpmDecoder.dims(half) == (4, 4))
    // corner pixel (0,0) is preserved exactly by nearest-neighbor
    val (origOff, halfOff) = ("P6\n8 8\n255\n".length, "P6\n4 4\n255\n".length)
    assert(img(origOff) == half(halfOff) && img(origOff + 1) == half(halfOff + 1))
    // upscale back: still a valid image with the requested dims
    assert(PpmDecoder.dims(PpmDecoder.resize(half, 16, 2)) == (16, 2))
  }

  test("extractFeatures + resizeImages run the REAL decoder end-to-end on P6 rows") {
    val mixed = Seq(
      (10L, MultimodalOps.gradientPpm(6, 4, seed = 1)),
      (11L, MultimodalOps.gradientPpm(3, 3, seed = 2)),
      (12L, "RIFFxxxxWAVE".getBytes("UTF-8"))) // stub fallback row
      .toDF("asset_id", "payload")
    val feats = MultimodalOps.extractFeatures(mixed, MultimodalOps.PpmDecoder)
      .collect().map(m => m.asset_id -> m).toMap
    assert(feats(10L).format == "ppm" && feats(10L).width == 6 && feats(10L).height == 4)
    assert(feats(11L).format == "ppm" && feats(12L).format == "wav")
    val resized = MultimodalOps.resizeImages(mixed, 2, 2).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(MultimodalOps.PpmDecoder.dims(resized(10L)) == (2, 2))
    assert(resized(12L).sameElements("RIFFxxxxWAVE".getBytes("UTF-8"))) // pass-through
  }

  test("TIFF video container: lossless multi-frame round trip through the JDK codec") {
    val (n, w, h, seed) = (5, 7, 4, 3)
    val vid = MultimodalOps.syntheticTiffVideo(n, w, h, seed)
    assert(MultimodalOps.isTiff(vid))
    assert(MultimodalOps.ImageIoDecoder.format(vid) == "tiff")
    val frames = MultimodalOps.readFrames(vid)
    assert(frames.length == n)
    // every decoded pixel of every frame equals the generating law —
    // the decode is real and the container is lossless
    for (f <- 0 until n; y <- 0 until h; x <- 0 until w) {
      val want = (((x * 7 + f * 13) % 256) << 16) |
        (((y * 11 + f * 5) % 256) << 8) | ((x + y + f + seed) % 256)
      assert((frames(f).getRGB(x, y) & 0xFFFFFF) == want,
        s"frame $f pixel ($x,$y)")
    }
  }

  test("sampleFrames: REAL frame sampling from a TIFF container, stub for unknown bytes") {
    val vid = MultimodalOps.syntheticTiffVideo(8, 5, 4, seed = 2)
    val rows = MultimodalOps.sampleFrames(
      Seq((7L, vid), (8L, Array[Byte](1, 2, 3, 4, 5, 6))).toDF("asset_id", "payload"),
      nFrames = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2)))
    // TIFF row: 4 frames sampled at the stride law j*8/4 = 0,2,4,6
    val tiffFrames = rows.filter(_._1 == 7L).map(_._2).sorted
    assert(tiffFrames.sameElements(Array(0, 2, 4, 6)))
    // sampled features come from real pixels: recompute frame 2's bands
    val f2 = MultimodalOps.readFrames(vid)(2)
    val want = MultimodalOps.bandLuma(f2, 8).toSeq
    assert(rows.find(r => r._1 == 7L && r._2 == 2).get._3 == want)
    // non-container payload keeps the byte-slice stand-in (4 slices)
    assert(rows.count(_._1 == 8L) == 4)
  }

  test("videoFrameGate: sampled-frame luma sums equal the pixel law exactly") {
    val got = MultimodalOps.videoFrameGate(Seq(3L, 10L).toDS())
      .collect().map(r => (r.asset_id, r.frame_idx) -> r).toMap
    for (id <- Seq(3L, 10L)) {
      val n = 6 + (id % 5).toInt; val w = 12 + (id % 5).toInt
      val h = 12 + (id % 3).toInt; val seed = (id % 9).toInt
      for (j <- 0 until 4) {
        val fi = j * n / 4
        var sum = 0L
        for (y <- 0 until h; x <- 0 until w)
          sum += 299L * ((x * 7 + fi * 13) % 256) +
            587L * ((y * 11 + fi * 5) % 256) + 114L * ((x + y + fi + seed) % 256)
        val row = got((id, fi))
        assert(row.n_frames == n && row.width == w && row.height == h)
        assert(row.luma1000 == sum, s"asset $id frame $fi")
      }
    }
  }
}
