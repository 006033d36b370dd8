package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Extracted per-asset metadata + feature vector. */
case class MediaFeatures(asset_id: Long, format: String, width: Int, height: Int,
                         n_bytes: Long, features: Array[Float])

/** Multimodal column handling for the training-data pipeline: image/audio/
  * video travel as opaque `binary` columns with typed metadata, and the
  * decode / feature-extract step runs as a partition-local batch kernel.
  *
  * The Spark-side plumbing here is real — schema, partitioning, the
  * per-partition batch execution shape (`mapPartitions` over a typed
  * Dataset, the Scala analog of `mapInPandas` batches), and the feature
  * schema. Decoding is REAL for binary PPM ([[PpmDecoder]]: pure-JVM
  * header+pixel parsing, luma features, nearest-neighbor resize — no
  * codec library needed) and STUBBED only for formats that genuinely
  * require a native codec this container lacks (jpeg/png/wav →
  * [[StubDecoder]], deterministic fake output derived from the bytes).
  * Swap in a JNI decoder behind the same trait; nothing else changes.
  */
object MultimodalOps {

  /** Decoder contract: bytes in, (meta, features) out. Implementations must
    * be Serializable — they ship to executors. */
  trait MediaDecoder extends Serializable {
    def format(bytes: Array[Byte]): String
    def dims(bytes: Array[Byte]): (Int, Int)
    def features(bytes: Array[Byte], dim: Int): Array[Float]
  }

  /** STUB — deterministic fake decode (no codecs in this environment).
    * Format from magic-byte sniffing (that part is real); dims and features
    * are reproducible functions of the payload so tests can assert
    * end-to-end plumbing. */
  object StubDecoder extends MediaDecoder {
    def format(bytes: Array[Byte]): String =
      if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) "jpeg"
      else if (bytes.length >= 4 && bytes(0) == 0x89.toByte && bytes(1) == 'P') "png"
      else if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F') "wav"
      else "bin"
    def dims(bytes: Array[Byte]): (Int, Int) = {
      val n = bytes.length
      (64 + n % 192, 64 + (n / 7) % 192) // fake: derived from size, not pixels
    }
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      Array.tabulate(dim)(i => ((md(i % md.length) & 0xFF) - 128) / 128.0f)
    }
  }

  /** REAL decoder for binary PPM (P6) — the codec-free image format: pure
    * byte parsing, no native library. Header (`P6 <w> <h> <maxval>`, with
    * `#` comments) and RGB24 pixel data are decoded for real; features are
    * horizontal-band mean luma (Rec.601 weights) over actual pixels. For
    * payloads that are NOT P6 (jpeg/png/wav need native codecs this
    * container lacks) it falls back to [[StubDecoder]] — so the stub now
    * covers only the formats that genuinely require a codec, and the whole
    * decode→feature→resize path is exercised on real pixels in tests. */
  object PpmDecoder extends MediaDecoder {
    private[operators] def isP6(b: Array[Byte]): Boolean =
      b.length >= 2 && b(0) == 'P' && b(1) == '6'

    /** (width, height, maxval, pixelDataOffset); throws on truncation —
      * callers treat a malformed P6 like any corrupt row (fail loudly,
      * filter upstream). */
    private[operators] def header(b: Array[Byte]): (Int, Int, Int, Int) = {
      var i = 2
      val vals = new Array[Int](3)
      var v = 0
      while (v < 3) {
        // skip whitespace and '#'-to-EOL comments before each number
        var skipping = true
        while (skipping && i < b.length) {
          if (b(i).toChar.isWhitespace) i += 1
          else if (b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
          else skipping = false
        }
        require(i < b.length && b(i) >= '0' && b(i) <= '9', s"bad PPM header at $i")
        var x = 0
        while (i < b.length && b(i) >= '0' && b(i) <= '9') { x = x * 10 + (b(i) - '0'); i += 1 }
        vals(v) = x; v += 1
      }
      // exactly one whitespace byte separates maxval from pixels — verify
      // it IS whitespace: silently consuming a stray byte here would shift
      // the pixel frame and decode garbage without an error
      require(i < b.length && b(i).toChar.isWhitespace,
        s"bad PPM pixel-data separator at $i")
      i += 1
      require(vals(0) > 0 && vals(1) > 0, s"bad PPM dims ${vals(0)}x${vals(1)}")
      // 1..255 only: maxval>255 means 2-byte samples (unsupported here —
      // decoding them as 1-byte would silently produce garbage), maxval=0
      // is malformed and would make luma 0/0
      require(vals(2) >= 1 && vals(2) <= 255, s"unsupported PPM maxval ${vals(2)}")
      // long arithmetic: w*h*3 in Int wraps for adversarial headers
      // (65536x65536 -> 0), which would pass the check and then read
      // garbage in-bounds
      require(b.length.toLong >= i.toLong + 3L * vals(0) * vals(1),
        "truncated PPM pixel data")
      (vals(0), vals(1), vals(2), i)
    }

    def format(bytes: Array[Byte]): String =
      if (isP6(bytes)) "ppm" else StubDecoder.format(bytes)

    def dims(bytes: Array[Byte]): (Int, Int) =
      if (isP6(bytes)) { val (w, h, _, _) = header(bytes); (w, h) }
      else StubDecoder.dims(bytes)

    /** dim horizontal-band mean-luma features in [0,1] (Rec.601
      * 0.299/0.587/0.114), bands = consecutive row ranges. */
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      if (!isP6(bytes)) return StubDecoder.features(bytes, dim)
      val (w, h, maxval, off) = header(bytes)
      val out = new Array[Float](dim)
      var band = 0
      while (band < dim) {
        val y0 = band * h / dim; val y1 = math.max(y0 + 1, (band + 1) * h / dim)
        var sum = 0.0; var n = 0
        var y = y0
        while (y < math.min(y1, h)) {
          var x = 0
          while (x < w) {
            val p = off + (y * w + x) * 3
            sum += 0.299 * (bytes(p) & 0xFF) + 0.587 * (bytes(p + 1) & 0xFF) +
              0.114 * (bytes(p + 2) & 0xFF)
            n += 1; x += 1
          }
          y += 1
        }
        out(band) = if (n == 0) 0.0f else (sum / n / maxval).toFloat
        band += 1
      }
      out
    }

    /** Nearest-neighbor resize of a P6 payload → new P6 bytes (the brief's
      * `resize` op, on real pixels). */
    def resize(bytes: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
      require(outW > 0 && outH > 0, s"bad target dims ${outW}x$outH")
      val (w, h, maxval, off) = header(bytes)
      val head = s"P6\n$outW $outH\n$maxval\n".getBytes("US-ASCII")
      val out = new Array[Byte](head.length + outW * outH * 3)
      System.arraycopy(head, 0, out, 0, head.length)
      var y = 0
      while (y < outH) {
        val sy = y * h / outH
        var x = 0
        while (x < outW) {
          val sx = x * w / outW
          val s = off + (sy * w + sx) * 3
          val d = head.length + (y * outW + x) * 3
          out(d) = bytes(s); out(d + 1) = bytes(s + 1); out(d + 2) = bytes(s + 2)
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** Deterministic P6 generator for fixtures: an RGB gradient keyed by
    * `seed` (x-gradient red, y-gradient green, diagonal blue). */
  def gradientPpm(w: Int, h: Int, seed: Int): Array[Byte] = {
    val head = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](head.length + w * h * 3)
    System.arraycopy(head, 0, out, 0, head.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val d = head.length + (y * w + x) * 3
        out(d) = (if (w > 1) x * 255 / (w - 1) else 0).toByte
        out(d + 1) = (if (h > 1) y * 255 / (h - 1) else 0).toByte
        out(d + 2) = ((x + y + seed) % 256).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Image resize as a partition-local batch op over (asset_id, payload):
    * P6 payloads are resized on real pixels, everything else passes
    * through unchanged (a real deployment would swap in a codec decoder
    * behind the same shape). */
  def resizeImages(df: DataFrame, outW: Int, outH: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("asset_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          (id, if (PpmDecoder.isP6(bytes)) PpmDecoder.resize(bytes, outW, outH) else bytes)
        }
      }
      .toDF("asset_id", "payload")
  }

  /** Decode + feature-extract as a partition-local batch kernel. Input must
    * have (asset_id: long, payload: binary). One decoder instance per
    * partition, rows streamed through it — the batch shape a real codec
    * wants (amortized init, no per-row JNI churn). Output is a typed
    * Dataset, ready to join back or feed the ANN operators. */
  def extractFeatures(df: DataFrame, decoder: MediaDecoder = StubDecoder,
                      featureDim: Int = 8): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("asset_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (w, h) = decoder.dims(bytes)
          MediaFeatures(id, decoder.format(bytes), w, h, bytes.length.toLong,
            decoder.features(bytes, featureDim))
        }
      }
  }

  /** Frame sampling for "video" payloads: split the byte stream into
    * `nFrames` equal slices and feature-extract each — the partition-local
    * shape of real frame sampling (stub slicing stands in for ffmpeg). */
  def sampleFrames(df: DataFrame, nFrames: Int,
                   decoder: MediaDecoder = StubDecoder,
                   featureDim: Int = 8): DataFrame = {
    require(nFrames > 0, s"nFrames must be positive, got $nFrames")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("asset_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val step = math.max(1, bytes.length / nFrames)
          (0 until nFrames).iterator.map { f =>
            val from = f * step
            val slice = bytes.slice(from, math.min(from + step, bytes.length))
            (id, f, decoder.features(slice, featureDim))
          }
        }
      }
      .toDF("asset_id", "frame", "features")
  }
}
