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
  * schema — while the DECODER ITSELF IS A STUB: this container has no
  * image/audio codecs, so [[StubDecoder]] produces deterministic fake
  * output derived from the bytes. Swap in a real decoder (JNI to
  * libjpeg/ffmpeg or a JVM codec) behind the same trait; nothing else
  * changes.
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
