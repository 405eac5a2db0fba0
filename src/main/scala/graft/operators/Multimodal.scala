package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed partition-wise.
  *
  * The decode step is a STUB — the real image/audio codecs are not in this
  * container — but everything around it is the real Spark shape for the
  * operator at 100 TB: a `binary` payload column, `mapPartitions` over an
  * iterator (one codec init per partition, not per row), an explicit output
  * schema, and deterministic feature extraction so results are testable.
  * Swap [[FakeDecoder]] for a JNI/ffmpeg/imageio call and nothing else
  * changes.
  */
object Multimodal {

  /** Deterministic fake decoder: derives pseudo metadata (width, height,
    * duration) from the payload's md5. Stands in for a real codec. */
  object FakeDecoder {
    def md5Hex(bytes: Array[Byte]): String = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      d.map("%02x".format(_)).mkString
    }
    /** 60-bit int from the md5 prefix — same derivation as the SQL oracle. */
    def h60(hex: String): Long = java.lang.Long.parseLong(hex.substring(0, 15), 16)

    def decode(bytes: Array[Byte]): (Long, String, Long, Long, Long) = {
      val hex = md5Hex(bytes)
      val h = h60(hex)
      val width  = 64L + h % 1857L
      val height = 64L + (h / 7L) % 1017L
      val durMs  = 500L + (h / 13L) % 59500L
      (bytes.length.toLong, hex, width, height, durMs)
    }
  }

  /** Typed output row of the decode stage. */
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, checksum: String,
                                 width: Long, height: Long, duration_ms: Long)

  /** Attach a binary payload column (here: the UTF-8 text bytes stand in for
    * an image/audio blob). */
  def withBinaryPayload(df: DataFrame, srcCol: String): DataFrame =
    df.withColumn("payload", col(srcCol).cast("binary"))

  /** Partition-wise decode + feature extraction over the payload column.
    * Batch shape: iterator-in/iterator-out per partition, so a real decoder
    * initializes once per partition and streams rows. */
  def extractFeatures(df: DataFrame, idCol: String = "doc_id"): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init happens here in a real codec
        it.map { case (id, bytes) =>
          val (n, hex, w, h, d) = FakeDecoder.decode(bytes)
          MediaFeatures(id, n, hex, w, h, d)
        }
      }
  }

  /** One sampled video frame: position + a per-frame checksum standing in
    * for the decoded frame tensor. */
  final case class SampledFrame(doc_id: Long, frame_idx: Long, ts_ms: Long,
                                frame_checksum: String)

  /** Frame sampling over video payloads: decode metadata → frame count at
    * `fps` → emit every `everyK`-th frame. The per-frame decode is the stub
    * (checksum derived from payload md5 + index); the SHAPE is the real one —
    * iterator flatMap per partition (one demuxer init per partition, one
    * output row per sampled frame), output fan-out bounded by
    * duration·fps/everyK. */
  def sampleFrames(df: DataFrame, everyK: Int, fps: Double = 25.0,
                   idCol: String = "doc_id"): Dataset[SampledFrame] = {
    require(everyK >= 1, "sample cadence must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val (_, hex, _, _, durMs) = FakeDecoder.decode(bytes)
          val nFrames = math.max(1L, (durMs * fps / 1000.0).toLong)
          (0L until nFrames by everyK.toLong).map { i =>
            SampledFrame(id, i, (i * 1000.0 / fps).toLong,
              FakeDecoder.md5Hex((hex + ":" + i).getBytes("UTF-8")))
          }
        }
      }
  }

  /** Resize plan: target dimensions bounded by `maxDim` with aspect ratio
    * preserved — pure Column math over the decoded metadata (the pixel
    * resample itself belongs in the decode kernel; this is the part the
    * engine owns: computing per-row targets that the codec executes). */
  def withResizeTargets(features: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim.toDouble) / greatest(col("width"), col("height")))
    features
      .withColumn("target_width", floor(col("width") * scale).cast("long"))
      .withColumn("target_height", floor(col("height") * scale).cast("long"))
  }
}
