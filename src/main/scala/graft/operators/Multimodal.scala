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
}
