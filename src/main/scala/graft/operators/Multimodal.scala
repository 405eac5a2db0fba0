package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed partition-wise.
  *
  * The decode tier is two-level: [[HeaderDecoder]] parses REAL container
  * headers across all three modalities (images: PNG IHDR / JPEG SOFn /
  * GIF logical screen; audio: WAV RIFF chunks; video: MP4 ISO-BMFF
  * mvhd/tkhd — pure-JVM byte parsing, no codec library), and
  * [[FakeDecoder]] stands in for the full pixel/sample decode that would
  * need ffmpeg/imageio (not in this container). Everything around them is the real Spark shape for the
  * operator at 100 TB: a `binary` payload column, `mapPartitions` over an
  * iterator (one codec init per partition, not per row), an explicit output
  * schema, and deterministic feature extraction so results are testable.
  * Swap [[FakeDecoder]] for a JNI/ffmpeg/imageio call and nothing else
  * changes.
  */
object Multimodal {

  /** Real container-header parsing for the three classic image formats —
    * exactly the bytes a 100 TB curation pass needs for resize planning and
    * aspect filtering WITHOUT decoding pixels (header sniff = O(first kB),
    * full decode = O(megapixels)).
    *
    *  - PNG (RFC 2083 §3 / ISO 15948 §5.2): 8-byte signature, then the IHDR
    *    chunk is REQUIRED first — width/height are big-endian u32 at
    *    offsets 16/20.
    *  - JPEG (ITU-T T.81 §B.2): marker stream after SOI; walk segments by
    *    their 2-byte big-endian lengths until a start-of-frame marker
    *    (SOF0–SOF15 minus DHT/JPG/DAC = C4/C8/CC); the frame header carries
    *    precision u8, then height and width as big-endian u16.
    *  - GIF (87a/89a spec): 6-byte version tag, then the logical-screen
    *    width/height as LITTLE-endian u16 at offsets 6/8.
    */
  object HeaderDecoder {
    private def beU32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    private def beU16(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 8) | (b(o + 1) & 0xffL)
    private def leU16(b: Array[Byte], o: Int): Long =
      ((b(o + 1) & 0xffL) << 8) | (b(o) & 0xffL)
    private def leU32(b: Array[Byte], o: Int): Long =
      ((b(o + 3) & 0xffL) << 24) | ((b(o + 2) & 0xffL) << 16) |
        ((b(o + 1) & 0xffL) << 8) | (b(o) & 0xffL)
    private def beU64(b: Array[Byte], o: Int): Long =
      (beU32(b, o) << 32) | beU32(b, o + 4)

    private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)

    /** (format, width, height) when the payload starts with a known image
      * container; None otherwise (→ caller falls back to [[FakeDecoder]]). */
    def decode(b: Array[Byte]): Option[(String, Long, Long)] = {
      if (b.length >= 24 && b.startsWith(PngSig) &&
          b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
        Some(("png", beU32(b, 16), beU32(b, 20)))
      else if (b.length >= 10 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
        jpegSof(b)
      else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
          b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
        Some(("gif", leU16(b, 6), leU16(b, 8)))
      else None
    }

    /** WAV (RIFF/WAVE, the Microsoft/IBM 1991 multimedia spec): 'RIFF'
      * u32size 'WAVE', then a little-endian chunk walk — 'fmt ' carries
      * channels u16 / sampleRate u32 / byteRate u32; the 'data' chunk's
      * SIZE field alone fixes the duration (dataSize / byteRate), so the
      * sniff reads ~44 header bytes and never touches sample data —
      * exactly the audio analogue of the image header decode. Returns
      * (channels, sample_rate_hz, duration_ms); None on any non-WAV or
      * truncated/desynced header (→ FakeDecoder fallback). */
    def decodeWav(b: Array[Byte]): Option[(Long, Long, Long)] = {
      if (b.length < 12 ||
          !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') ||
          !(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'))
        return None
      var i = 12
      var channels = -1L; var rate = -1L; var byteRate = -1L; var dataSize = -1L
      while (i + 8 <= b.length && (channels < 0 || dataSize < 0)) {
        val id = new String(b, i, 4, "US-ASCII")
        val size = leU32(b, i + 4)
        // a u32 size above Int.MaxValue wraps negative in toInt and walks
        // the cursor BACKWARDS — adversarial bytes must desync, not loop
        if (size > Int.MaxValue - 16) return None
        if (id == "fmt " && i + 24 <= b.length) {
          channels = leU16(b, i + 10)
          rate = leU32(b, i + 12)
          byteRate = leU32(b, i + 16)
        }
        if (id == "data") dataSize = size
        // chunks are word-aligned; the data chunk's bytes need not be
        // present in the sniffed prefix — the walk steps past the END
        i += 8 + size.toInt + (size.toInt & 1)
      }
      if (channels > 0 && rate > 0 && byteRate > 0 && dataSize >= 0)
        Some((channels, rate, dataSize * 1000L / byteRate))
      else None
    }

    /** MP4 / ISO BMFF (ISO 14496-12 §8.2-8.3): big-endian
      * [size u32][type 4cc] box walk to `moov`, then its children —
      * `mvhd` carries timescale + movie duration (v0 u32s / v1 u64s), the
      * first `trak`'s `tkhd` the 16.16 fixed-point display width/height.
      * Returns (width, height, duration_ms). Only faststart layouts (moov
      * in the sniffed prefix) resolve — a trailing-moov file falls back,
      * exactly what a first-kB header sniff can promise. */
    def decodeMp4(b: Array[Byte]): Option[(Long, Long, Long)] = {
      if (b.length < 16 ||
          !(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p')) return None
      var i = 0
      var moovStart = -1; var moovEnd = -1
      while (i + 8 <= b.length && moovStart < 0) {
        val size = beU32(b, i)
        if (size < 8 || size > Int.MaxValue) return None
        if (b(i + 4) == 'm' && b(i + 5) == 'o' && b(i + 6) == 'o' && b(i + 7) == 'v') {
          moovStart = i + 8
          moovEnd = math.min(b.length.toLong, i + size).toInt
        }
        i += size.toInt
      }
      if (moovStart < 0) return None
      var ts = -1L; var dur = -1L; var w = -1L; var h = -1L
      var j = moovStart
      while (j + 8 <= moovEnd) {
        val size = beU32(b, j)
        if (size < 8 || size > Int.MaxValue) return None
        val t = new String(b, j + 4, 4, "US-ASCII")
        if (t == "mvhd") {
          val v = b(j + 8) & 0xff
          if (v == 0 && j + 28 <= moovEnd) {
            ts = beU32(b, j + 20); dur = beU32(b, j + 24)
          } else if (v == 1 && j + 40 <= moovEnd) {
            ts = beU32(b, j + 28); dur = beU64(b, j + 32)
          }
        }
        if (t == "trak" && w < 0) {
          val trakEnd = math.min(moovEnd.toLong, j + size).toInt
          var k = j + 8
          while (k + 8 <= trakEnd && w < 0) {
            val s2 = beU32(b, k)
            if (s2 < 8 || s2 > Int.MaxValue) return None
            if (b(k + 4) == 't' && b(k + 5) == 'k' && b(k + 6) == 'h' && b(k + 7) == 'd') {
              val off = if ((b(k + 8) & 0xff) == 1) k + 96 else k + 84
              if (off + 8 <= trakEnd) {
                w = beU32(b, off) >> 16; h = beU32(b, off + 4) >> 16
              }
            }
            k += s2.toInt
          }
        }
        j += size.toInt
      }
      if (ts > 0 && dur >= 0)
        Some((math.max(w, 0L), math.max(h, 0L), dur * 1000L / ts))
      else None
    }

    private def jpegSof(b: Array[Byte]): Option[(String, Long, Long)] = {
      var i = 2
      while (i + 9 < b.length) {
        if ((b(i) & 0xff) != 0xff) return None // desynced marker stream
        val marker = b(i + 1) & 0xff
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) i += 2 // standalone
        else if (marker == 0xd9 || marker == 0xda) return None // EOS before SOF
        else {
          val len = beU16(b, i + 2).toInt
          if (len < 2) return None
          if (marker >= 0xc0 && marker <= 0xcf &&
              marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
            if (i + 9 >= b.length) return None
            return Some(("jpeg", beU16(b, i + 7), beU16(b, i + 5)))
          }
          i += 2 + len
        }
      }
      None
    }

    // ---- deterministic synthetic payloads (spec fixtures + the declared
    // doc_multimodal_real query): REAL headers with planted dimensions, so
    // the parser is exercised on genuine byte layouts end to end.

    def pngPayload(w: Long, h: Long): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(33)
      out.put(PngSig).putInt(13).put("IHDR".getBytes("US-ASCII"))
        .putInt(w.toInt).putInt(h.toInt)
        .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
        .putInt(0) // CRC not validated by the header sniff
      out.array()
    }

    def jpegPayload(w: Long, h: Long): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(33)
      out.put(0xff.toByte).put(0xd8.toByte)                        // SOI
      out.put(0xff.toByte).put(0xe0.toByte).putShort(16)           // APP0
        .put("JFIF".getBytes("US-ASCII")).put(0.toByte)
        .put(1.toByte).put(1.toByte).put(0.toByte)
        .putShort(1).putShort(1).put(0.toByte).put(0.toByte)
      out.put(0xff.toByte).put(0xc0.toByte).putShort(11)           // SOF0
        .put(8.toByte).putShort(h.toShort).putShort(w.toShort)
        .put(1.toByte).put(1.toByte).put(0x11.toByte).put(0.toByte)
      out.array()
    }

    def gifPayload(w: Long, h: Long): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(13)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("GIF89a".getBytes("US-ASCII"))
        .putShort(w.toShort).putShort(h.toShort)
        .put(0.toByte).put(0.toByte).put(0.toByte)
      out.array()
    }

    /** Faststart MP4 skeleton (ftyp + moov[mvhd v0 + trak[tkhd v0]], no
      * mdat — the sniff only reads the movie/track headers) with planted
      * display dimensions and (timescale, durationUnits). */
    def mp4Payload(w: Long, h: Long, timescale: Long, durationUnits: Long): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(20 + 216) // big-endian default
      def matrix(): Unit = {
        buf.putInt(0x00010000).putInt(0).putInt(0)
        buf.putInt(0).putInt(0x00010000).putInt(0)
        buf.putInt(0).putInt(0).putInt(0x40000000)
      }
      buf.putInt(20).put("ftyp".getBytes("US-ASCII"))
        .put("isom".getBytes("US-ASCII")).putInt(0)
        .put("isom".getBytes("US-ASCII"))
      buf.putInt(216).put("moov".getBytes("US-ASCII"))
      buf.putInt(108).put("mvhd".getBytes("US-ASCII"))
        .putInt(0)                                   // version 0 + flags
        .putInt(0).putInt(0)                         // creation, modification
        .putInt(timescale.toInt).putInt(durationUnits.toInt)
        .putInt(0x00010000).putShort(0x0100.toShort) // rate 1.0, volume 1.0
        .putShort(0).putLong(0L)                     // reserved
      matrix()
      buf.putInt(0).putInt(0).putInt(0)              // pre_defined 24 bytes
        .putInt(0).putInt(0).putInt(0)
        .putInt(2)                                   // next_track_ID
      buf.putInt(100).put("trak".getBytes("US-ASCII"))
      buf.putInt(92).put("tkhd".getBytes("US-ASCII"))
        .putInt(7)                                   // v0, enabled flags
        .putInt(0).putInt(0)                         // creation, modification
        .putInt(1).putInt(0)                         // track_ID, reserved
        .putInt(durationUnits.toInt).putLong(0L)     // duration, reserved
        .putShort(0).putShort(0)                     // layer, alternate_group
        .putShort(0).putShort(0)                     // volume, reserved
      matrix()
      buf.putInt((w << 16).toInt).putInt((h << 16).toInt)
      buf.array()
    }

    /** 16-bit PCM WAV header (44 bytes, no sample data — the sniff only
      * reads sizes) with a planted (channels, sampleRate, nSamples). */
    def wavPayload(channels: Long, sampleRate: Long, nSamples: Long): Array[Byte] = {
      val blockAlign = channels * 2
      val byteRate = sampleRate * blockAlign
      val dataSize = nSamples * blockAlign
      val out = java.nio.ByteBuffer.allocate(44)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt((36 + dataSize).toInt)
        .put("WAVE".getBytes("US-ASCII"))
      out.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(channels.toShort).putInt(sampleRate.toInt)
        .putInt(byteRate.toInt).putShort(blockAlign.toShort).putShort(16)
      out.put("data".getBytes("US-ASCII")).putInt(dataSize.toInt)
      out.array()
    }
  }

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
    * initializes once per partition and streams rows. Payloads carrying a
    * recognized image container get REAL header dimensions
    * ([[HeaderDecoder]]; duration 0 — stills have none); faststart MP4
    * gets REAL display dims + movie duration (mvhd/tkhd); WAV audio gets
    * its REAL duration from the data-chunk size (width/height 0); anything
    * else falls back to the deterministic [[FakeDecoder]] stub. */
  def extractFeatures(df: DataFrame, idCol: String = "doc_id"): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init happens here in a real codec
        it.map { case (id, bytes) =>
          val real = HeaderDecoder.decode(bytes)
            .map { case (_, w, h) => (w, h, 0L) }
            .orElse(HeaderDecoder.decodeMp4(bytes))
            .orElse(HeaderDecoder.decodeWav(bytes)
              .map { case (_, _, durMs) => (0L, 0L, durMs) })
          real match {
            case Some((w, h, durMs)) =>
              MediaFeatures(id, bytes.length.toLong, FakeDecoder.md5Hex(bytes),
                w, h, durMs)
            case None =>
              val (n, hex, w, h, d) = FakeDecoder.decode(bytes)
              MediaFeatures(id, n, hex, w, h, d)
          }
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
          val hex = FakeDecoder.md5Hex(bytes)
          // a recognized faststart MP4 samples its REAL movie duration
          val durMs = HeaderDecoder.decodeMp4(bytes).map(_._3)
            .getOrElse(FakeDecoder.decode(bytes)._5)
          val nFrames = math.max(1L, (durMs * fps / 1000.0).toLong)
          (0L until nFrames by everyK.toLong).map { i =>
            SampledFrame(id, i, (i * 1000.0 / fps).toLong,
              FakeDecoder.md5Hex((hex + ":" + i).getBytes("UTF-8")))
          }
        }
      }
  }

  /** Deterministic planted grayscale images for the pixel-level tier's
    * fixtures: pixel (x, y) of source id `src` is the md5-prefix long of
    * "src_x_y" mod 256 (the engine-portable hash recipe every oracle
    * replays), written into a real PNG through `javax.imageio` — PNG is
    * lossless, so a decoder recovers the planted bytes exactly and a SQL
    * oracle can recompute any pure function of them. */
  object PlantedImages {
    def gray(src: Long, x: Int, y: Int): Int =
      (FakeDecoder.h60(FakeDecoder.md5Hex(
        s"${src}_${x}_${y}".getBytes("UTF-8"))) % 256L).toInt

    /** PNG bytes of the w×h planted image for `src`; with `brighten`, the
      * top-left 2×2 block is lifted by +64 (saturating) — a one-grid-cell
      * perturbation that moves the [[imageDHash]] by ≤ 1 bit, the planted
      * near-duplicate. */
    def pngBytes(src: Long, w: Int, h: Int, brighten: Boolean = false): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var g = gray(src, x, y)
          if (brighten && x < 2 && y < 2) g = math.min(255, g + 64)
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      // explicit MEMORY-backed output stream: `ImageIO.write(img, fmt,
      // OutputStream)` would route through the global stream-cache
      // setting, whose default is a temp FILE per encode (10⁴ temp-file
      // round trips per fixture pass — the round-12 doc_image_phash wall
      // regression's stall signature). Scoping the choice per stream
      // avoids flipping JVM-global ImageIO state from library code.
      val out = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("png").next()
      try {
        writer.setOutput(ios)
        writer.write(img)
      } finally {
        writer.dispose()
        ios.close()
      }
      out.toByteArray
    }
  }

  /** 64-bit difference hash (dHash) per image — the pixel-level signal the
    * header tier can't give: image NEAR-duplicates (rescale, recompress,
    * small edits) keep a small Hamming distance while exact byte dedup
    * sees unrelated blobs. Decode is REAL (`javax.imageio`: PNG/JPEG/GIF,
    * pure JVM, one reader per partition via mapPartitions); every step
    * after decode is deterministic INTEGER arithmetic so a planted-pixel
    * oracle can replay the hash value exactly:
    *
    *  - grayscale g = (r + g + b) / 3 (integer division);
    *  - box-average downscale to a 9×8 grid: grid cell (X, Y) averages the
    *    source rect [X·w/9, (X+1)·w/9) × [Y·h/8, (Y+1)·h/8) (floor
    *    bounds, integer-division mean) — a self-owned resample, NOT
    *    `Graphics2D.drawImage`, whose interpolation is implementation-
    *    defined and would make the hash unreplayable;
    *  - bit Y·8+X set iff grid(X+1, Y) > grid(X, Y) (brightness gradient
    *    sign — invariant to global brightness/contrast shifts).
    *
    * Output `(doc, img_w, img_h, dh_hi, dh_lo)` with the hash split into
    * two non-negative 32-bit words (bits 63..32 / 31..0) so both engines
    * compare plain BIGINTs with no sign edge. Undecodable payloads yield
    * null words (kept, not dropped — a curation pass wants to SEE them).
    * Hamming pairs ride the existing banded machinery
    * ([[graft.operators.Dedup.hammingPairs64]]). */
  def imageDHash(df: DataFrame, idCol: String = "doc_id",
                 payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // one ImageReader per FORMAT per partition, keyed by its
        // ImageReaderSpi: `ImageIO.getImageReaders(..).next()` CONSTRUCTS
        // a fresh reader via the SPI registry walk every call, so a cache
        // keyed after that lookup saves nothing (round-13 ADVICE) — the
        // cached-SPI `canDecodeInput` probe below is a header sniff that
        // restores the stream position (its documented contract), so a
        // one-format corpus partition pays the registry walk and reader
        // construction exactly once. The stream is explicitly
        // MEMORY-backed (the ImageIO default routes in-memory bytes
        // through a temp FILE per image — the round-12 decode-stall
        // regression) and closed in `finally` so a corrupt payload can't
        // leak it; a reader aborted mid-decode is DROPPED from the cache
        // (an exception can leave it in a state that fails on subsequent
        // valid images). Cached readers hold native/heap decode buffers,
        // so they are disposed when the TASK completes — normal
        // exhaustion included, not just the error path.
        // LinkedHashMap: the probe below short-circuits on the first SPI
        // claiming the bytes, so iteration order must be deterministic —
        // insertion order mirrors first-seen ImageIO registry order,
        // keeping the chosen reader oracle-replayable run to run (a plain
        // HashMap iterates in arbitrary order and could pick a different
        // reader when two cached SPIs claim the same payload)
        val readers = scala.collection.mutable.LinkedHashMap
          .empty[javax.imageio.spi.ImageReaderSpi, javax.imageio.ImageReader]
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            readers.valuesIterator.foreach(r => scala.util.Try(r.dispose()))
            readers.clear()
          })
        def decode(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          var usedSpi: javax.imageio.spi.ImageReaderSpi = null
          var uncached: javax.imageio.ImageReader = null
          try {
            // each cached probe rides its own Try: a throwing
            // canDecodeInput must fall through to the next SPI and then
            // the registry lookup, not abort the decode of a payload some
            // other reader handles (previously it landed in the outer
            // catch and silently dropped the image). A probe that THROWS
            // breaks its own mark/reset contract mid-read, leaving the
            // stream past the header — reseek to 0 so the next SPI and
            // the registry fallback sniff from the real start, not a
            // corrupted offset (ADVICE r15)
            val readerOpt = readers.keysIterator.find(spi =>
              scala.util.Try(spi.canDecodeInput(iis)) match {
                case scala.util.Success(b) => b
                case scala.util.Failure(_) => iis.seek(0L); false
              }) match {
              case Some(spi) =>
                usedSpi = spi
                Some(readers(spi))
              case None =>
                val found = javax.imageio.ImageIO.getImageReaders(iis)
                if (!found.hasNext) None
                else {
                  val r = found.next()
                  val spi = r.getOriginatingProvider
                  if (spi != null) { usedSpi = spi; readers.update(spi, r) }
                  else uncached = r // SPI-less reader: use once, dispose below
                  Some(r)
                }
            }
            readerOpt.flatMap { reader =>
              reader.setInput(iis, true, true)
              Option(reader.read(0))
            }
          } catch {
            case _: Exception =>
              if (usedSpi != null)
                readers.remove(usedSpi).foreach(r => scala.util.Try(r.dispose()))
              None
          } finally {
            if (uncached != null) scala.util.Try(uncached.dispose())
            scala.util.Try(iis.close())
          }
        }
        it.map { case (id, bytes) =>
          decode(bytes) match {
            case Some(im) if im.getWidth >= 9 && im.getHeight >= 8 =>
              val w = im.getWidth; val h = im.getHeight
              val grid = Array.ofDim[Int](8, 9)
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 9) {
                  val x0 = xx * w / 9; val x1 = (xx + 1) * w / 9
                  val y0 = yy * h / 8; val y1 = (yy + 1) * h / 8
                  var sum = 0L; var n = 0L
                  var y = y0
                  while (y < y1) {
                    var x = x0
                    while (x < x1) {
                      val rgb = im.getRGB(x, y)
                      sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                      n += 3; x += 1
                    }
                    y += 1
                  }
                  grid(yy)(xx) = (sum / n).toInt
                  xx += 1
                }
                yy += 1
              }
              var hash = 0L
              var b = 0
              while (b < 64) {
                val gy = b / 8; val gx = b % 8
                if (grid(gy)(gx + 1) > grid(gy)(gx)) hash |= (1L << b)
                b += 1
              }
              (id, w.toLong, h.toLong,
                Some(hash >>> 32), Some(hash & 0xffffffffL))
            case _ => (id, 0L, 0L, None: Option[Long], None: Option[Long])
          }
        }
      }.toDF(idCol, "img_w", "img_h", "dh_hi", "dh_lo")
  }

  /** Deterministic planted PCM audio for the sample-level tier's fixtures —
    * the audio analogue of [[PlantedImages]]: sample i of source id `src` is
    * the md5-prefix long of "src_a_i" mapped onto [-16384, 16383] (the
    * engine-portable hash recipe every oracle replays), written as a real
    * 16-bit mono RIFF/WAVE file. PCM is lossless, so a decoder recovers the
    * planted samples exactly and a SQL oracle can recompute any pure
    * function of them. `gain` multiplies samples exactly (2× stays inside
    * 16-bit for the planted range: [-32768, 32766]) — the planted
    * "same recording, different level" near-duplicate, which byte-level
    * dedup misses and the gain-invariant envelope fingerprint catches. */
  object PlantedAudio {
    def sample(src: Long, i: Int): Int =
      (FakeDecoder.h60(FakeDecoder.md5Hex(
        s"${src}_a_${i}".getBytes("UTF-8"))) % 32768L).toInt - 16384

    /** Complete mono 16-bit PCM WAV (8 kHz) with `n` planted samples. */
    def wavBytes(src: Long, n: Int, gain: Int = 1): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(44 + n * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put(HeaderDecoder.wavPayload(1, 8000, n))
      var i = 0
      while (i < n) {
        out.putShort((sample(src, i) * gain).toShort)
        i += 1
      }
      out.array()
    }
  }

  /** PCM sample extraction behind the WAV header sniff: returns
    * (channels, sampleRate, channel-0 samples) for 16-bit integer PCM
    * payloads whose data chunk is fully present; None otherwise (compressed
    * codecs and truncated sniffs fall back to the header-only tier). Pure
    * JVM byte parsing — the little-endian chunk walk of
    * [[HeaderDecoder.decodeWav]] plus the sample read. */
  def decodeWavPcm(b: Array[Byte]): Option[(Int, Int, Array[Short])] = {
    if (b.length < 12 ||
        !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') ||
        !(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'))
      return None
    def leU16(o: Int): Int = ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
    def leU32(o: Int): Long =
      ((b(o + 3) & 0xffL) << 24) | ((b(o + 2) & 0xffL) << 16) |
        ((b(o + 1) & 0xffL) << 8) | (b(o) & 0xffL)
    var i = 12
    var fmt = -1; var channels = -1; var rate = -1; var bits = -1
    var dataOff = -1; var dataLen = -1L
    while (i + 8 <= b.length && (fmt < 0 || dataOff < 0)) {
      val id = new String(b, i, 4, "US-ASCII")
      val size = leU32(i + 4)
      // same negative-wrap guard as decodeWav: adversarial u32 sizes must
      // fall back to the header-only tier, not walk the cursor backwards
      if (size > Int.MaxValue - 16) return None
      if (id == "fmt " && i + 24 <= b.length) {
        fmt = leU16(i + 8); channels = leU16(i + 10)
        rate = leU32(i + 12).toInt; bits = leU16(i + 22)
      }
      if (id == "data") { dataOff = i + 8; dataLen = size }
      i += 8 + size.toInt + (size.toInt & 1)
    }
    if (fmt != 1 || bits != 16 || channels < 1 || rate <= 0 ||
        dataOff < 0 || dataOff + dataLen > b.length) return None
    val frames = (dataLen / (2L * channels)).toInt
    val samples = new Array[Short](frames)
    var f = 0
    while (f < frames) {
      val o = dataOff + f * 2 * channels // channel 0 of each frame
      samples(f) = (((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)).toShort
      f += 1
    }
    Some((channels, rate, samples))
  }

  /** Sample-level audio features + a 64-bit energy-envelope fingerprint —
    * the audio signal the header tier can't give (an audio NEAR-duplicate —
    * re-level, re-encode — keeps a small Hamming distance while exact byte
    * dedup sees unrelated blobs). Decode is REAL ([[decodeWavPcm]]: 16-bit
    * PCM, pure JVM, iterator per partition); every post-decode step is
    * deterministic INTEGER arithmetic so a planted-sample oracle replays
    * the values exactly:
    *
    *  - `sum_sq` = Σ s² and `zero_cross` = #{i : sign(sᵢ) ≠ sign(sᵢ₋₁)}
    *    (the classic frame-level energy / noisiness pair, exact integers);
    *  - envelope fingerprint: 65 frames, frame f covering samples
    *    [f·n/65, (f+1)·n/65) (floor bounds — the [[imageDHash]] box rule in
    *    one dimension), frame energy Σ|s|; bit f set iff e(f+1) > e(f).
    *    The gradient SIGN is invariant under exact gain scaling (2·a > 2·b
    *    ⟺ a > b), so a re-leveled copy fingerprints identically while its
    *    checksum and sum_sq differ.
    *
    * Output `(doc, sample_rate, n_samples, duration_ms, sum_sq, zero_cross,
    * fp_hi, fp_lo)`, hash split into non-negative 32-bit words like the
    * dHash. Non-PCM payloads yield null metrics (kept, not dropped);
    * fingerprints need n ≥ 65. Hamming pairs ride
    * [[graft.operators.Dedup.hammingPairs64]]. */
  def audioFeatures(df: DataFrame, idCol: String = "doc_id",
                    payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // same defensive posture as imageDHash: a malformed payload
          // yields a null-metrics row, never a job-killing exception
          val decoded =
            try decodeWavPcm(bytes) catch { case _: Exception => None }
          decoded match {
            case Some((_, rate, s)) =>
              val n = s.length
              var sumSq = 0L; var zc = 0L
              var i = 0
              while (i < n) {
                val v = s(i).toLong
                sumSq += v * v
                if (i > 0 && ((v < 0) != (s(i - 1) < 0))) zc += 1
                i += 1
              }
              val fp: Option[Long] = if (n >= 65) {
                val e = new Array[Long](65)
                var f = 0
                while (f < 65) {
                  var j = f * n / 65; val end = (f + 1) * n / 65
                  var acc = 0L
                  while (j < end) { acc += math.abs(s(j).toLong); j += 1 }
                  e(f) = acc; f += 1
                }
                var hash = 0L; var b = 0
                while (b < 64) {
                  if (e(b + 1) > e(b)) hash |= (1L << b)
                  b += 1
                }
                Some(hash)
              } else None
              val durMs = n.toLong * 1000L / rate
              (id, Some(rate.toLong), Some(n.toLong), Some(durMs),
                Some(sumSq), Some(zc), fp.map(_ >>> 32), fp.map(_ & 0xffffffffL))
            case None =>
              (id, None: Option[Long], None: Option[Long], None: Option[Long],
                None: Option[Long], None: Option[Long],
                None: Option[Long], None: Option[Long])
          }
        }
      }.toDF(idCol, "sample_rate", "n_samples", "duration_ms",
        "sum_sq", "zero_cross", "fp_hi", "fp_lo")
  }

  /** Deterministic planted raw-frame "video" for the keyframe tier's
    * fixtures — the ISO-BMFF analogue of [[PlantedImages]]/[[PlantedAudio]]:
    * a REAL faststart MP4 box layout (ftyp + moov[mvhd + trak[tkhd +
    * mdia[minf[stbl[stss + stsz + stco]]]]] + mdat) whose sample tables
    * are genuine and whose mdat carries UNCOMPRESSED 8-bit grayscale
    * frames, pixel (x, y) of frame f of source id `src` being the
    * md5-prefix long of "src_v_f_x_y" mod 256 (the engine-portable hash
    * recipe every oracle replays). Raw frames are lossless, so the
    * keyframe extractor recovers the planted bytes exactly and a SQL
    * oracle can recompute any pure function of them. Keyframes are
    * planted at every SECOND sample (stss = 1, 3, 5, …); `brighten`
    * lifts frame 0's top-left 2×2 block by +64 saturating — the planted
    * ≤1-bit keyframe near-duplicate, exactly the [[PlantedImages]]
    * perturbation. */
  object PlantedVideo {
    def gray(src: Long, f: Int, x: Int, y: Int): Int =
      (FakeDecoder.h60(FakeDecoder.md5Hex(
        s"${src}_v_${f}_${x}_${y}".getBytes("UTF-8"))) % 256L).toInt

    /** Complete faststart bytes: `nFrames` w×h gray8 frames at 25 fps
      * (mvhd timescale 1000, duration nFrames·40). `samplesPerChunk = 1`
      * reproduces the historical layout byte for byte (no stsc box, one
      * stco entry per sample); > 1 writes a REAL stsc (§8.7.4) — one run
      * entry plus a short-last-chunk tail entry when nFrames doesn't
      * divide — and per-chunk stco offsets, the packing every real
      * faststart muxer emits. */
    def mp4Bytes(src: Long, nFrames: Int, w: Int, h: Int,
                 brighten: Boolean = false,
                 samplesPerChunk: Int = 1): Array[Byte] = {
      require(nFrames >= 1 && w >= 1 && h >= 1 && samplesPerChunk >= 1)
      val spc = samplesPerChunk
      val nChunks = (nFrames + spc - 1) / spc
      val lastN = nFrames - (nChunks - 1) * spc // samples in the last chunk
      // (first_chunk, samples_per_chunk) runs; sdi always 1
      val stscEntries: Seq[(Int, Int)] =
        if (spc == 1) Seq.empty
        else if (nChunks == 1) Seq((1, nFrames))
        else if (lastN == spc) Seq((1, spc))
        else Seq((1, spc), (nChunks, lastN))
      val nKf = (nFrames + 1) / 2
      val frameBytes = w * h
      val stssSz = 16 + 4 * nKf
      val stszSz = 20
      val stscSz = if (stscEntries.isEmpty) 0 else 16 + 12 * stscEntries.size
      val stcoSz = 16 + 4 * nChunks
      val stblSz = 8 + stssSz + stszSz + stscSz + stcoSz
      val minfSz = 8 + stblSz
      val mdiaSz = 8 + minfSz
      val trakSz = 8 + 92 + mdiaSz
      val moovSz = 8 + 108 + trakSz
      val mdatStart = 20 + moovSz
      val buf = java.nio.ByteBuffer.allocate(mdatStart + 8 + nFrames * frameBytes)
      def matrix(): Unit = {
        buf.putInt(0x00010000).putInt(0).putInt(0)
        buf.putInt(0).putInt(0x00010000).putInt(0)
        buf.putInt(0).putInt(0).putInt(0x40000000)
      }
      buf.putInt(20).put("ftyp".getBytes("US-ASCII"))
        .put("isom".getBytes("US-ASCII")).putInt(0)
        .put("isom".getBytes("US-ASCII"))
      buf.putInt(moovSz).put("moov".getBytes("US-ASCII"))
      buf.putInt(108).put("mvhd".getBytes("US-ASCII"))
        .putInt(0).putInt(0).putInt(0)            // v0+flags, times
        .putInt(1000).putInt(nFrames * 40)        // timescale, duration
        .putInt(0x00010000).putShort(0x0100.toShort)
        .putShort(0).putLong(0L)
      matrix()
      buf.putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
        .putInt(2)
      buf.putInt(trakSz).put("trak".getBytes("US-ASCII"))
      buf.putInt(92).put("tkhd".getBytes("US-ASCII"))
        .putInt(7).putInt(0).putInt(0)
        .putInt(1).putInt(0)
        .putInt(nFrames * 40).putLong(0L)
        .putShort(0).putShort(0).putShort(0).putShort(0)
      matrix()
      buf.putInt((w.toLong << 16).toInt).putInt((h.toLong << 16).toInt)
      buf.putInt(mdiaSz).put("mdia".getBytes("US-ASCII"))
      buf.putInt(minfSz).put("minf".getBytes("US-ASCII"))
      buf.putInt(stblSz).put("stbl".getBytes("US-ASCII"))
      buf.putInt(stssSz).put("stss".getBytes("US-ASCII")).putInt(0)
        .putInt(nKf)
      (0 until nKf).foreach(i => buf.putInt(2 * i + 1)) // samples 1,3,5,…
      buf.putInt(stszSz).put("stsz".getBytes("US-ASCII")).putInt(0)
        .putInt(frameBytes).putInt(nFrames)       // uniform sample_size
      if (stscEntries.nonEmpty) {
        buf.putInt(stscSz).put("stsc".getBytes("US-ASCII")).putInt(0)
          .putInt(stscEntries.size)
        stscEntries.foreach { case (fc, n) =>
          buf.putInt(fc).putInt(n).putInt(1)      // sample_description_index
        }
      }
      buf.putInt(stcoSz).put("stco".getBytes("US-ASCII")).putInt(0)
        .putInt(nChunks)
      (0 until nChunks).foreach(c =>
        buf.putInt(mdatStart + 8 + c * spc * frameBytes))
      buf.putInt(8 + nFrames * frameBytes).put("mdat".getBytes("US-ASCII"))
      var f = 0
      while (f < nFrames) {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var g = gray(src, f, x, y)
            if (brighten && f == 0 && x < 2 && y < 2) g = math.min(255, g + 64)
            buf.put(g.toByte)
            x += 1
          }
          y += 1
        }
        f += 1
      }
      buf.array()
    }
  }

  /** The shared integer dHash kernel over a grayscale accessor: box-average
    * to a 9×8 grid (floor bounds, integer-division mean — the
    * [[imageDHash]] rule), bit Y·8+X set iff grid(X+1,Y) > grid(X,Y).
    * Returns (hi, lo) 32-bit words. */
  private[graft] def dhash64(gray: (Int, Int) => Long, w: Int, h: Int): (Long, Long) = {
    val grid = Array.ofDim[Long](8, 9)
    var yy = 0
    while (yy < 8) {
      var xx = 0
      while (xx < 9) {
        val x0 = xx * w / 9; val x1 = (xx + 1) * w / 9
        val y0 = yy * h / 8; val y1 = (yy + 1) * h / 8
        var sum = 0L; var n = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { sum += gray(x, y); n += 1; x += 1 }
          y += 1
        }
        grid(yy)(xx) = sum / n
        xx += 1
      }
      yy += 1
    }
    var hash = 0L
    var b = 0
    while (b < 64) {
      val gy = b / 8; val gx = b % 8
      if (grid(gy)(gx + 1) > grid(gy)(gx)) hash |= (1L << b)
      b += 1
    }
    (hash >>> 32, hash & 0xffffffffL)
  }

  /** Keyframe-level video tier behind the ISO-BMFF walk — the content
    * signal the header tier can't give (video near-duplicates — re-mux,
    * re-level, trailing-frame edits — keep a small keyframe-hash Hamming
    * distance while exact byte dedup sees unrelated blobs). No codec
    * work: the SAMPLE TABLES are parsed for real (ISO 14496-12 §8.6.2
    * stss sync samples, §8.7.3 stsz sizes, §8.7.5 stco chunk offsets —
    * stss absent ⇒ every sample is a sync sample, per spec), giving
    * `n_frames` / `n_keyframes` / the first keyframe's byte extent for
    * ANY faststart MP4; the pixel step then applies only to tracks whose
    * samples are UNCOMPRESSED gray8 of the tkhd dimensions (the planted
    * fixture; a real codec's frames need ffmpeg and yield null hash
    * words, stated scope). Chunking resolves through a real stsc walk
    * (§8.7.4 — run entries to the keyframe's chunk, plus the in-chunk
    * sample offset), so multi-sample chunks — the packing every real
    * faststart muxer emits — slice correctly; with stsc absent the
    * one-sample-per-chunk layout (stco entries == sample count) is
    * assumed, and a file with neither shape yields null hash words
    * rather than a wrong slice. The 64-bit keyframe dHash is the
    * [[dhash64]] kernel — identical math to the image tier — so pairs
    * ride [[graft.operators.Dedup.hammingPairs64]] unchanged.
    *
    * Output: `(doc_id, vid_w, vid_h, duration_ms, n_frames, n_keyframes,
    * kf_hi, kf_lo)`; non-MP4 payloads yield all-null metrics. */
  def videoKeyframes(df: DataFrame, idCol: String = "doc_id",
                     payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val parsed =
            try parseKeyframes(bytes) catch { case _: Exception => None }
          parsed match {
            case Some((w, h, durMs, nFrames, nKf, kfWords)) =>
              (id, Some(w), Some(h), Some(durMs), Some(nFrames), Some(nKf),
                kfWords.map(_._1), kfWords.map(_._2))
            case None =>
              (id, None: Option[Long], None: Option[Long], None: Option[Long],
                None: Option[Long], None: Option[Long],
                None: Option[Long], None: Option[Long])
          }
        }
      }.toDF(idCol, "vid_w", "vid_h", "duration_ms", "n_frames",
        "n_keyframes", "kf_hi", "kf_lo")
  }

  /** The per-payload kernel of [[videoKeyframes]]:
    * (w, h, duration_ms, n_frames, n_keyframes, Option[(kf_hi, kf_lo)]). */
  private[graft] def parseKeyframes(b: Array[Byte])
      : Option[(Long, Long, Long, Long, Long, Option[(Long, Long)])] = {
    def beU32(o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    if (b.length < 16 ||
        !(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p')) return None
    // find a box type's payload [start, end) among the children of
    // [from, to); sizes are validated so adversarial bytes desync, not loop
    def child(from: Int, to: Int, typ: String): Option[(Int, Int)] = {
      var i = from
      while (i + 8 <= to) {
        val size = beU32(i)
        if (size < 8 || size > Int.MaxValue) return None
        if (b(i + 4) == typ(0) && b(i + 5) == typ(1) &&
            b(i + 6) == typ(2) && b(i + 7) == typ(3))
          return Some((i + 8, math.min(to.toLong, i + size).toInt))
        i += size.toInt
      }
      None
    }
    val (moovS, moovE) = child(0, b.length, "moov").getOrElse(return None)
    // movie duration from mvhd (v0/v1), as in decodeMp4
    val (ts, dur) = child(moovS, moovE, "mvhd") match {
      case Some((s, e)) =>
        val v = b(s) & 0xff
        if (v == 0 && s + 20 <= e) (beU32(s + 12), beU32(s + 16))
        else if (v == 1 && s + 32 <= e)
          (beU32(s + 20), (beU32(s + 24) << 32) | beU32(s + 28))
        else (-1L, -1L)
      case None => (-1L, -1L)
    }
    if (ts <= 0 || dur < 0) return None
    val (trakS, trakE) = child(moovS, moovE, "trak").getOrElse(return None)
    val (w, h) = child(trakS, trakE, "tkhd") match {
      case Some((s, e)) =>
        val off = if ((b(s) & 0xff) == 1) s + 88 else s + 76
        if (off + 8 <= e) (beU32(off) >> 16, beU32(off + 4) >> 16)
        else return None
      case None => return None
    }
    val (stblS, stblE) = (for {
      (ms, me) <- child(trakS, trakE, "mdia")
      (fs, fe) <- child(ms, me, "minf")
      st <- child(fs, fe, "stbl")
    } yield st).getOrElse(return None)
    // stsz (§8.7.3 v0): [v/flags][sample_size][sample_count]
    val (sampleSize, nFrames) = child(stblS, stblE, "stsz") match {
      case Some((s, e)) if s + 12 <= e => (beU32(s + 4), beU32(s + 8))
      case _ => return None
    }
    if (nFrames <= 0) return None
    // stss (§8.6.2): absent ⇒ every sample is sync
    val (nKf, firstKf) = child(stblS, stblE, "stss") match {
      case Some((s, e)) if s + 8 <= e =>
        val n = beU32(s + 4)
        if (n <= 0 || s + 8 + 4 > e) return None
        (n, beU32(s + 8))
      case _ => (nFrames, 1L)
    }
    // stsc (§8.7.4): resolve the chunk holding sample `firstKf` and that
    // chunk's first sample. Entries are (first_chunk, samples_per_chunk,
    // sample_description_index) with first_chunk ascending from 1; entry i
    // governs chunks [first_chunk_i, first_chunk_{i+1}). Real faststart
    // files pack MANY samples per chunk, so the in-chunk offset is
    // (firstKf − first_sample_of_chunk) · sample_size — the round-11 code
    // only resolved the one-sample-per-chunk layout and nulled the rest.
    // `stscLoc = Some(None)` means "stsc present but malformed / doesn't
    // cover the sample": the pixel tier nulls rather than slicing wrong
    // bytes; the metadata columns stay valid either way.
    val stscLoc: Option[Option[(Long, Long)]] = child(stblS, stblE, "stsc") match {
      case Some((s, e)) if s + 8 <= e =>
        val nEnt = beU32(s + 4)
        if (nEnt <= 0 || s + 8 + 12 * nEnt > e) Some(None)
        else {
          var i = 0L
          var sampleAcc = 1L // first sample (1-based) of entry i's first chunk
          var loc: Option[(Long, Long)] = None
          var bad = false
          while (i < nEnt && loc.isEmpty && !bad) {
            val off = (s + 8 + 12 * i).toInt
            val fc = beU32(off)
            val spc = beU32(off + 4)
            val nextFc = if (i + 1 < nEnt) beU32((s + 8 + 12 * (i + 1)).toInt)
                         else Long.MaxValue
            // §8.7.4: the first entry MUST govern chunk 1 — a table whose
            // first run starts later leaves chunks 1..fc−1 unmapped, and
            // resolving sampleAcc from 1 anyway would compute a SHIFTED
            // chunk index that can pass the bounds guards while slicing
            // wrong bytes. Spec-violating table ⇒ bad ⇒ null hash words,
            // never a wrong slice.
            if (spc <= 0 || fc <= 0 || nextFc <= fc ||
                (i == 0L && fc != 1L)) bad = true
            else {
              val runSamples =
                if (nextFc == Long.MaxValue) Long.MaxValue
                else (nextFc - fc) * spc
              if (runSamples != Long.MaxValue && firstKf >= sampleAcc + runSamples) {
                sampleAcc += runSamples
                i += 1
              } else {
                val chunkInRun = (firstKf - sampleAcc) / spc
                loc = Some((fc + chunkInRun, sampleAcc + chunkInRun * spc))
              }
            }
          }
          Some(if (bad) None else loc)
        }
      case _ => None // absent: fall back to the one-sample-per-chunk layout
    }
    // pixel tier: uniform-size raw gray8 samples; byte extent through the
    // stsc walk when the table exists, else the stco-entries == sample
    // count layout (a file with neither shape yields null hash words)
    val kfWords: Option[(Long, Long)] = child(stblS, stblE, "stco") match {
      case Some((s, e)) if s + 8 <= e &&
          sampleSize == w * h && w >= 9 && h >= 8 &&
          firstKf >= 1 && firstKf <= nFrames =>
        val nChunks = beU32(s + 4)
        val loc: Option[(Long, Long)] = stscLoc match {
          case Some(resolved) => resolved
          case None => if (nChunks == nFrames) Some((firstKf, firstKf)) else None
        }
        loc match {
          case Some((chunk, firstSample)) if chunk >= 1 && chunk <= nChunks &&
              s + 8 + 4 * chunk <= e && firstSample <= firstKf =>
            val off = beU32((s + 8 + 4 * (chunk - 1)).toInt) +
              (firstKf - firstSample) * sampleSize
            if (off >= 0 && off + sampleSize <= b.length) {
              val o = off.toInt
              Some(dhash64((x, y) => (b(o + y * w.toInt + x) & 0xff).toLong,
                w.toInt, h.toInt))
            } else None
          case _ => None
        }
      case _ => None
    }
    Some((w, h, dur * 1000L / ts, nFrames, nKf, kfWords))
  }

  /** Resize plan: target dimensions bounded by `maxDim` with aspect ratio
    * preserved — pure Column math over the decoded metadata (the pixel
    * resample itself belongs in the decode kernel; this is the part the
    * engine owns: computing per-row targets that the codec executes). */
  def withResizeTargets(features: DataFrame, maxDim: Int): DataFrame = {
    // dimensionless rows (audio: width = height = 0) keep scale 1 — ANSI
    // mode would otherwise throw DIVIDE_BY_ZERO on the aspect ratio
    val maxSide = greatest(col("width"), col("height"))
    val scale = when(maxSide > 0,
      least(lit(1.0), lit(maxDim.toDouble) / maxSide)).otherwise(lit(1.0))
    features
      .withColumn("target_width", floor(col("width") * scale).cast("long"))
      .withColumn("target_height", floor(col("height") * scale).cast("long"))
  }
}
