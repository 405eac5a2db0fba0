package graft

import graft.operators.{Dedup, Multimodal}
import org.apache.spark.sql.functions._

/** Pixel-level image tier: the PNG encode→decode round trip must be
  * lossless, the dHash must equal a direct replay over the planted pixel
  * grid (the property the SQL oracle relies on), and the banded Hamming
  * pair join must equal the brute-force all-pairs definition. */
class MultimodalPixelSpec extends SparkSpec {

  /** dHash replayed straight from [[Multimodal.PlantedImages.gray]] —
    * no image codec anywhere: the reference the decode path must hit. */
  private def expectedHash(src: Long, w: Int, h: Int,
                           brighten: Boolean): (Long, Long) = {
    def px(x: Int, y: Int): Int = {
      val g = Multimodal.PlantedImages.gray(src, x, y)
      if (brighten && x < 2 && y < 2) math.min(255, g + 64) else g
    }
    val grid = Array.tabulate(8, 9) { (gy, gx) =>
      val x0 = gx * w / 9; val x1 = (gx + 1) * w / 9
      val y0 = gy * h / 8; val y1 = (gy + 1) * h / 8
      val vals = for (y <- y0 until y1; x <- x0 until x1) yield px(x, y)
      vals.sum / vals.size
    }
    var hash = 0L
    for (b <- 0 until 64)
      if (grid(b / 8)(b % 8 + 1) > grid(b / 8)(b % 8)) hash |= (1L << b)
    (hash >>> 32, hash & 0xffffffffL)
  }

  test("imageDHash over a real PNG round trip equals the planted-pixel replay") {
    import spark.implicits._
    val specs = Seq( // (doc, src, brighten) incl. a non-multiple-of-grid size
      (1L, 1L, false), (2L, 1L, false), (3L, 1L, true), (4L, 4L, false))
    val payloads = specs.toDF("doc_id", "src", "br").as[(Long, Long, Boolean)]
      .map { case (id, src, br) =>
        (id, Multimodal.PlantedImages.pngBytes(src, 18, 16, br))
      }.toDF("doc_id", "payload")
    val out = Multimodal.imageDHash(payloads).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)),
        (r.getLong(3), r.getLong(4)))).toMap
    specs.foreach { case (id, src, br) =>
      val (dims, (hi, lo)) = out(id)
      assert(dims === ((18L, 16L)))
      assert((hi, lo) === expectedHash(src, 18, 16, br),
        s"doc $id: decode→hash must equal the pixel replay")
    }
    // exact copy: identical hash; brightened: within 1 bit of the source
    assert(out(2L)._2 === out(1L)._2)
    val (h1, h3) = (out(1L)._2, out(3L)._2)
    val dist = java.lang.Long.bitCount(h1._1 ^ h3._1) +
      java.lang.Long.bitCount(h1._2 ^ h3._2)
    assert(dist <= 1, s"brightened near-copy must move <= 1 bit, got $dist")
  }

  test("imageDHash handles undecodable payloads and odd dims without dropping rows") {
    import spark.implicits._
    val rows = Seq(
      (1L, Multimodal.PlantedImages.pngBytes(7L, 27, 19)), // non-divisible dims
      (2L, "not an image at all".getBytes("UTF-8")),
      (3L, Multimodal.PlantedImages.pngBytes(8L, 5, 5))) // too small for 9x8
      .toDF("doc_id", "payload")
    val out = Multimodal.imageDHash(rows).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size === 3, "every row survives, decodable or not")
    assert(out(1L).getLong(3) >= 0 && out(1L).getLong(4) >= 0)
    assert(out(2L).isNullAt(3) && out(2L).isNullAt(4))
    assert(out(3L).isNullAt(3) && out(3L).isNullAt(4))
  }

  test("hammingPairs64 equals brute force, including straddling bands") {
    import spark.implicits._
    // deterministic pseudo-random 64-bit signatures + planted near pairs
    def sig(i: Long): Long = {
      var x = i * 0x9e3779b97f4a7c15L
      x ^= (x >>> 32); x *= 0xbf58476d1ce4e5b9L; x ^= (x >>> 29); x
    }
    val base = (0L until 40L).map(i => i -> sig(i))
    val planted = Seq(100L -> sig(3), 101L -> (sig(3) ^ (1L << 17)),
      102L -> (sig(3) ^ (1L << 17) ^ (1L << 55) ^ (1L << 2)))
    val all = base ++ planted
    val df = all.map { case (d, s) => (d, s >>> 32, s & 0xffffffffL) }
      .toDF("doc", "hi", "lo")
    for (maxDist <- Seq(3, 4)) { // 4 → 5 bands, one straddles the word split
      val got = Dedup.hammingPairs64(df, "doc", "hi", "lo", maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = (for {
        (a, sa) <- all; (b, sb) <- all if a < b
        d = java.lang.Long.bitCount(sa ^ sb) if d <= maxDist
      } yield (a, b, d.toLong)).toSet
      assert(got === want, s"maxDist=$maxDist")
      assert(want.exists(_._3 === 0L) || maxDist < 0) // planted exact pair
    }
  }
}
