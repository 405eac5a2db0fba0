package graft

import graft.functions.{TextOps, WinnowSelect}
import org.apache.spark.unsafe.types.UTF8String

/** Pins the [[graft.functions.WinnowSelect]] monotonic-deque kernel against
  * an INDEPENDENT per-window brute force of the published scheme (direct
  * polynomial per gram, min-key per window, rightmost on ties) — the same
  * formula the retired columnar evaluation computed and the DuckDB
  * doc_fingerprints oracles still replay, so kernel parity here is oracle
  * parity by transitivity. Randomized strings sweep the boundary lengths
  * (no full window / exactly one window / many) and several (k, w)
  * geometries including the w > k regime the decade ladder measures. */
class WinnowParitySpec extends SparkSpec {

  /** Direct per-window reimplementation (no rolling state, no deque).
    * Selection minimizes the 20-bit KR key; the emitted hash is the
    * 60-bit md5-prefix of the selected gram — computed here through the
    * hex-string route (`BigInt(md5hex.take(15), 16)`), independent of the
    * kernel's byte arithmetic and identical to the DuckDB oracles'
    * `CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT)`. */
  private def brute(text: String, k: Int, w: Int): Set[(Long, Long)] = {
    val cps = text.codePoints().toArray
    val len = cps.length
    if (len < k + w - 1) return Set.empty
    val M = 1L << 20
    val pow = Iterator.iterate(1L)(_ * 31L).take(k).toArray
    def h60(g: Int): Long = {
      val gram = new String(cps, g, k).getBytes("UTF-8")
      val hex = java.security.MessageDigest.getInstance("MD5").digest(gram)
        .map(b => f"${b & 0xff}%02x").mkString
      BigInt(hex.take(15), 16).toLong
    }
    val grams = (0 to len - k).map { g =>
      val h = (0 until k).map(i => cps(g + i).toLong * pow(k - 1 - i)).sum % M
      val p = (g + 1).toLong
      (h * (1L << 32) + ((1L << 32) - 1 - p), p, g)
    }
    (0 to len - (k + w - 1)).map { s =>
      val m = grams.slice(s, s + w).minBy(_._1)
      (m._2, h60(m._3))
    }.toSet
  }

  private def kernel(text: String, k: Int, w: Int): Seq[(Long, Long)] = {
    val arr = WinnowSelect.compute(UTF8String.fromString(text), k, w)
    (0 until arr.numElements()).map { i =>
      val row = arr.getStruct(i, 2)
      (row.getLong(0), row.getLong(1))
    }
  }

  test("deque kernel matches per-window brute force on randomized strings") {
    val rng = new scala.util.Random(20260815L)
    val pool = "abcdefgh XYZ012,.!éß€漢" // incl. 2/3-byte code points
    val geoms = Seq((3, 2), (8, 4), (8, 12), (5, 5))
    for (_ <- 1 to 300) {
      val len = rng.nextInt(64)
      val s = Seq.fill(len)(pool(rng.nextInt(pool.length))).mkString
      for ((k, w) <- geoms) {
        val got = kernel(s, k, w)
        // distinct, increasing-p, and set-equal to the window definition
        assert(got.map(_._1) == got.map(_._1).sorted, s"p order: k=$k w=$w '$s'")
        assert(got.size == got.toSet.size, s"dup emit: k=$k w=$w '$s'")
        assert(got.toSet == brute(s, k, w), s"mismatch: k=$k w=$w '$s'")
      }
    }
  }

  test("DataFrame surface: distinct rows, boundary lengths, empty text") {
    import spark.implicits._
    val d = Seq(
      (1L, "abcab"),            // two windows at k=3, w=2
      (2L, "aaaa"),             // exactly one window
      (3L, "ab"),               // too short — no rows
      (4L, "")                  // empty — no rows
    ).toDF("doc_id", "text")
    val fp = TextOps.winnowFingerprints(d, "doc_id", k = 3, w = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(fp.length == fp.toSet.size)
    assert(!fp.exists(r => r._1 == 3L || r._1 == 4L))
    assert(fp.count(_._1 == 2L) == 1)
    val expected1 = brute("abcab", 3, 2).map { case (p, h) => (1L, p, h) }
    assert(fp.filter(_._1 == 1L).toSet == expected1)
  }
}
