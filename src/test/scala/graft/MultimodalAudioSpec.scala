package graft

import graft.operators.{Dedup, Multimodal}

/** Sample-level audio tier: the WAV PCM encode→decode round trip must be
  * lossless, the features/fingerprint must equal a direct replay over the
  * planted samples (the property the SQL oracle relies on), the envelope
  * fingerprint must be exactly gain-invariant, and channel-0 extraction
  * must hold on stereo payloads. */
class MultimodalAudioSpec extends SparkSpec {

  /** Features replayed straight from [[Multimodal.PlantedAudio.sample]] —
    * no WAV codec anywhere: the reference the decode path must hit. */
  private def expected(src: Long, n: Int, gain: Int): (Long, Long, Long, Long) = {
    val s = Array.tabulate(n)(i => Multimodal.PlantedAudio.sample(src, i) * gain)
    val sumSq = s.map(v => v.toLong * v).sum
    val zc = (1 until n).count(i => (s(i) < 0) != (s(i - 1) < 0)).toLong
    val e = Array.tabulate(65) { f =>
      (f * n / 65 until (f + 1) * n / 65).map(i => math.abs(s(i).toLong)).sum
    }
    var hash = 0L
    for (b <- 0 until 64) if (e(b + 1) > e(b)) hash |= (1L << b)
    (sumSq, zc, hash >>> 32, hash & 0xffffffffL)
  }

  test("audioFeatures over a real WAV round trip equals the planted-sample replay") {
    import spark.implicits._
    val specs = Seq( // (doc, src, gain) incl. a non-multiple-of-65 length
      (1L, 1L, 1), (2L, 1L, 1), (3L, 1L, 2), (4L, 4L, 1))
    val payloads = specs.toDF("doc_id", "src", "gain").as[(Long, Long, Int)]
      .map { case (id, src, g) =>
        (id, Multimodal.PlantedAudio.wavBytes(src, 520, g))
      }.toDF("doc_id", "payload")
    val out = Multimodal.audioFeatures(payloads).collect()
      .map(r => r.getLong(0) -> r).toMap
    specs.foreach { case (id, src, g) =>
      val r = out(id)
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((8000L, 520L, 65L)),
        s"doc $id rate/n/duration")
      val (sq, zc, hi, lo) = expected(src, 520, g)
      assert((r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)) ===
        ((sq, zc, hi, lo)), s"doc $id: decode→features must equal the replay")
    }
    // exact copy: identical everything; 2x gain: same fingerprint AND same
    // zero crossings, 4x the energy — the invariance the near-dup tier uses
    val (r1, r2, r3) = (out(1L), out(2L), out(3L))
    assert((r2.getLong(6), r2.getLong(7)) === ((r1.getLong(6), r1.getLong(7))))
    assert(r2.getLong(4) === r1.getLong(4))
    assert((r3.getLong(6), r3.getLong(7)) === ((r1.getLong(6), r1.getLong(7))),
      "2x gain must not move the envelope fingerprint")
    assert(r3.getLong(5) === r1.getLong(5), "gain preserves sign flips")
    assert(r3.getLong(4) === 4L * r1.getLong(4), "gain scales energy by 4")
  }

  test("audioFeatures: non-divisible length, stereo channel-0, undecodable, too-short") {
    import spark.implicits._
    // stereo WAV: channel 0 = planted samples of src 9, channel 1 = noise
    // (bit-inverted) — channel-0 extraction must see only the planted ones
    val n = 333 // not a multiple of 65: floor-bound frames still partition
    val stereo = {
      val out = java.nio.ByteBuffer.allocate(44 + n * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put(Multimodal.HeaderDecoder.wavPayload(2, 8000, n))
      for (i <- 0 until n) {
        out.putShort(Multimodal.PlantedAudio.sample(9L, i).toShort)
        out.putShort((~Multimodal.PlantedAudio.sample(9L, i)).toShort)
      }
      out.array()
    }
    // adversarial chunk walk: a u32 chunk size past Int.MaxValue must
    // desync to a null row, never walk the cursor backwards
    val evil = {
      val out = java.nio.ByteBuffer.allocate(44)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put(Multimodal.HeaderDecoder.wavPayload(1, 8000, 4))
      out.putInt(16, 0x90000008) // fmt chunk size → negative toInt
      out.array()
    }
    val rows = Seq(
      (1L, Multimodal.PlantedAudio.wavBytes(7L, n)),
      (2L, stereo),
      (3L, "not audio".getBytes("UTF-8")),
      (4L, Multimodal.PlantedAudio.wavBytes(8L, 30)), // < 65: no fingerprint
      (5L, evil))
      .toDF("doc_id", "payload")
    val out = Multimodal.audioFeatures(rows).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size === 5, "every row survives, decodable or not")
    assert(out(5L).isNullAt(4) && out(5L).isNullAt(6),
      "oversized chunk walk must yield a null row, not an exception")
    val (sq, zc, hi, lo) = expected(7L, n, 1)
    val r1 = out(1L)
    assert((r1.getLong(4), r1.getLong(5), r1.getLong(6), r1.getLong(7)) ===
      ((sq, zc, hi, lo)))
    val (sq9, zc9, hi9, lo9) = expected(9L, n, 1)
    val r2 = out(2L)
    assert((r2.getLong(4), r2.getLong(5), r2.getLong(6), r2.getLong(7)) ===
      ((sq9, zc9, hi9, lo9)), "stereo must feature channel 0 only")
    assert(r2.getLong(3) === n * 1000L / 8000L, "stereo duration from frames")
    assert(out(3L).isNullAt(4) && out(3L).isNullAt(6))
    val r4 = out(4L)
    assert(!r4.isNullAt(4) && r4.isNullAt(6) && r4.isNullAt(7),
      "too-short audio keeps features, drops only the fingerprint")
  }

  test("audio fingerprint pairs find exact and re-leveled copies via the banded join") {
    import spark.implicits._
    // 12 distinct sources + one exact copy + one 2x-gain copy of source 0
    val payloads = ((0L until 12L).map(i => (i, i, 1)) ++
      Seq((100L, 0L, 1), (101L, 0L, 2)))
      .toDF("doc_id", "src", "gain").as[(Long, Long, Int)]
      .map { case (id, src, g) =>
        (id, Multimodal.PlantedAudio.wavBytes(src, 520, g))
      }.toDF("doc_id", "payload")
    val pairs = Dedup.hammingPairs64(
      Multimodal.audioFeatures(payloads), "doc_id", "fp_hi", "fp_lo", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs.contains((0L, 100L, 0L)), "exact copy at distance 0")
    assert(pairs.contains((0L, 101L, 0L)), "2x-gain copy at distance 0")
    assert(pairs.contains((100L, 101L, 0L)))
  }
}
