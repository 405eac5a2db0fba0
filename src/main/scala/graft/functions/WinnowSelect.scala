package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumns
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing selection (Schleimer, Wilkerson & Aiken 2003) over one
  * text value: Karp–Rabin polynomial rolling hash (base 31 mod 2²⁰) over
  * character `k`-grams, sliding-window minimum over every `w` consecutive
  * gram hashes (rightmost on ties), returning the DISTINCT selected
  * `(p, h)` fingerprints in position order as `array<struct<p,h>>`.
  *
  * SELECTION runs on the 20-bit rolling hash (the published scheme — a
  * window minimum needs no more); the EMITTED fingerprint `h` is the
  * 60-bit portable digest of the selected gram itself
  * (`TextOps.fingerprint64(substr(text, p, k))`, the md5-prefix recipe
  * the span ops already use). A 20-bit emitted label saturates at corpus
  * scale: ~5×10⁸ selected fingerprints over 2²⁰ values make every
  * "shared fingerprint" overwhelmingly a HASH COLLISION, not shared text
  * — measured at 2×10⁷ docs, the collision pairs dominated
  * fingerprint_pairs' CPU (9.4k of 13.8k task-core-sec) and the
  * doc-frequency cap was dropping genuinely rare grams whose 20-bit
  * bucket happened to be hot (SURVEY §2.9.13). The digest costs one md5
  * per SELECTED gram (density 2/(w+1), amortized into the scan), keeps
  * every value a plain non-negative BIGINT any engine reproduces, and
  * restores the MOSS meaning of "shared fingerprint = shared k-gram" at
  * any corpus size (collision odds 2⁻⁶⁰-scale per pair).
  *
  * This replaces the columnar one-row-per-window formulation
  * (explode + a `least()` over k·w per-char substring polynomials per
  * window): the round-10 decade table showed that O(k·w)-per-position scan
  * DOMINATING the fingerprint tier at 2×10⁷ docs (fingerprint_pairs
  * 16.4×/decade; coarsening w cut shuffle 40% while the wall went UP —
  * SURVEY §2.9.9). Here each gram hash is one O(1) rolling step and the
  * window minimum is a monotonic deque (amortized O(1)/position), so a
  * document costs O(chars) total — and the operator emits only the
  * ~2/(w+1)-density selected set, not one row per window, so the explode
  * fan-out and everything downstream shrink ~(w+1)/2× before any exchange.
  *
  * VALUE-compatible with the replaced formulation bit for bit (pinned by
  * WinnowParitySpec + the standing doc_fingerprints oracles):
  *
  *  - char values are Unicode CODE POINTS and positions count code points,
  *    exactly `ascii(substr(text, p, 1))` semantics (measured: Spark 4's
  *    `Ascii` returns the code point, and `UTF8String.substr` positions
  *    are code-point-based);
  *  - gram hash = (Σ cp·31^(k−1−i)) mod 2²⁰ — the rolling recurrence
  *    keeps the true mathematical mod via the power-of-two bitmask, which
  *    equals the direct sum's Java `%` (non-negative operands);
  *  - selection key = h·2³² + (2³²−1−p), minimized per window — smallest
  *    hash, rightmost position on ties (the MOSS tie rule);
  *  - a gram's selection run is contiguous (once dominated it leaves the
  *    deque forever; an expired front yields to a later gram), so
  *    front-change detection emits exactly the distinct selected set.
  */
case class WinnowSelect(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow_select needs a string input, got $t")
  }

  override def dataType: DataType = WinnowSelect.OutType

  override def prettyName: String = "graft_winnow_select"

  override def nullSafeEval(input: Any): Any =
    WinnowSelect.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowSelect.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
}

object WinnowSelect {

  /** `array<struct<p: long, h: long>>` — the element types every consumer
    * (and the DuckDB oracles) key on. */
  val OutType: ArrayType = ArrayType(StructType(Seq(
    StructField("p", LongType, nullable = false),
    StructField("h", LongType, nullable = false))), containsNull = false)

  private val Mask = (1L << 20) - 1 // mod 2^20 as a bitmask (exact for any sign)

  /** Column form. */
  def selected(text: Column, k: Int, w: Int): Column = {
    require(k >= 2 && w >= 2, s"need k>=2 and w>=2, got k=$k w=$w")
    GraftColumns.column(WinnowSelect(GraftColumns.expression(text), k, w))
  }

  /** The per-row kernel (also the codegen call target): distinct selected
    * (p, h) fingerprints in increasing-p order; empty for texts shorter
    * than k + w − 1 code points. */
  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    val n16 = s.length
    // code points in order — UTF8String char positions count code points
    val cps = new Array[Int](s.codePointCount(0, n16))
    var ci = 0
    var off = 0
    while (off < n16) {
      val cp = s.codePointAt(off)
      cps(ci) = cp
      ci += 1
      off += Character.charCount(cp)
    }
    val len = cps.length
    val nGrams = len - k + 1
    val nWins = len - (k + w - 2)
    if (nWins <= 0) return new GenericArrayData(Array.empty[Any])
    // 31^(k-1) mod 2^20, for the rolling drop-leading-char step
    var powK1 = 1L
    var i = 0
    while (i < k - 1) { powK1 = (powK1 * 31L) & Mask; i += 1 }
    val md = java.security.MessageDigest.getInstance("MD5")
    // monotonic deque of gram indices (0-based), keys increasing front→back
    val dqIdx = new Array[Int](nGrams)
    val dqKey = new Array[Long](nGrams)
    var head = 0
    var tail = 0 // exclusive
    val out = new java.util.ArrayList[Any](2 * nWins / (w + 1) + 2)
    var lastEmitted = -1
    var h = 0L
    var g = 0 // 0-based gram index; text position = g + 1
    while (g < nGrams) {
      if (g == 0) {
        var j = 0
        while (j < k) { h = ((h * 31L) + cps(j)) & Mask; j += 1 }
      } else {
        h = (((h - (cps(g - 1) * powK1)) * 31L) + cps(g + k - 1)) & Mask
      }
      // key embeds rightmost-on-ties: larger position → smaller key
      val key = h * (1L << 32) + ((1L << 32) - 1 - (g + 1))
      while (tail > head && dqKey(tail - 1) > key) tail -= 1
      dqIdx(tail) = g; dqKey(tail) = key; tail += 1
      if (g >= w - 1) {
        val winStart = g - (w - 1)
        while (dqIdx(head) < winStart) head += 1
        val front = dqIdx(head)
        if (front != lastEmitted) {
          val fk = dqKey(head)
          val p = (1L << 32) - 1 - (fk & ((1L << 32) - 1))
          out.add(new GenericInternalRow(Array[Any](p, wideHash(md, cps, front, k))))
          lastEmitted = front
        }
      }
      g += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** `TextOps.fingerprint64` of the k-code-point gram starting at 0-based
    * gram index `g`: the first 15 hex digits of md5(UTF-8 bytes) as a
    * long — i.e. the top 60 bits of the digest (first 8 bytes big-endian,
    * shifted right 4). One md5 per SELECTED gram, digest instance reused
    * across the document. */
  private def wideHash(md: java.security.MessageDigest,
                       cps: Array[Int], g: Int, k: Int): Long = {
    md.reset()
    val d = md.digest(new String(cps, g, k).getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }
}
