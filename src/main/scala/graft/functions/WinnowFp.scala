package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
  * — the MOSS scheme): a TRUE O(n) rolling Rabin-Karp hash over the
  * text's k-byte windows, then the minimum of each w consecutive gram
  * hashes is selected. Guarantee: any substring shared between two
  * documents of length ≥ w + k − 1 bytes contributes at least one
  * SHARED selected fingerprint — the document-fingerprinting contract a
  * plagiarism/near-copy detector builds its inverted index on.
  *
  * Returns the selected window minima in order (duplicates included —
  * callers explode + distinct relationally). Texts shorter than
  * k + w − 1 bytes have no full window → empty array.
  *
  * Arithmetic contract (what makes the DuckDB oracle bit-identical):
  * gram hash h = fold over bytes of (h·257 + byte) mod (2³¹ − 1), rolled
  * in O(1) per step by subtracting the outgoing byte's 257^(k−1) term;
  * all values stay < 2⁴⁰ so long math never overflows. Byte semantics:
  * the fold runs over UTF-8 BYTES, which equals the oracle's
  * code-point fold for ASCII text (the corpus contract; documented
  * rather than paying per-row code-point decoding).
  *
  * Like [[MinHashSig]], per-row work is one eval loop, so
  * CodegenFallback costs a boxed call per ROW, not per element.
  */
case class WinnowFp(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1 && w >= 1, "winnow_fp needs k >= 1 and w >= 1")

  private val Mod: Long  = (1L << 31) - 1 // 2^31-1 prime: h*257+255 < 2^40
  private val Base: Long = 257L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fp expects string, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n     = bytes.length
    val nGrams = n - k + 1
    if (nGrams < w) return new GenericArrayData(Array.empty[Long])

    // leading-byte weight 257^(k-1) mod M for the O(1) roll
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow = pow * Base % Mod; i += 1 }

    val gh = new Array[Long](nGrams)
    var h = 0L
    i = 0
    while (i < k) { h = (h * Base + (bytes(i) & 0xff)) % Mod; i += 1 }
    gh(0) = h
    i = 1
    while (i < nGrams) {
      val out = (bytes(i - 1) & 0xff) * pow % Mod
      h = ((h - out + Mod) % Mod * Base + (bytes(i + k - 1) & 0xff)) % Mod
      gh(i) = h
      i += 1
    }

    // w is a small literal: the O(n·w) window min is branch-predictable
    // and allocation-free (a deque buys nothing at w=4)
    val sel = new Array[Long](nGrams - w + 1)
    var p = 0
    while (p <= nGrams - w) {
      var m = gh(p)
      var j = 1
      while (j < w) { val v = gh(p + j); if (v < m) m = v; j += 1 }
      sel(p) = m
      p += 1
    }
    new GenericArrayData(sel)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFp =
    copy(child = newChild)

  override def prettyName: String = "winnow_fp"
}
