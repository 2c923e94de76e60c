package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
  * "Winnowing: Local Algorithms for Document Fingerprinting", the MOSS
  * algorithm): Rabin-Karp ROLLING hash over character k-grams (O(1) per
  * step after the first window), then the minimum hash of every window of
  * `w` consecutive k-gram hashes. Guarantee: any shared substring of length
  * >= k + w - 1 contributes at least one shared fingerprint, so local
  * overlap detection needs only the (dense ~ 2/(w+1)) selected hashes, not
  * every k-gram.
  *
  * Returned as sorted distinct longs: window minima dedupe by value, which
  * keeps tie-break-position differences (robust vs plain winnowing) out of
  * the result and makes the operator reproducible by any engine that can
  * compute the same 2^64-wrap polynomial hash (see the q72 DuckDB oracle).
  *
  * Minima use UNSIGNED 64-bit order — the natural order of the mod-2^64
  * polynomial value — so external oracles don't need Java's signed view.
  *
  * Codegen'd: the whole per-document pipeline (hash roll + deque minima +
  * sort/dedupe) is one primitive-array kernel call inside
  * WholeStageCodegen; no per-gram allocation.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    WinnowFingerprints.fingerprints(v.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowFingerprints.fingerprints($c, $k, $w);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object WinnowFingerprints {

  /** Polynomial base; any odd constant works for the 2^64-wrap hash. */
  final val Base = 263L

  /** Static kernel shared by interpreted eval and generated code. */
  def fingerprints(s: UTF8String, k: Int, w: Int): ArrayData = {
    val b = s.getBytes
    val n = b.length
    if (n <= k) {
      // short doc: one whole-text hash (n == 0 folds to 0 — still one
      // deterministic fingerprint, mirrored by the SQL oracle)
      var h = 0L
      var i = 0
      while (i < n) { h = h * Base + (b(i) & 0xffL); i += 1 }
      return new GenericArrayData(Array(h))
    }
    val nk = n - k + 1
    val hs = new Array[Long](nk)
    var powK1 = 1L
    var i = 1
    while (i < k) { powK1 *= Base; i += 1 } // Base^(k-1), wraps mod 2^64
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + (b(i) & 0xffL); i += 1 }
    hs(0) = h
    i = 1
    while (i < nk) {
      // roll: drop byte i-1, append byte i+k-1 (all arithmetic mod 2^64)
      h = (h - (b(i - 1) & 0xffL) * powK1) * Base + (b(i + k - 1) & 0xffL)
      hs(i) = h
      i += 1
    }
    // sliding UNSIGNED minima over windows of `w` via monotonic deque: O(nk)
    val effW = math.min(w, nk)
    val nWin = nk - effW + 1
    val out = new Array[Long](nWin)
    val deque = new Array[Int](nk)
    var head = 0
    var tail = 0 // deque holds indices with increasing (unsigned) hash
    i = 0
    while (i < nk) {
      while (tail > head && java.lang.Long.compareUnsigned(hs(deque(tail - 1)), hs(i)) >= 0)
        tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - effW) head += 1
      if (i >= effW - 1) out(i - effW + 1) = hs(deque(head))
      i += 1
    }
    java.util.Arrays.sort(out)
    var uniq = 0
    i = 0
    while (i < nWin) {
      if (i == 0 || out(i) != out(uniq - 1)) { out(uniq) = out(i); uniq += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, uniq))
  }

  def winnow(text: Column, k: Int, w: Int): Column =
    Shim.column(WinnowFingerprints(Shim.expression(text), k, w))
}
