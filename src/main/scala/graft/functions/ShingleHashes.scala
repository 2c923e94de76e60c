package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** Sorted distinct 64-bit hashes of the n-token shingles of a token array —
  * the candidate-generation primitive for MinHash and prefix-filter dedup.
  *
  * One codegen'd pass: hash each token once, combine each n-window of token
  * hashes order-sensitively, sort + dedupe in primitive arrays. The
  * equivalent Column formulation (`transform(sequence(...), i =>
  * concat_ws(slice(...)))` + `array_distinct`) allocates a string per
  * shingle and walks interpreted lambdas — it dominated the q38/q40 wall
  * time. Downstream set ops (array_intersect/union for Jaccard, slice for
  * the PPJoin prefix) run on packed longs instead of strings.
  *
  * Short docs (fewer than n tokens) fall back to one whole-text shingle,
  * matching the Column version's `slice` semantics. 64-bit collisions are
  * negligible at corpus scale (p ~ k^2 / 2^64 per document pair).
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    ShingleHashes.hashes(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.hashes($c, $n);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object ShingleHashes {

  private final val TokenSeed = 7L

  /** Static kernel shared by interpreted eval and generated code. */
  def hashes(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      if (!tokens.isNullAt(i)) {
        val s = tokens.getUTF8String(i)
        th(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, TokenSeed)
      }
      i += 1
    }
    val cnt = math.max(m - n + 1, 1)
    val out = new Array[Long](cnt)
    if (m <= n) {
      // short doc: one shingle over all tokens
      var h = TokenSeed
      var j = 0
      while (j < m) { h = XXH64.hashLong(th(j), h); j += 1 }
      out(0) = h
    } else {
      var w = 0
      while (w < cnt) {
        var h = TokenSeed
        var j = w
        while (j < w + n) { h = XXH64.hashLong(th(j), h); j += 1 }
        out(w) = h
        w += 1
      }
    }
    java.util.Arrays.sort(out)
    // in-place dedupe of the sorted array
    var uniq = 0
    i = 0
    while (i < cnt) {
      if (i == 0 || out(i) != out(uniq - 1)) { out(uniq) = out(i); uniq += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, uniq))
  }

  def shingleHashes(tokens: Column, n: Int): Column =
    Shim.column(ShingleHashes(Shim.expression(tokens), n))
}

/** MinHash signature over pre-hashed shingles (companion to
  * [[ShingleHashes]]): h_j(x) = xxh64(x, j), k column minima in one pass. */
case class MinHashFromHashes(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    MinHashFromHashes.sig(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashFromHashes.sig($c, $k);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object MinHashFromHashes {
  def sig(hashes: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val base = hashes.getLong(i)
      var j = 0
      while (j < k) {
        val h = XXH64.hashLong(base, j)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def minhash(hashes: Column, k: Int): Column =
    Shim.column(MinHashFromHashes(Shim.expression(hashes), k))
}
