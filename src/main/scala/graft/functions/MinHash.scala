package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** k-permutation MinHash signature of a shingle array (Broder 1997, "On the
  * resemblance and containment of documents"): per shingle one base XXH64,
  * then k derived hashes h_j = xxh64(base, j); the signature is the k
  * column-wise minima.
  *
  * A codegen'd Catalyst expression: the k x |shingles| accumulation runs as
  * one primitive loop inside WholeStageCodegen. The equivalent
  * `array((0 until k).map(j => array_min(transform(sh, xxhash64(_, j)))))`
  * formulation walks the array k times through interpreted higher-order
  * lambdas — an order of magnitude slower on the q38 hot path.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    MinHashSignature.sig(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSignature.sig($c, $k);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object MinHashSignature {
  /** Static kernel shared by interpreted eval and generated code. */
  def sig(tokens: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val s = tokens.getUTF8String(i)
        val base = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, 42L)
        var j = 0
        while (j < k) {
          val h = XXH64.hashLong(base, j)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def minhash(sh: Column, k: Int): Column =
    Shim.column(MinHashSignature(Shim.expression(sh), k))
}
