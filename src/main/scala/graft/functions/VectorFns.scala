package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** Native vector math over `array<float>` embedding columns.
  *
  * A Catalyst `BinaryExpression` with `doGenCode` (whole-stage-codegen'd
  * tight loop over the primitive float arrays) — roughly an order of
  * magnitude faster than the `aggregate(zip_with(...))` higher-order-function
  * formulation and with zero object churn, which matters when brute-force
  * similarity scans cross-join 1e5 x 1e6 vectors.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    CosineSimilarity.cosine(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CosineSimilarity.cosine($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object CosineSimilarity {
  /** Static kernel shared by interpreted eval and generated code. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** Dot product over `array<float>`, same design as [[CosineSimilarity]]. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(l: Any, r: Any): Any =
    DotProduct.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DotProduct.dot($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object DotProduct {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }
}

/** Integer squared Euclidean distance from one `array<int>` vector to
  * EVERY centroid of an `array<array<int>>` literal, as
  * `array<struct<d: long, cell: int>>` (cell = centroid position).
  * Same design as [[CosineSimilarity]]: one codegen'd tight loop over
  * primitive ints replaces the `aggregate(zip_with(...))` higher-order
  * formulation, which Spark evaluates INTERPRETED — the hot path of the
  * integer-Lloyd IVF (4 assignment passes over the corpus per build).
  * Downstream `array_min` / `array_sort` on the nCells-element result
  * are trivial; struct comparison orders (d, cell) ascending, i.e.
  * lowest distance with lowest-cell ties. */
case class IntCellDists(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("d", LongType, nullable = false),
    StructField("cell", IntegerType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(l: Any, r: Any): Any =
    IntCellDists.dists(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IntCellDists.dists($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object IntCellDists {
  def dists(v: ArrayData, cens: ArrayData): ArrayData = {
    val n = cens.numElements()
    val out = new Array[Any](n)
    var c = 0
    while (c < n) {
      val cen = cens.getArray(c)
      val m = math.min(v.numElements(), cen.numElements())
      var s = 0L
      var i = 0
      while (i < m) {
        val d = (v.getInt(i) - cen.getInt(i)).toLong
        s += d * d
        i += 1
      }
      out(c) = org.apache.spark.sql.catalyst.InternalRow(s, c)
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object VectorFns {
  def cosineSim(a: Column, b: Column): Column =
    Shim.column(CosineSimilarity(Shim.expression(a), Shim.expression(b)))
  def dotProduct(a: Column, b: Column): Column =
    Shim.column(DotProduct(Shim.expression(a), Shim.expression(b)))
  def intCellDists(v: Column, centroids: Column): Column =
    Shim.column(IntCellDists(Shim.expression(v), Shim.expression(centroids)))
}
