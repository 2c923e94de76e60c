package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Longest common substring of two strings — the reference's broad-use
  * `LongestCommonSubstring` T-SQL table function (analysis/Broad use
  * functions/longest_common_substring.sql:70-105), which materializes an
  * O(n·m) character-match scratch table, quirky-updates run groups, and
  * aggregates. Here a single codegen'd Catalyst `BinaryExpression`
  * running the classic rolling-row dynamic program — no scratch table,
  * no per-row SQL recursion, O(min(n,m)) memory.
  *
  * Returns `struct<match_length INT, first_pos INT, second_pos INT,
  * common STRING>` with the T-SQL's exact selection rule: longest run,
  * ties broken by smallest start in the FIRST string, then smallest
  * start in the SECOND (its `ORDER BY COUNT(*) DESC, MIN(firstOrder),
  * MIN(secondOrder)`). Positions are 1-based like the T-SQL; no common
  * character yields (0, 0, 0, '') where the T-SQL returns an empty
  * table (a struct column can't drop rows; callers filter
  * `match_length > 0` for the same effect).
  */
case class LcsSubstring(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LcsSubstring.outType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(l: Any, r: Any): Any =
    LcsSubstring.lcs(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.LcsSubstring.lcs($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object LcsSubstring {

  val outType: StructType = StructType(Seq(
    StructField("match_length", IntegerType, nullable = false),
    StructField("first_pos", IntegerType, nullable = false),
    StructField("second_pos", IntegerType, nullable = false),
    StructField("common", StringType, nullable = false)))

  /** Static kernel shared by interpreted eval and generated code.
    * Operates on UTF-16 code units of the decoded strings (the fixture
    * corpus is ASCII, where code unit = character = the T-SQL CHAR). */
  def lcs(a: UTF8String, b: UTF8String): InternalRow = {
    val s1 = a.toString
    val s2 = b.toString
    val n = s1.length
    val m = s2.length
    // prev(j) = length of the common run ending at (i-1, j-1)
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var bestLen = 0
    var bestI = 0 // 1-based run start in s1
    var bestJ = 0 // 1-based run start in s2
    var i = 1
    while (i <= n) {
      val c1 = s1.charAt(i - 1)
      var j = 1
      while (j <= m) {
        if (c1 == s2.charAt(j - 1)) {
          val len = prev(j - 1) + 1
          cur(j) = len
          val si = i - len + 1
          val sj = j - len + 1
          // longest; ties -> smallest start in s1, then in s2
          if (len > bestLen ||
              (len == bestLen && (si < bestI ||
                (si == bestI && sj < bestJ)))) {
            bestLen = len; bestI = si; bestJ = sj
          }
        } else cur(j) = 0
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    val common =
      if (bestLen == 0) UTF8String.EMPTY_UTF8
      else UTF8String.fromString(s2.substring(bestJ - 1, bestJ - 1 + bestLen))
    new GenericInternalRow(Array[Any](bestLen, bestI, bestJ, common))
  }

  def lcsSubstring(first: Column, second: Column): Column =
    Shim.column(LcsSubstring(Shim.expression(first), Shim.expression(second)))
}
