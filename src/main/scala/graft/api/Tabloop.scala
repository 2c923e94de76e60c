package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Zero-filled tabulation over fixed x loop category dimensions, the Spark
  * re-expression of the reference's in-R `tabloop_f`
  * (R/tabloop.R:47-624): for each loop var, group by (fixed..., loopvar),
  * aggregate, melt into a (group_cat, group) long frame, then left-join the
  * full category matrix so absent cells surface as 0.
  *
  * Scale notes: ONE scan for every loop var — the loop melts into a
  * (group_cat, group_value) explode (row growth = loop count, partial-agg
  * combined map-side before the single shuffle), not one aggregation pass
  * per var; the category matrix is tiny (distinct dims) and broadcast.
  */
object Tabloop {

  /** @param fixed    columns always grouped by
    * @param loops    category columns tabulated one at a time (melted)
    * @param aggs     aggregate expressions (must be pre-aliased)
    * @param zeroFill names of agg output columns to 0-fill in empty cells
    */
  def tabloop(df: DataFrame, fixed: Seq[String], loops: Seq[String],
      aggs: Seq[Column], zeroFill: Seq[String]): DataFrame = {
    val gs = loops.map(lv => struct(lit(lv).as("group_cat"),
      col(lv).cast("string").as("group_value")))
    val melted = df
      .withColumn("_g", explode(array(gs: _*)))
      .withColumn("group_cat", col("_g.group_cat"))
      .withColumn("group_value", col("_g.group_value"))
    val results = melted
      .groupBy((fixed ++ Seq("group_cat", "group_value")).map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

    // full fixed x (cat, value) matrix for zero-fill (tabloop.R:65-134)
    val fixedDims = df.select(fixed.map(col): _*).distinct()
    val loopDims = melted
      .select(col("group_cat"), col("group_value")).distinct()
    val matrix = fixedDims.crossJoin(broadcast(loopDims))

    val joined = matrix.join(results,
      fixed ++ Seq("group_cat", "group_value"), "left")
    joined.na.fill(0, zeroFill)
  }

  /** Small-cell suppression (R/helper_functions.R:143-175): counts within
    * [lower,upper] -> null. */
  def suppress(df: DataFrame, cols: Seq[String], lower: Int = 1,
      upper: Int = 10): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c, when(col(c).between(lower, upper), lit(null)).otherwise(col(c)))
    }
}
