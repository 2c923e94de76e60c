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

  /** The GROUPING-SETS formulation SURVEY §3.3 sketches as tabloop's
    * alternative physical strategy, and the "data card" builder for a
    * training corpus: `CUBE(dims)` computes every dimension subset's
    * aggregates — per-cell, per-margin, and the grand total — in ONE
    * aggregation (Catalyst's Expand: rows duplicated 2^|dims| ways
    * map-side, partial-agg combined before the single shuffle), where
    * the melt formulation needs the zero-fill matrix join and emits
    * only the 1-dim margins. `grouping()` flags ride along so a
    * margin's NULL is distinguishable from a genuinely-NULL dimension
    * value (tabloop's NA category).
    *
    * Trade (why both exist): Expand multiplies map-side rows by
    * 2^|dims| — at 100 TB keep dims to the 2-4 card dimensions and let
    * map-side combine collapse them; tabloop's melt grows rows by
    * |loops| instead and zero-fills, the better shape when loop vars
    * are many and margins are not wanted. */
  def cubeCard(df: DataFrame, dims: Seq[String],
      aggs: Seq[Column]): DataFrame = {
    val gFlags = dims.map(d => grouping(col(d)).cast("int").as(s"g_$d"))
    df.cube(dims.map(col): _*).agg((gFlags ++ aggs).head,
      (gFlags ++ aggs).tail: _*)
  }
}
