package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's signature aggregate: per entity, the value of a
  * time-varying attribute weighted by coverage days, ties broken by value
  * order (R/claims_elig.R:788-881 `timevar_gen_sql`, instantiated ~20x).
  *
  * Formulation: partial-aggregatable groupBy(id, value).sum(weight) followed
  * by a row_number window over the (small) per-entity distinct-value set.
  * Map-side combine keeps the shuffle proportional to distinct (id, value)
  * pairs, not raw rows, so this scales to 100 TB inputs.
  */
object WeightedMode {

  /** One column: returns (ids..., outName) with the weighted-modal value. */
  def weightedMode(df: DataFrame, ids: Seq[String], value: String,
      weight: String, outName: String): DataFrame = {
    val summed = df
      .filter(col(value).isNotNull)
      .groupBy((ids :+ value).map(col): _*)
      .agg(sum(col(weight)).as("_wm_wt"))
    val w = Window.partitionBy(ids.map(col): _*)
      .orderBy(col("_wm_wt").desc, col(value).asc)
    summed
      .withColumn("_wm_rn", row_number().over(w))
      .filter(col("_wm_rn") === 1)
      .select(ids.map(col) :+ col(value).as(outName): _*)
  }

  /** Many columns in ONE pass: melts the requested attributes to
    * (id, attr, value) long form, weight-sums, ranks, and pivots back.
    * Replaces the reference's ~20 self-joins of the timevar table with a
    * single shuffle (R/claims_elig.R:1360-1398 LEFT JOINs one subquery per
    * variable; at scale that is ~20 scans of the largest table). The melt
    * itself is an explode, not a union of per-attribute selects — a union
    * re-plans the base scan per attribute. */
  def weightedModes(df: DataFrame, ids: Seq[String], values: Seq[String],
      weight: String): DataFrame = {
    val gs = values.map(v => struct(lit(v).as("_wm_attr"),
      col(v).cast("string").as("_wm_val")))
    val melted = df
      .select(ids.map(col) :+ col(weight).as("_wm_w") :+
        explode(array(gs: _*)).as("_g"): _*)
      .select(ids.map(col) :+ col("_g._wm_attr").as("_wm_attr") :+
        col("_g._wm_val").as("_wm_val") :+ col("_wm_w"): _*)
      .filter(col("_wm_val").isNotNull)
    val summed = melted
      .groupBy((ids.map(col) :+ col("_wm_attr") :+ col("_wm_val")): _*)
      .agg(sum(col("_wm_w")).as("_wm_wt"))
    val w = Window.partitionBy((ids.map(col) :+ col("_wm_attr")): _*)
      .orderBy(col("_wm_wt").desc, col("_wm_val").asc)
    summed
      .withColumn("_wm_rn", row_number().over(w))
      .filter(col("_wm_rn") === 1)
      .groupBy(ids.map(col): _*)
      .pivot("_wm_attr", values)
      .agg(first(col("_wm_val")))
  }

  /** Most-recent-value pick (gender_recent/race_recent —
    * load_stage.mcaid_elig_demo.R:172-181,273-293): the value observed at
    * the entity's max `orderCol`, ties by ascending value. */
  def mostRecent(df: DataFrame, ids: Seq[String], value: String,
      orderCol: String, outName: String): DataFrame = {
    val w = Window.partitionBy(ids.map(col): _*)
      .orderBy(col(orderCol).desc, col(value).asc)
    df.filter(col(value).isNotNull)
      .withColumn("_mr_rn", row_number().over(w))
      .filter(col("_mr_rn") === 1)
      .select(ids.map(col) :+ col(value).as(outName): _*)
  }

  /** Plain (unweighted) mode with deterministic tie-break, as used for the
    * most-reported-DOB pick (load_stage.mcaid_elig_demo.R:93-118). Extra
    * `tieBreak` columns are max-aggregated before ranking. */
  def mode(df: DataFrame, ids: Seq[String], value: String, outName: String,
      tieBreakDesc: Seq[String] = Nil): DataFrame = {
    val aggs = count(lit(1)).as("_m_cnt") +:
      tieBreakDesc.map(c => max(col(c)).as("_m_" + c))
    val counted = df.filter(col(value).isNotNull)
      .groupBy((ids :+ value).map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val ord = (col("_m_cnt").desc +:
      tieBreakDesc.map(c => col("_m_" + c).desc)) :+ col(value).asc
    val w = Window.partitionBy(ids.map(col): _*).orderBy(ord: _*)
    counted.withColumn("_m_rn", row_number().over(w))
      .filter(col("_m_rn") === 1)
      .select(ids.map(col) :+ col(value).as(outName): _*)
  }
}
