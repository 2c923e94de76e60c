package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental SCD type-2 merge — the lifecycle kernel behind the
  * reference's *_timevar history tables (from_date/to_date versioned
  * attributes): the monthly build re-derives history from scratch
  * (elig_timevar.R); at 100 TB the incremental form matters — a delta
  * extract arrives, and only rows whose attributes CHANGED get a new
  * version, with the open version closed at eff_date - 1.
  *
  * Semantics (standard type 2, one change per batch):
  *  - open row, no delta row        -> kept open (absence is not a change)
  *  - open row, delta, attrs equal  -> kept open (NULL-safe compare)
  *  - open row, delta, attrs differ -> closed at eff - 1 day + new open
  *  - delta for an unknown id       -> new open row
  *  - closed history rows           -> pass through untouched
  *
  * Scale shape: one id-keyed FULL OUTER join between the OPEN slice and
  * the delta (both a fraction of the history table), closed history
  * passes through with no shuffle at all. The reference's from-scratch
  * rebuild reads every claim ever; this reads the delta + the open
  * frontier.
  */
object Scd2 {

  /** `dim` carries (idCol, attrCols..., from_date, to_date NULL=open);
    * `delta` carries (idCol, attrCols..., effDateCol).
    *
    * A delta carrying SEVERAL versions of one id is pre-collapsed to the
    * latest per id (max eff date; equal-date ties broken by the attr
    * values, total order) — the batch-merge semantics: intermediate
    * same-batch states were never the open version at any batch
    * boundary, so only the final state versions. Without the collapse,
    * two delta rows for one id would silently produce two open rows
    * (corrupted history). */
  def merge(dim: DataFrame, delta: DataFrame, idCol: String,
      attrCols: Seq[String], effDateCol: String): DataFrame = {
    val open = dim.filter(col("to_date").isNull)
    val closed = dim.filter(col("to_date").isNotNull)
    import org.apache.spark.sql.expressions.Window
    val wLatest = Window.partitionBy(col(idCol))
      .orderBy(col("_eff").desc +:
        attrCols.map(c => col(s"_d_$c").cast("string").asc_nulls_first): _*)
    val d = delta.select(col(idCol) +:
      attrCols.map(c => col(c).as(s"_d_$c")) :+
      col(effDateCol).as("_eff"): _*)
      .withColumn("_rn", row_number().over(wLatest))
      .filter(col("_rn") === 1).drop("_rn")
    val j = open.join(d, Seq(idCol), "full")
    val changed = attrCols.map(c => !(col(s"_d_$c") <=> col(c)))
      .reduce(_ || _)
    val dimCols = Seq(col(idCol)) ++ attrCols.map(col) ++
      Seq(col("from_date"), col("to_date"))
    val kept = j
      .filter(col("from_date").isNotNull && (col("_eff").isNull || !changed))
      .select(dimCols: _*)
    val closedOut = j
      .filter(col("from_date").isNotNull && col("_eff").isNotNull && changed)
      .select(Seq(col(idCol)) ++ attrCols.map(col) ++
        Seq(col("from_date"),
          date_sub(col("_eff"), 1).as("to_date")): _*)
    val opened = j
      .filter(col("_eff").isNotNull && (col("from_date").isNull || changed))
      .select(Seq(col(idCol)) ++
        attrCols.map(c => col(s"_d_$c").as(c)) ++
        Seq(col("_eff").as("from_date"),
          lit(null).cast("date").as("to_date")): _*)
    closed.select(dimCols: _*)
      .unionByName(kept).unionByName(closedOut).unionByName(opened)
  }
}
