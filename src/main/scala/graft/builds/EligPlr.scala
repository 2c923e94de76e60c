package graft.builds

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Intervals

/** elig_plr — the per-person-per-year coverage rollup
  * (load_stage.apcd_elig_plr.R:42-120): for each coverage flavor (medical /
  * pharmacy / dental analog), merge that flavor's intervals, count the days
  * falling inside the calendar-year window (the reference's 4-branch
  * overlap CASE ×12 repetitions = one [[Intervals.clipDays]]), and emit one
  * row per person with per-flavor day counts and percent-of-year columns,
  * plus the any-flavor union.
  *
  * Merging uses a RUNNING MAX of the to-date (not lag) so an interval
  * contained inside an earlier long one never splits an island — raw
  * coverage feeds overlap freely, unlike the month-grid inputs of
  * [[Intervals.islandIds]].
  *
  * Scale: one shuffle on (id, flavor) for the merge windows, one partial
  * aggregation to person grain; the flavor pivot is a fixed-width
  * conditional aggregation, not a join per flavor (the reference scans the
  * elig table once per flavor — we scan once, total).
  */
object EligPlr {

  /** Merge overlapping/adjacent intervals per (ids, attrs) group. */
  def mergeIntervals(df: DataFrame, ids: Seq[String], from: String,
      to: String, attrs: Seq[String] = Nil): DataFrame = {
    val part = (ids ++ attrs).map(col)
    val w = Window.partitionBy(part: _*).orderBy(col(from), col(to))
    val prevMaxTo = max(col(to))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val isStart = when(prevMaxTo.isNull ||
      col(from) > date_add(prevMaxTo, 1), 1).otherwise(0)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Intervals.collapse(
      df.withColumn("island_id", sum(isStart).over(run)),
      ids, from, to, attrs)
  }

  /** @param intervals (id, flavor, from_date, to_date) coverage rows;
    *                   flavors may overlap and repeat freely
    * @param flavors    the fixed flavor domain → output column suffixes
    * @param yearFrom   calendar window start (inclusive), e.g. 1996-01-01
    * @param yearTo     calendar window end (inclusive), e.g. 1996-12-31 */
  def build(intervals: DataFrame, flavors: Seq[String],
      yearFrom: String, yearTo: String): DataFrame = {
    val wFrom = to_date(lit(yearFrom))
    val wTo = to_date(lit(yearTo))
    val yearDays = datediff(wTo, wFrom) + 1

    // per-flavor merged intervals, clipped to the year
    val perFlavor = mergeIntervals(intervals, Seq("id"), "from_date",
        "to_date", attrs = Seq("flavor"))
      .withColumn("days",
        Intervals.clipDays(col("from_date"), col("to_date"), wFrom, wTo))
      .groupBy(col("id"), col("flavor"))
      .agg(sum(col("days")).as("days"))

    // any-flavor union: merge ignoring the flavor attribute
    val any = mergeIntervals(intervals, Seq("id"), "from_date", "to_date")
      .withColumn("days",
        Intervals.clipDays(col("from_date"), col("to_date"), wFrom, wTo))
      .groupBy(col("id"))
      .agg(sum(col("days")).as("days_any"))

    def pct(days: org.apache.spark.sql.Column) =
      round(days * 100.0 / yearDays, 1).cast("decimal(4,1)")

    val aggs = flavors.flatMap { f =>
      val d = coalesce(sum(when(col("flavor") === f, col("days"))), lit(0L))
      Seq(d.as(s"days_$f"), pct(d).as(s"pct_$f"))
    }
    val pivoted = perFlavor.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)

    pivoted.join(any, Seq("id"), "left")
      .withColumn("days_any", coalesce(col("days_any"), lit(0L)))
      .withColumn("pct_any", pct(col("days_any")))
  }
}
