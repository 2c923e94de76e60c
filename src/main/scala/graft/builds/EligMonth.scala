package graft.builds

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Intervals

/** Distilled elig_month build — the person-month densified grid
  * (load_stage.mcaid_elig_month.R:79-130, SURVEY §1.1): activity intervals
  * exploded onto a month spine via `sequence()`, with covered-days-in-month
  * and full-month flags.
  *
  * Scale: the explode is per interval row (bounded by interval length in
  * months), not a cross join against a global spine — the grid a member
  * never touches is never materialized. */
object EligMonth {

  /** @param activity (id, day) date-grained activity
    * @param maxGapDays island gap tolerance before a new interval opens */
  def build(activity: DataFrame, id: String, day: String,
      maxGapDays: Int = 30): DataFrame = {
    val days = activity.select(col(id), col(day).as("day")).distinct()
      .withColumn("day_to", col("day"))
    val intervals = Intervals.collapseIntervals(days,
      ids = Seq(id), from = "day", to = "day_to", maxGapDays = maxGapDays)
    intervals
      .withColumn("month", explode(sequence(
        to_date(date_trunc("MONTH", col("day"))),
        to_date(date_trunc("MONTH", col("day_to"))),
        expr("interval 1 month"))))
      .groupBy(col(id), col("month"))
      .agg(sum(Intervals.clipDays(col("day"), col("day_to"),
        col("month"), last_day(col("month")))).as("cov_days"))
      .withColumn("full_month",
        col("cov_days") === datediff(last_day(col("month")), col("month")) + 1)
  }
}
