package graft.builds

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Intervals

/** The reference's central analytic table — elig_timevar: one row per
  * entity per contiguous period over which all time-varying attributes are
  * constant (load_stage.mcaid_elig_timevar.R:51-507, SURVEY §1.1/§7.2
  * phase 2), composed from the engine's temporal kernel:
  *
  *  step 1  person-month staging: per (entity, month) the modal attribute
  *          (dedup-to-row-1 idiom, :160-166) and observed sub-dates
  *  step 2  sub-month trimming: month boundaries clipped to the observed
  *          sub-dates via window MIN/MAX (:211-233)
  *  step 3  gaps-and-islands over (entity, attribute): contiguous months
  *          with constant attributes share an island (:287-374)
  *  step 4  collapse to interval rows min(from)/max(to) (:375-385)
  *  step 5  final measures: cov_time_day and the `contiguous` flag vs the
  *          entity's previous interval (:282-417)
  *
  * Scale: every window partitions on the entity id (one shuffle reused
  * through steps 2-5); rows per entity are bounded by months x attributes.
  */
object EligTimevar {

  /** @param events (user_id, ts, event_type) activity stream standing in
    *               for the member-month eligibility extract
    */
  def build(events: DataFrame): DataFrame = {
    // step 1: person-month attribute staging — modal event_type per month
    // (count desc, value asc tie-break: the dedup-to-row-1 idiom) and
    // observed min/max days
    val days = events.select(col("user_id"), to_date(col("ts")).as("day"),
      col("event_type"))
      .filter(col("event_type").isNotNull)
      .withColumn("month", to_date(date_trunc("MONTH", col("day"))))
    val counted = days.groupBy(col("user_id"), col("month"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), min(col("day")).as("d_min"),
        max(col("day")).as("d_max"))
    val wRank = Window.partitionBy(col("user_id"), col("month"))
      .orderBy(col("cnt").desc, col("event_type"))
    val monthly = counted
      .withColumn("rn", row_number().over(wRank))
      .groupBy(col("user_id"), col("month"))
      .agg(max(when(col("rn") === 1, col("event_type"))).as("attr"),
        min(col("d_min")).as("sub_from"), max(col("d_max")).as("sub_to"))

    // step 2: sub-month trim — clip month boundaries to observed sub-dates
    val trimmed = monthly.select(col("user_id"), col("attr"),
      greatest(col("month"), col("sub_from")).as("from_date"),
      least(last_day(col("month")), col("sub_to")).as("to_date"))

    // steps 3+4: islands over (entity, attr), collapse to intervals.
    // maxGapDays=1 merges intervals abutting across a month boundary
    // (to_date at month end, next from_date at month start).
    val collapsed = Intervals.collapseIntervals(trimmed,
      ids = Seq("user_id"), from = "from_date", to = "to_date",
      maxGapDays = 1, attrs = Seq("attr"))

    // step 5: final measures
    val wPrev = Window.partitionBy(col("user_id"))
      .orderBy(col("from_date"), col("to_date"))
    collapsed
      .withColumn("cov_time_day",
        (datediff(col("to_date"), col("from_date")) + 1).cast("int"))
      .withColumn("contiguous",
        coalesce(datediff(col("from_date"), lag(col("to_date"), 1).over(wPrev))
          === 1, lit(false)))
      .select(col("user_id"), col("from_date"), col("to_date"), col("attr"),
        col("cov_time_day"), col("contiguous"))
  }
}
