package graft.builds

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.DateFns

/** Enroll-provider attribution — the reference's
  * create_stage.sp_mcaid_perf_enroll_provider.sql: for every measurement
  * month, attribute each member to ONE plan (an MCO name or 'FFS') — the
  * plan with the most coverage months in the trailing 12-month window,
  * current-month enrollment breaking ties.
  *
  * Shape: (member x plan) universe CROSS JOIN a broadcast month spine,
  * left-join the member-month facts, one trailing-window sum per
  * (member, plan), one tie-break window per (member, month). The
  * reference's spine row_num is a global ROW_NUMBER over ref.perf_year_month
  * — here it's month arithmetic off the lookback start (no global window;
  * GlobalWindowGuard would rightly reject one). The reference's tie-break
  * (coverage DESC, flag DESC) is nondeterministic between equally-covered
  * plans; plan name ASC is appended so the pick is stable across engines.
  */
object EnrollProvider {

  /** @param memberMonths (id_person, month [month-truncated date],
    *                     mco_or_ffs) enrollment facts
    * @param startDate    first measurement month (inclusive, month start)
    * @param endDate      last measurement month (inclusive, month start)
    * @param windowMonths trailing window width (12 in the reference)
    */
  def build(memberMonths: DataFrame, startDate: String, endDate: String,
      windowMonths: Int = 12): DataFrame = {
    val s = memberMonths.sparkSession
    // look-back spine: the reference pulls from [12_month_prior] of the
    // start month so the first in-window month has a full trailing frame
    val lookStart = add_months(to_date(lit(startDate)), -(windowMonths - 1))
    val months = s.range(1).select(explode(sequence(
      lookStart, to_date(lit(endDate)), expr("interval 1 month"))).as("month"))
    val mmf = memberMonths
      .filter(col("month").between(lookStart, to_date(lit(endDate))))
      .select(col("id_person"), col("mco_or_ffs"), col("month"))
      .distinct()
      .withColumn("flag", lit(1))
    val universe = mmf.select(col("id_person"), col("mco_or_ffs")).distinct()
    val grid = universe.crossJoin(broadcast(months))
    val staged = grid
      .join(mmf, Seq("id_person", "mco_or_ffs", "month"), "left")
      .na.fill(0, Seq("flag"))
    val w12 = Window.partitionBy(col("id_person"), col("mco_or_ffs"))
      .orderBy(col("month")).rowsBetween(-(windowMonths - 1), 0)
    val wTie = Window.partitionBy(col("id_person"), col("month"))
      .orderBy(col("coverage_months_t_12_m").desc, col("flag").desc,
        col("mco_or_ffs"))
    staged
      .withColumn("coverage_months_t_12_m", sum(col("flag")).over(w12))
      .withColumn("row_num",
        (months_between(col("month"), lookStart) + 1).cast("int"))
      .withColumn("tie_breaker", row_number().over(wTie))
      .filter(col("row_num") >= windowMonths &&
        col("coverage_months_t_12_m") >= 1 && col("tie_breaker") === 1 &&
        col("month") >= to_date(lit(startDate)))
      .select(DateFns.dateToYyyymm(col("month")).as("year_month"),
        when(month(col("month")).isin(3, 6, 9, 12), 1).otherwise(0)
          .as("end_quarter"),
        col("id_person"), col("mco_or_ffs"), col("coverage_months_t_12_m"))
  }
}
