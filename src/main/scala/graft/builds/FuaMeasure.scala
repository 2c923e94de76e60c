package graft.builds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FUA ED-index-visit feeder — the reference's table-valued function
  * (create_stage.fn_perf_fua_ed_index_visit.sql): index visits are claims
  * carrying the qualifying PRIMARY diagnosis INTERSECTed with claims that
  * are ED visits by revenue code UNION ED visits by procedure code, all
  * within the measurement window, then age-filtered against member dob
  * with exact-anniversary arithmetic (the DATEDIFF(YEAR) - CASE WHEN
  * DATEADD(YEAR, ...) > date correction).
  *
  * Output feeds [[PerfMeasures]] as a monthly per-member fact via
  * `extraFacts` — the reference materializes the same set into its
  * perf-staging table before the measure dispatch.
  */
object FuaMeasure {

  /** T-SQL whole-years-between: year-diff minus one when the anniversary
    * (DATEADD-style, Feb-29 clamps to Feb-28) has not yet passed. */
  def ageAt(dob: Column, at: Column): Column = {
    val yd = year(at) - year(dob)
    yd - when(add_months(dob, yd * 12) > at, 1).otherwise(0)
  }

  /** All frames carry (id_person, claim_id, svc_date); demo carries
    * (id_person, dob). Returns qualifying index visits with member age. */
  def indexVisits(dxClaims: DataFrame, edRevClaims: DataFrame,
      edProcClaims: DataFrame, demo: DataFrame,
      startDate: String, endDate: String, minAge: Int): DataFrame = {
    def inWindow(df: DataFrame) = df.filter(
      col("svc_date").between(to_date(lit(startDate)), to_date(lit(endDate))))
      .select(col("id_person"), col("claim_id"), col("svc_date"))
    // ED by revenue code UNION (distinct) ED by procedure code, then
    // INTERSECT with the qualifying-dx claims — the reference's exact set
    // algebra (fn_perf_fua_ed_index_visit.sql get_claims CTE)
    val ed = inWindow(edRevClaims).union(inWindow(edProcClaims)).distinct()
    val idx = inWindow(dxClaims).intersect(ed)
    idx.join(demo.select(col("id_person"), col("dob")), Seq("id_person"))
      .withColumn("age", ageAt(col("dob"), col("svc_date")))
      .filter(col("age") >= minAge)
      .select(col("id_person"), col("claim_id"), col("svc_date"), col("age"))
  }

  /** FUA join step (create_stage.sp_perf_fua_join_step.sql:44-116):
    * index visits with the exclusion flags already attached (the
    * 31-day first-visit dedup is the q102 FUM greedy kernel, the
    * inpatient-within-30 flag the q96 FUH machinery) are
    *
    *  - filtered to ed_within_30_day = 0 AND
    *    inpatient_within_30_day = 0,
    *  - given `need_1_month_coverage` = 1 when last_service_date is
    *    the 1st of a 31-day month (the reference's continuous-
    *    enrollment bookkeeping quirk: a follow-up window starting
    *    there fits entirely inside one calendar month),
    *  - LEFT-joined to follow-up visits per person within
    *    [last_service_date, +7] and [+30] days, collapsed to one row
    *    per index visit with MAX(ISNULL(flag, 0)) per window.
    *
    * Plan shape: the reference runs TWO independent left joins (7-day
    * and 30-day) and groups over their cross product; here ONE range
    * join on the 30-day window carries both flags (the 7-day verdict is
    * a CASE inside the aggregate) — half the join work, provably the
    * same MAX semantics, and the q235 oracle replays the reference's
    * two-join formulation against it.
    *
    * `indexVisits` carries (id_person, claim_header_id,
    * first_service_date,
    * last_service_date, age, year_month, ed_within_30_day,
    * inpatient_within_30_day); `followUps` carries (id_person,
    * first_service_date) at follow-up grain. */
  def joinStep(indexVisits: DataFrame, followUps: DataFrame): DataFrame = {
    val idx = indexVisits
      .filter(col("ed_within_30_day") === 0 &&
        col("inpatient_within_30_day") === 0)
      .withColumn("need_1_month_coverage",
        (dayofmonth(col("last_service_date")) === 1 &&
          month(col("last_service_date")).isin(1, 3, 5, 7, 8, 10, 12))
          .cast("int"))
    val f = followUps.select(col("id_person").as("_fid"),
      col("first_service_date").as("_fd"))
    val keys = Seq("year_month", "id_person", "age", "claim_header_id",
      "first_service_date", "last_service_date", "ed_within_30_day",
      "inpatient_within_30_day", "need_1_month_coverage")
    idx.join(f, col("id_person") === col("_fid") &&
        col("_fd").between(col("last_service_date"),
          date_add(col("last_service_date"), 30)), "left")
      .groupBy(keys.map(col): _*)
      .agg(
        max(when(col("_fd").between(col("last_service_date"),
          date_add(col("last_service_date"), 7)), 1).otherwise(0))
          .as("follow_up_7_day"),
        max(when(col("_fd").isNotNull, 1).otherwise(0))
          .as("follow_up_30_day"))
      .withColumn("ed_index_visit", lit(1))
  }
}
