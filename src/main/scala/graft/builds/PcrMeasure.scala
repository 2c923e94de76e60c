package graft.builds

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Intervals

/** PCR (Plan All-Cause Readmissions) feeder — the reference's
  * direct-transfer stitching + readmission join step
  * (create_stage.v_perf_ah_inpatient_direct_transfer.sql and its
  * PCR-named twin create_stage.v_perf_pcr_inpatient_direct_transfer.sql
  * :44-203 — same Inpatient-Stay-minus-Nonacute EXCEPT, same 1-day
  * lag/increment/episode_id chain, same stay/death windows; the PCR
  * variant additionally joins elig_demo for the anniversary age, which
  * [[graft.functions.DateFns.ageYears]] carries,
  * create_stage.v_perf_pcr_pregnancy_exclusion.sql,
  * create_stage.v_perf_pcr_planned_exclusion.sql,
  * create_stage.sp_perf_pcr_join_step.sql).
  *
  * Shape: acute inpatient claims within 1 day of each other chain into one
  * episode (the lag/flag/running-sum island kernel, reused from
  * [[Intervals.islandIds]] — not a bespoke loop), then episode-level
  * windows derive stay ranks and death flags, and the join step
  * self-joins surviving index episodes on the person key with a 30-day
  * range residual. Every window partitions by person (+ episode), every
  * join shuffles on the person id — no global ordering anywhere; the
  * reference's trailing global DENSE_RANK surrogate id is deliberately
  * NOT reproduced (the composite (id_person, episode_id) key carries the
  * same identity without a single-partition window).
  */
object PcrMeasure {

  /** Stays within 1 day chain into episodes
    * (v_perf_ah_inpatient_direct_transfer.sql): episode_id via the island
    * kernel, stay_id/count/death/diagnosis via episode windows.
    *
    * Input: (id_person, claim_id, first_service_date, last_service_date,
    * patient_status, primary_diagnosis) — acute inpatient claims only.
    *
    * Two deliberate divergences, both for nested stays (a long stay fully
    * containing a later-sorted short one): the reference's lag-based
    * increment would OPEN A NEW EPISODE inside the long stay's extent
    * (its lag(last_service_date) sees only the nested short stay), and
    * its LAST_VALUE episode end under-reports the extent. We chain
    * against the running max of preceding to-dates
    * ([[Intervals.islandIdsByExtent]]) and take MAX(to) — identical on
    * the sequential transfer chains the reference was written for,
    * correct when claims nest. */
  def directTransfer(stays: DataFrame): DataFrame = {
    val ep = Intervals.islandIdsByExtent(stays, Seq("id_person"),
        "first_service_date", "last_service_date", maxGapDays = 1,
        tieBreak = Seq("claim_id"))
      .withColumnRenamed("island_id", "episode_id")
    val wEp = Window.partitionBy(col("id_person"), col("episode_id"))
    val wOrd = wEp.orderBy(col("first_service_date"),
      col("last_service_date"), col("claim_id"))
    val wAll = wOrd.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    ep
      .withColumn("episode_first_service_date",
        min(col("first_service_date")).over(wEp))
      .withColumn("episode_last_service_date",
        max(col("last_service_date")).over(wEp))
      .withColumn("count_stays", count(lit(1)).over(wEp))
      .withColumn("stay_id", row_number().over(wOrd))
      .withColumn("death_during_stay",
        max(when(col("patient_status") === "20", 1).otherwise(0)).over(wEp))
      .withColumn("episode_primary_diagnosis",
        first(col("primary_diagnosis")).over(wAll))
  }

  /** Pregnancy-related stay exclusion
    * (v_perf_pcr_pregnancy_exclusion.sql): inpatient INTERSECT
    * pregnancy/perinatal principal-dx, EXCEPT nonacute. Frames are
    * (id_person, claim_id) pairs. */
  def pregnancyExclusion(inpatient: DataFrame, pregDx: DataFrame,
      nonacute: DataFrame): DataFrame =
    inpatient.intersect(pregDx).except(nonacute)
      .withColumn("flag", lit(1))

  /** Planned-stay exclusion (v_perf_pcr_planned_exclusion.sql):
    * (inpatient FOR each planned value set) UNIONed, plus potentially-
    * planned procedures EXCEPT acute principal-dx, all EXCEPT nonacute. */
  def plannedExclusion(inpatient: DataFrame, planned: Seq[DataFrame],
      potentiallyPlanned: DataFrame, acuteDx: DataFrame,
      nonacute: DataFrame): DataFrame = {
    val direct = planned.map(p => inpatient.intersect(p))
    val pp = inpatient.intersect(potentiallyPlanned)
      .except(inpatient.intersect(acuteDx))
    (direct :+ pp).reduce(_ union _).except(nonacute)
      .withColumn("flag", lit(1))
  }

  /** The join step (sp_perf_pcr_join_step.sql):
    *
    * 1. Attach exclusions to stitched episodes — pregnancy aggregates over
    *    the WHOLE episode (both the original stay and the transfer stay
    *    identify the exclusion), planned attaches to the FIRST stay only.
    * 2. Index stays = first stay of each episode, surviving death /
    *    same-day / pregnancy exclusions.
    * 3. Self-join: the first episode starting within 30 days after the
    *    index discharge is the candidate readmission (row_number by
    *    readmission start; episode_id breaks start-date ties so the pick
    *    is stable across engines); drop the index stay entirely when that
    *    first readmission was planned. Readmission candidates are drawn
    *    from the SAME exclusion-filtered set as the index stays — the
    *    reference's sp_perf_pcr_join_step self-joins
    *    #index_hospital_stay to itself, so an episode removed by the
    *    death/same-day/pregnancy exclusions is invisible on the
    *    readmission side too; replicated faithfully.
    *
    * Returns one row per surviving index episode with the readmission
    * window, flag, and day gap. */
  def joinStep(transfers: DataFrame, pregnancy: DataFrame,
      planned: DataFrame): DataFrame = {
    val wEp = Window.partitionBy(col("id_person"), col("episode_id"))
    val joined = transfers
      .join(pregnancy.select(col("claim_id"), col("flag").as("preg_flag")),
        Seq("claim_id"), "left")
      .join(planned.select(col("claim_id"), col("flag").as("pl_flag")),
        Seq("claim_id"), "left")
      .withColumn("pregnancy_exclusion",
        coalesce(max(col("preg_flag")).over(wEp), lit(0)))
      .withColumn("planned_exclusion",
        coalesce(when(col("stay_id") === 1, col("pl_flag")), lit(0)))
      .withColumn("same_day_admit_discharge",
        (col("episode_first_service_date") ===
          col("episode_last_service_date")).cast("int"))
    val index = joined
      .filter(col("stay_id") === 1 && col("death_during_stay") === 0 &&
        col("same_day_admit_discharge") === 0 &&
        col("pregnancy_exclusion") === 0)
      .select(col("id_person"), col("episode_id"),
        col("episode_first_service_date"), col("episode_last_service_date"),
        col("planned_exclusion"))
    val b = index.select(col("id_person").as("b_id"),
      col("episode_id").as("b_ep"),
      col("episode_first_service_date").as("b_first"),
      col("episode_last_service_date").as("b_last"),
      col("planned_exclusion").as("b_planned"))
    val wFirst = Window.partitionBy(col("id_person"), col("episode_id"))
      .orderBy(col("b_first").asc_nulls_last, col("b_ep").asc_nulls_last)
    index.join(b,
        col("id_person") === col("b_id") &&
        col("b_first").between(
          date_add(col("episode_last_service_date"), 1),
          date_add(col("episode_last_service_date"), 30)), "left")
      .withColumn("row_num", row_number().over(wFirst))
      .filter(col("row_num") === 1 &&
        (col("b_planned").isNull || col("b_planned") === 0))
      .select(
        (year(col("episode_first_service_date")) * 100 +
          month(col("episode_first_service_date"))).as("ym"),
        col("id_person"), col("episode_id"),
        col("episode_first_service_date"), col("episode_last_service_date"),
        lit(1).as("inpatient_index_stay"),
        col("b_first").as("readmission_first_service_date"),
        col("b_last").as("readmission_last_service_date"),
        col("b_first").isNotNull.cast("int").as("readmission_flag"),
        datediff(col("b_first"), col("episode_last_service_date"))
          .as("date_diff"),
        col("b_planned").as("planned_readmission"))
  }
}
