package graft.builds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** APCD elig_timevar — the reference's 4-step all-payer variant
  * (load_stage.apcd_elig_timevar.R:20-130), sibling of the mcaid 5-step
  * build (EligTimevar):
  *
  *   1. member-month rows → (from_date, to_date) month spans, an empirical
  *      dual flag (any-medicaid AND any-medicare id present), and a
  *      per-family coverage group: the 8-way presence combination of
  *      (medicaid, commercial, medicare) ids, 8 = unknown market, 0 = no
  *      coverage (:28-71);
  *   2. contiguous-month islands per (person, zip, all three covgrps,
  *      dual) via the month-index-minus-row_number arithmetic (:78-88 —
  *      §2.5 gaps-and-islands variant B);
  *   3. collapse each island to one span with cov_time_day (:91-101);
  *   4. a contiguous-with-prior-row flag via LAG over the collapsed spans
  *      (:104-112).
  *
  * Scale: steps 1-3 are one shuffle on the island partition key (the
  * window and the collapse groupBy share it); step 4 is one more window
  * pass partitioned by person. No joins at all.
  */
object EligTimevarApcd {

  /** The reference's 8-way presence CASE, shared by the med/pharm/dental
    * families. */
  def covgrp(mcaid: Column, comm: Column, mcare: Column,
      anyId: Column): Column =
    when(mcaid.isNotNull && comm.isNull && mcare.isNull, 1)
      .when(mcaid.isNull && comm.isNull && mcare.isNotNull, 2)
      .when(mcaid.isNull && comm.isNotNull && mcare.isNull, 3)
      .when(mcaid.isNotNull && comm.isNull && mcare.isNotNull, 4)
      .when(mcaid.isNotNull && comm.isNotNull && mcare.isNull, 5)
      .when(mcaid.isNull && comm.isNotNull && mcare.isNotNull, 6)
      .when(mcaid.isNotNull && comm.isNotNull && mcare.isNotNull, 7)
      .when(anyId.isNotNull, 8)
      .otherwise(0)

  /** @param monthDetail one row per (person, month): `id_person`,
    *        `year_month` (yyyyMM int), `zip_code`, and per family f in
    *        {med, rx, dental}: `{f}_mcaid_id`, `{f}_comm_id`,
    *        `{f}_mcare_id`, `{f}_any_id` (nullable presence markers). */
  def build(monthDetail: DataFrame): DataFrame = {
    val fromDate = to_date(concat(col("year_month").cast("string"), lit("01")),
      "yyyyMMdd")
    def fam(f: String) = covgrp(col(s"${f}_mcaid_id"), col(s"${f}_comm_id"),
      col(s"${f}_mcare_id"), col(s"${f}_any_id"))
    val anyMcaid = col("med_mcaid_id").isNotNull ||
      col("rx_mcaid_id").isNotNull || col("dental_mcaid_id").isNotNull
    val anyMcare = col("med_mcare_id").isNotNull ||
      col("rx_mcare_id").isNotNull || col("dental_mcare_id").isNotNull
    val step1 = monthDetail.select(
      col("id_person"),
      fromDate.as("from_date"),
      date_add(add_months(fromDate, 1), -1).as("to_date"),
      col("zip_code"),
      (anyMcaid && anyMcare).cast("int").as("dual_flag"),
      fam("med").as("med_covgrp"),
      fam("rx").as("pharm_covgrp"),
      fam("dental").as("dental_covgrp"))
    val grpKeys = Seq("id_person", "zip_code", "med_covgrp", "pharm_covgrp",
      "dental_covgrp", "dual_flag")
    val wIsl = Window.partitionBy(grpKeys.map(col): _*).orderBy(col("from_date"))
    val monthIdx = year(col("from_date")) * 12 + month(col("from_date"))
    val islands = step1.distinct()
      .withColumn("group_num", monthIdx - row_number().over(wIsl))
    val collapsed = islands
      .groupBy((grpKeys :+ "group_num").map(col): _*)
      .agg(min(col("from_date")).as("from_date"),
        max(col("to_date")).as("to_date"))
      .withColumn("cov_time_day",
        datediff(col("to_date"), col("from_date")) + 1)
      .drop("group_num")
    val wPrior = Window.partitionBy(col("id_person")).orderBy(col("from_date"))
    collapsed.withColumn("contiguous",
      (datediff(col("from_date"), lag(col("to_date"), 1).over(wPrior)) === 1)
        .cast("int"))
      .na.fill(0, Seq("contiguous"))
      .select(col("id_person"), col("from_date"), col("to_date"),
        col("contiguous"), col("med_covgrp"), col("pharm_covgrp"),
        col("dental_covgrp"), col("dual_flag"), col("zip_code"),
        col("cov_time_day"))
  }
}
