package graft.builds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** stage.mcaid_perf_elig_member_month — the performance-measure member
  * month spine (create_stage.sp_mcaid_perf_elig_member_month.sql:20-105):
  *
  *  1. managed-care plan names collapse to the five MCO codes
  *     (AGP/CHP/CCW/MHW/UHC; the CCW code absorbs both Coordinated Care
  *     spellings), any other name — managed-care or not — to NULL
  *     (:28-37, including its `WHEN MC THEN NULL ELSE NULL` tail);
  *  2. rows gate through the King-County zip reference (INNER JOIN
  *     [ref].[apcd_zip] ... state = 'WA' AND county_name = 'King',
  *     :76-79);
  *  3. one row survives per (member, month): the longest coverage span
  *     (ROW_NUMBER ... ORDER BY DATEDIFF(day, from, to) DESC, :73-75).
  *
  * The reference's ROW_NUMBER orders by span length alone — ties fall to
  * physical order, which T-SQL leaves undefined. Per the repo's
  * determinism rule the window here adds (from_date, rac_code) as
  * tie-breaks, so the pick is a pure function of the data (same rows on
  * any cluster, any partitioning).
  *
  * Scale: the zip reference is a county's worth of zips — a broadcast
  * hash join against the member-month fact; the only exchange is the
  * (member, month) hash for the ranked pick, which is the output grain.
  * The feeding sp_mcaid_perf_distinct_member
  * (create_stage.sp_mcaid_perf_distinct_member.sql:17-24) is a DISTINCT
  * projection over the denominator spine — SURVEY §2.2 row 16's
  * operator, no separate kernel needed.
  */
object PerfMemberMonth {

  /** The MCO name→code CASE (:28-37), verbatim. */
  def mcoCode(covType: Column, name: Column): Column =
    when(covType === "MC" &&
      name === "Amerigroup Washington Inc", "AGP")
      .when(covType === "MC" &&
        name === "Community Health Plan of Washington", "CHP")
      .when(covType === "MC" && name.isin(
        "Coordinated Care Corporation",
        "Coordinated Care of Washington"), "CCW")
      .when(covType === "MC" &&
        name === "Molina Healthcare of Washington Inc", "MHW")
      .when(covType === "MC" &&
        name === "United Health Care Community Plan", "UHC")
      .otherwise(lit(null).cast("string"))

  /** @param elig     member-month rows: clndr_year_mnth,
    *                 medicaid_recipient_id, rprtbl_rac_code, from_date,
    *                 to_date, coverage_type_ind, mc_prvdr_name,
    *                 dual_elig, tpl_full_flag, rsdntl_postal_code
    * @param kingZips the King-County slice of the zip reference
    *                 (already filtered; one `zip_code` column used) */
  def build(elig: DataFrame, kingZips: DataFrame): DataFrame = {
    val mapped = elig.withColumn("mc_prvdr_name",
      mcoCode(col("coverage_type_ind"), col("mc_prvdr_name")))
    val gated = mapped.join(
      broadcast(kingZips.select(col("zip_code")).distinct()),
      col("rsdntl_postal_code") === col("zip_code"))
    val w = Window
      .partitionBy(col("medicaid_recipient_id"), col("clndr_year_mnth"))
      .orderBy(datediff(col("to_date"), col("from_date")).desc,
        col("from_date"), col("rprtbl_rac_code"),
        col("mc_prvdr_name").asc_nulls_first, col("dual_elig"),
        col("tpl_full_flag"))
    gated
      .withColumn("row_num", row_number().over(w))
      .filter(col("row_num") === 1)
      .drop("row_num", "zip_code")
  }
}
