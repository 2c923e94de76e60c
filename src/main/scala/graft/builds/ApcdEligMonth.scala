package graft.builds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** APCD elig_month — month-grain coverage classification from the
  * OnPoint member-month detail (load_stage.apcd_elig_month.R):
  *
  *  - per (member, month): the 0-8 coverage-group code for each of the
  *    three domains (medical / pharmacy / dental) from the presence
  *    combination of that domain's medicaid / commercial / medicare
  *    eligibility ids, with 8 = "unknown market" when only the
  *    domain-level id is populated (:52-93);
  *  - the empirical dual flag: any-domain medicaid id AND any-domain
  *    medicare id (:46-50);
  *  - binary per-market flags decoded from the covgrp code —
  *    medicaid ∈ {1,4,5,7}, medicare ∈ {2,4,6,7}, commercial ∈
  *    {3,5,6,7}, unknown = 8 (:106-117);
  *  - geo attach: ZIP → county (zip-group type 'County'), ZIP → ACH
  *    (type 'Acc%'), county name → FIPS, geo_wa = county matched,
  *    geo_kc = King (:121-131);
  *  - month boundary dates from year_month, cov_time_day inclusive
  *    (:40-42, :132);
  *  - year / year_quarter period variables — the reference reads them
  *    off the ref_date calendar dim (:134-135); computed directly here
  *    (year_quarter = yyyyQ).
  *
  * Scale shape: one scan of member-month, entirely row-local except
  * three broadcast ref joins. No wide shuffle at all.
  */
object ApcdEligMonth {

  /** The 0-8 presence-combination coverage group (one domain). */
  def covgrp(mcaidId: Column, commercialId: Column, mcareId: Column,
      anyId: Column): Column =
    when(mcaidId.isNotNull && commercialId.isNull && mcareId.isNull, 1)
      .when(mcaidId.isNull && commercialId.isNull && mcareId.isNotNull, 2)
      .when(mcaidId.isNull && commercialId.isNotNull && mcareId.isNull, 3)
      .when(mcaidId.isNotNull && commercialId.isNull && mcareId.isNotNull, 4)
      .when(mcaidId.isNotNull && commercialId.isNotNull && mcareId.isNull, 5)
      .when(mcaidId.isNull && commercialId.isNotNull && mcareId.isNotNull, 6)
      .when(mcaidId.isNotNull && commercialId.isNotNull && mcareId.isNotNull, 7)
      .when(anyId.isNotNull, 8)
      .otherwise(0)

  private def marketFlags(grp: String, prefix: String): Seq[Column] = Seq(
    when(col(grp).isin(1, 4, 5, 7), 1).otherwise(0).as(s"${prefix}_medicaid"),
    when(col(grp).isin(2, 4, 6, 7), 1).otherwise(0).as(s"${prefix}_medicare"),
    when(col(grp).isin(3, 5, 6, 7), 1).otherwise(0)
      .as(s"${prefix}_commercial"),
    when(col(grp) === 8, 1).otherwise(0).as(s"${prefix}_unknown"))

  /** @param mm       member-month detail: internal_member_id, year_month
    *                 (yyyymm string), zip_code, and the nine per-domain
    *                 market ids + three domain-level ids
    * @param zipGroup (zip_code, zip_group_type_desc, zip_group_code,
    *                 zip_group_desc)
    * @param countyRef (geo_county_name, geo_county_code_fips) */
  def build(mm: DataFrame, zipGroup: DataFrame,
      countyRef: DataFrame): DataFrame = {
    val fromDate = to_date(concat(col("year_month"), lit("01")), "yyyyMMdd")
    val staged = mm.select(
      col("internal_member_id").as("id_apcd"),
      fromDate.as("from_date"),
      last_day(fromDate).as("to_date"),
      col("year_month"),
      col("zip_code"),
      ((coalesce(col("med_medicaid_eligibility_id"),
          col("rx_medicaid_eligibility_id"),
          col("dental_medicaid_eligibility_id")).isNotNull) &&
        (coalesce(col("med_medicare_eligibility_id"),
          col("rx_medicare_eligibility_id"),
          col("dental_medicare_eligibility_id")).isNotNull))
        .cast("int").as("dual"),
      covgrp(col("med_medicaid_eligibility_id"),
        col("med_commercial_eligibility_id"),
        col("med_medicare_eligibility_id"),
        col("medical_eligibility_id")).as("med_covgrp"),
      covgrp(col("rx_medicaid_eligibility_id"),
        col("rx_commercial_eligibility_id"),
        col("rx_medicare_eligibility_id"),
        col("pharmacy_eligibility_id")).as("pharm_covgrp"),
      covgrp(col("dental_medicaid_eligibility_id"),
        col("dental_commercial_eligibility_id"),
        col("dental_medicare_eligibility_id"),
        col("dental_eligibility_id")).as("dental_covgrp"))
    val county = zipGroup.filter(col("zip_group_type_desc") === "County")
      .select(col("zip_code"), col("zip_group_desc").as("geo_county"))
      .distinct()
    val ach = zipGroup.filter(col("zip_group_type_desc").startsWith("Acc"))
      .select(col("zip_code"), col("zip_group_code").as("geo_ach_code"),
        col("zip_group_desc").as("geo_ach"))
      .distinct()
    val fips = countyRef.select(
      col("geo_county_name").as("geo_county"),
      col("geo_county_code_fips").as("geo_county_code"))
    staged
      .join(broadcast(county), Seq("zip_code"), "left")
      .join(broadcast(ach), Seq("zip_code"), "left")
      .join(broadcast(fips), Seq("geo_county"), "left")
      .select(Seq(
        col("id_apcd"), col("from_date"), col("to_date"),
        col("year_month"),
        (substring(col("year_month"), 1, 4).cast("int") * 10 +
          ((substring(col("year_month"), 5, 2).cast("int") + 2) / 3)
            .cast("int")).as("year_quarter"),
        substring(col("year_month"), 1, 4).cast("int").as("year"),
        col("med_covgrp"), col("pharm_covgrp"), col("dental_covgrp")) ++
        marketFlags("med_covgrp", "med") ++
        marketFlags("pharm_covgrp", "pharm") ++
        marketFlags("dental_covgrp", "dental") ++ Seq(
        col("dual"),
        col("zip_code").as("geo_zip"),
        col("geo_county_code"), col("geo_county"),
        col("geo_ach_code"), col("geo_ach"),
        col("geo_county").isNotNull.cast("int").as("geo_wa"),
        when(col("geo_county") === "King", 1).otherwise(0).as("geo_kc"),
        (datediff(col("to_date"), col("from_date")) + 1)
          .as("cov_time_day")): _*)
  }
}
