package graft.builds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** mcare claim_pharm — administered facility drugs + Part D fills
  * (load_stage.mcare_claim_pharm.R):
  *
  *  - five facility arms (hha / hospice / inpatient / outpatient /
  *    snf), each: NDC-bearing revenue-center lines (`rev_cntr_ide_ndc_
  *    upc_num` non-null and first char not A-Z — the T-SQL `not like
  *    '[A-Z]'` charclass), base-claim thru-date lookup, the ResDAC
  *    facility denial rule (`clm_mdcr_non_pmt_rsn_cd` empty or NULL —
  *    lines with NO base claim row pass, faithfully), enrollment
  *    existence, NDC right-padded to 11, Part-D-only columns NULL;
  *  - three Part D arms over drifted schemas: the current `mcare_pde`
  *    (whose enrollment "filter" sits in the LEFT JOIN's ON clause and
  *    therefore excludes nothing — reference quirk at :268-277, kept),
  *    `mcare_pde_2014` (same names, `ncvrd_plan_pd_amt` NULL), and the
  *    split `mcare_pde_a`/`mcare_pde_b` schema (renamed columns,
  *    properly WHERE-filtered enrollment); prescriber NPI kept only
  *    under qualifier '1'/'01';
  *  - UNION distinct across all arms.
  *
  * The reference's facility enrollment check is a LEFT JOIN + WHERE
  * IS NOT NULL over a per-year enrollment table — a fan-out the final
  * UNION distinct re-collapses; the LEFT SEMI here is the
  * fan-out-free plan with the same distinct output.
  *
  * Money/quantity columns land as doubles; the reference's
  * numeric(19,3)/numeric(38,3) storage casts belong to the sink DDL
  * (rounding at compute time would tie-break differently per engine).
  *
  * Scale shape: per arm one claim-keyed broadcast-or-shuffle lookup
  * join + one bene-keyed semi join; the UNION distinct is the single
  * wide exchange. One scan per source table.
  */
object McareClaimPharm {

  private def ndc11(name: String): Column =
    substring(concat(lit("00000000000"), col(name)), -11, 11)

  private val nullStr = lit(null).cast("string")
  private val nullNum = lit(null).cast("double")
  private val nullInt = lit(null).cast("int")

  /** One facility revenue-center arm. */
  def facilityArm(rev: DataFrame, base: DataFrame, enroll: DataFrame,
      filetype: String): DataFrame =
    rev
      .filter(col("rev_cntr_ide_ndc_upc_num").isNotNull &&
        !substring(col("rev_cntr_ide_ndc_upc_num"), 1, 1).rlike("^[A-Z]$"))
      .join(base.select(col("clm_id"), col("clm_thru_dt"),
        col("clm_mdcr_non_pmt_rsn_cd")), Seq("clm_id"), "left")
      .filter(col("clm_mdcr_non_pmt_rsn_cd") === "" ||
        col("clm_mdcr_non_pmt_rsn_cd").isNull)
      .join(enroll.select(col("bene_id")), Seq("bene_id"), "left_semi")
      .select(
        trim(col("bene_id")).as("id_mcare"),
        trim(col("clm_id")).as("claim_header_id"),
        trim(col("clm_line_num")).as("claim_line_id"),
        col("clm_thru_dt").cast("date").as("last_service_date"),
        nullStr.as("prscrbr_npi"),
        ndc11("rev_cntr_ide_ndc_upc_num").as("ndc"),
        col("rev_cntr_ndc_qty").cast("double").as("facility_drug_quantity"),
        col("rev_cntr_ndc_qty_qlfr_cd").as("facility_drug_quantity_unit"),
        nullStr.as("cmpnd_cd"), nullNum.as("qty_dspnsd_num"),
        nullInt.as("days_suply_num"), nullInt.as("fill_num"),
        nullNum.as("ptnt_pay_amt"), nullNum.as("othr_troop_amt"),
        nullNum.as("lics_amt"), nullNum.as("plro_amt"),
        nullNum.as("cvrd_d_plan_pd_amt"), nullNum.as("ncvrd_plan_pd_amt"),
        nullNum.as("tot_rx_cst_amt"), nullStr.as("dosage_form_code"),
        nullStr.as("dosage_form_code_desc"), nullStr.as("strength"),
        nullStr.as("pharmacy_id"), nullStr.as("brand_generic_flag"),
        nullStr.as("pharmacy_type"),
        lit(filetype).as("filetype_mcare"))

  private def npiIfQualified(qlfr: Column, id: Column): Column =
    when(qlfr.isin("1", "01"), id).otherwise(nullStr)

  /** Current-schema Part D arm; `checkEnrollment = false` reproduces
    * the ON-clause quirk (no rows excluded). */
  def pdeArm(pde: DataFrame, enroll: DataFrame, checkEnrollment: Boolean,
      ncvrdNull: Boolean): DataFrame = {
    val base =
      if (checkEnrollment)
        pde.join(enroll.select(col("bene_id")), Seq("bene_id"), "left_semi")
      else pde
    base.select(
      trim(col("bene_id")).as("id_mcare"),
      trim(col("pde_id")).as("claim_header_id"),
      nullStr.as("claim_line_id"),
      col("srvc_dt").cast("date").as("last_service_date"),
      npiIfQualified(col("prscrbr_id_qlfyr_cd"), col("prscrbr_id"))
        .as("prscrbr_npi"),
      ndc11("prod_srvc_id").as("ndc"),
      nullNum.as("facility_drug_quantity"),
      nullStr.as("facility_drug_quantity_unit"),
      col("cmpnd_cd"),
      col("qty_dspnsd_num").cast("double").as("qty_dspnsd_num"),
      col("days_suply_num").cast("int").as("days_suply_num"),
      col("fill_num").cast("int").as("fill_num"),
      col("ptnt_pay_amt").cast("double").as("ptnt_pay_amt"),
      col("othr_troop_amt").cast("double").as("othr_troop_amt"),
      col("lics_amt").cast("double").as("lics_amt"),
      col("plro_amt").cast("double").as("plro_amt"),
      col("cvrd_d_plan_pd_amt").cast("double").as("cvrd_d_plan_pd_amt"),
      (if (ncvrdNull) nullNum
        else col("ncvrd_plan_pd_amt").cast("double"))
        .as("ncvrd_plan_pd_amt"),
      col("tot_rx_cst_amt").cast("double").as("tot_rx_cst_amt"),
      col("gcdf").as("dosage_form_code"),
      col("gcdf_desc").as("dosage_form_code_desc"),
      col("str").as("strength"),
      col("ncpdp_id").as("pharmacy_id"),
      col("brnd_gnrc_cd").as("brand_generic_flag"),
      col("phrmcy_srvc_type_cd").as("pharmacy_type"),
      lit("pharmacy").as("filetype_mcare"))
  }

  /** Split pde_a/pde_b arm (renamed legacy columns). */
  def pdeSplitArm(pdeA: DataFrame, pdeB: DataFrame,
      enroll: DataFrame): DataFrame =
    pdeA
      .join(pdeB, Seq("pde_id"), "left")
      .join(enroll.select(col("bene_id")), Seq("bene_id"), "left_semi")
      .select(
        trim(col("bene_id")).as("id_mcare"),
        trim(col("pde_id")).as("claim_header_id"),
        nullStr.as("claim_line_id"),
        col("srvc_dt").cast("date").as("last_service_date"),
        npiIfQualified(col("prscqlfr"), col("prscrbid")).as("prscrbr_npi"),
        ndc11("prdsrvid").as("ndc"),
        nullNum.as("facility_drug_quantity"),
        nullStr.as("facility_drug_quantity_unit"),
        col("cmpnd_cd"),
        col("qtydspns").cast("double").as("qty_dspnsd_num"),
        col("dayssply").cast("int").as("days_suply_num"),
        col("fill_num").cast("int").as("fill_num"),
        col("ptpayamt").cast("double").as("ptnt_pay_amt"),
        col("othtroop").cast("double").as("othr_troop_amt"),
        col("lics_amt").cast("double").as("lics_amt"),
        col("plro_amt").cast("double").as("plro_amt"),
        col("cpp_amt").cast("double").as("cvrd_d_plan_pd_amt"),
        col("npp_amt").cast("double").as("ncvrd_plan_pd_amt"),
        col("totalcst").cast("double").as("tot_rx_cst_amt"),
        col("gcdf").as("dosage_form_code"),
        col("gcdf_desc").as("dosage_form_code_desc"),
        col("str").as("strength"),
        col("ncpdp_id").as("pharmacy_id"),
        col("brndgncd").as("brand_generic_flag"),
        col("phrmcy_srvc_type_cd").as("pharmacy_type"),
        lit("pharmacy").as("filetype_mcare"))

  /** Full union. `facility` = (filetype, revenueCenter, baseClaims). */
  def build(facility: Seq[(String, DataFrame, DataFrame)],
      enroll: DataFrame, pde: DataFrame, pde2014: DataFrame,
      pdeA: DataFrame, pdeB: DataFrame): DataFrame = {
    val arms =
      facility.map { case (ft, rev, base) =>
        facilityArm(rev, base, enroll, ft) } ++ Seq(
        pdeArm(pde, enroll, checkEnrollment = false, ncvrdNull = false),
        pdeArm(pde2014, enroll, checkEnrollment = false, ncvrdNull = true),
        pdeSplitArm(pdeA, pdeB, enroll))
    arms.reduce(_ union _).distinct()
  }
}
