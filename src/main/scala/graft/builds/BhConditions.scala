package graft.builds

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral-health condition status — the reference's revised
  * source-generic claim_bh build (scripts_general/claim_bh.R, the
  * 2024-11 first/last-encounter formulation), here instantiated for any
  * source via the two dispatch knobs the R function branches on
  * (claim_bh.R:60-72): the person-id column (`id_apde` for the combined
  * mcaid+mcare source) and the pharmacy fill-date column (`rx_fill_date`
  * for mcaid/combined, `last_service_date` for apcd/mcare).
  *
  * Semantics, step for step:
  *  - steps 3-4 (:146-208): every non-OUD condition is DISTINCT
  *    (person, service-date, condition) evidence from diagnosis rows
  *    joined to the RDA value-set (ICD9CM/ICD10CM arms join on
  *    code+version) UNIONed with pharmacy rows joined on NDC, collapsed
  *    to per-(person, condition) first/last encounter dates;
  *  - step 5 (:215-365): OUD (sud_opioid) gets condition-specific
  *    logic — dx/rx/procedure claim arms FULL JOINed on the DIAGNOSIS
  *    arm's claim_header_id (the T-SQL join tree: an rx-only claim never
  *    matches the procedure arm's join key, and surfaces as its own
  *    row), where the procedure arm is the MOUD value set gated by
  *    `oud_dx1_flag` (codes flagged 1 require the claim's PRIMARY
  *    diagnosis to be OUD, via the header); diagnosis months become
  *    person-month rows [month-first, month-last]; MOUD claims with no
  *    diagnosis on the claim count only from the person's first
  *    diagnosis month onward (`oud_diag_min <= svc_date`);
  *  - step 6 (:372-395): UNION-distinct of the per-condition spans and
  *    the OUD person-months.
  *
  * The reference resolves month boundaries by joining a `ref_date`
  * calendar dim (:314-321); `date_trunc`/`last_day` express the same
  * mapping without materializing the dim.
  *
  * Scale shape: every value-set join is a broadcast against the code
  * dim; the only wide exchanges are the DISTINCTs and the final
  * per-(person, condition) partial agg, all keyed on the person id. The
  * OUD full-join tree is keyed on claim_header_id (high-cardinality, no
  * skew). One scan per fact table.
  */
object BhConditions {

  /** @param icdcm   (idCol, claim_header_id, icdcm_norm, icdcm_version,
    *                first_service_date)
    * @param pharm   (idCol, claim_header_id, ndc, rxDateCol)
    * @param proc    (idCol, claim_header_id, procedure_code,
    *                first_service_date)
    * @param header  (claim_header_id, primary_diagnosis, icdcm_version)
    * @param ref     RDA value set: (sub_group_condition, code_set, code,
    *                icdcm_version, value_set_name, oud_dx1_flag)
    * @return (idCol, first_encounter_date, last_encounter_date, bh_cond)
    */
  def build(icdcm: DataFrame, pharm: DataFrame, proc: DataFrame,
      header: DataFrame, ref: DataFrame, idCol: String = "id_apde",
      rxDateCol: String = "rx_fill_date"): DataFrame = {
    val id = col(idCol)
    val dxRef = ref.filter(col("code_set").isin("ICD9CM", "ICD10CM"))
    val ndcRef = ref.filter(col("code_set") === "NDC")

    // steps 3-4: non-OUD conditions -> (person, cond) encounter span
    val diagEvidence = icdcm
      .select(id, col("icdcm_norm"), col("icdcm_version"),
        col("first_service_date").as("svc_date")).distinct()
      .join(broadcast(dxRef
          .filter(col("sub_group_condition") =!= "sud_opioid")
          .select(col("code").as("icdcm_norm"),
            col("icdcm_version"),
            col("sub_group_condition").as("bh_cond"))),
        Seq("icdcm_norm", "icdcm_version"))
      .select(id, col("svc_date"), col("bh_cond"))
    val rxEvidence = pharm
      .join(broadcast(ndcRef
          .filter(col("sub_group_condition") =!= "sud_opioid")
          .select(col("code").as("ndc"),
            col("sub_group_condition").as("bh_cond"))),
        Seq("ndc"))
      .select(id, col(rxDateCol).as("svc_date"), col("bh_cond"))
      .distinct()
    val condSpans = diagEvidence.union(rxEvidence).distinct()
      .groupBy(id, col("bh_cond"))
      .agg(min(col("svc_date")).as("first_encounter_date"),
        max(col("svc_date")).as("last_encounter_date"))
      .select(id, col("first_encounter_date"),
        col("last_encounter_date"), col("bh_cond"))

    // step 5: OUD condition-specific logic
    val oudDxRef = dxRef.filter(col("sub_group_condition") === "sud_opioid")
      .select(col("code").as("ref_code"),
        col("icdcm_version").as("ref_ver"))
    val oudDx1 = header
      .join(broadcast(oudDxRef),
        col("primary_diagnosis") === col("ref_code") &&
          col("icdcm_version") === col("ref_ver"))
      .select(col("claim_header_id")).distinct()
      .withColumn("oud_dx1", lit(1))
    val diagArm = icdcm
      .select(id, col("claim_header_id"), col("icdcm_norm"),
        col("icdcm_version"), col("first_service_date").as("svc_date"))
      .distinct()
      .join(broadcast(oudDxRef),
        col("icdcm_norm") === col("ref_code") &&
          col("icdcm_version") === col("ref_ver"))
      .select(id, col("claim_header_id"), col("svc_date")).distinct()
      .withColumn("icdcm_flag", lit(1))
      .alias("d")
    val rxArm = pharm
      .join(broadcast(ndcRef
          .filter(col("sub_group_condition") === "sud_opioid")
          .select(col("code").as("ndc"))),
        Seq("ndc"))
      .select(id, col("claim_header_id"), col(rxDateCol).as("svc_date"))
      .distinct()
      .withColumn("rx_flag", lit(1))
      .alias("r")
    val moudRef = ref
      .filter(col("value_set_name") === "apde-moud-procedure" &&
        col("sub_group_condition") === "sud_opioid")
      .select(col("code").as("procedure_code"), col("oud_dx1_flag"))
    val pcodeArm = proc
      .join(broadcast(moudRef), Seq("procedure_code"))
      .join(oudDx1, Seq("claim_header_id"), "left")
      .select(id, col("claim_header_id"),
        col("first_service_date").as("svc_date"),
        when(col("oud_dx1_flag") === 0, 1)
          .when(col("oud_dx1_flag") === 1 && col("oud_dx1") === 1, 1)
          .otherwise(0).as("dx1_ok"))
      .distinct()
      .filter(col("dx1_ok") === 1)
      .select(id, col("claim_header_id"), col("svc_date")).distinct()
      .withColumn("pcode_flag", lit(1))
      .alias("p")
    // the T-SQL join tree: both FULL JOINs key on the DIAGNOSIS arm's
    // claim_header_id specifically
    val oudClaims = diagArm
      .join(rxArm, col(s"d.claim_header_id") === col(s"r.claim_header_id"),
        "full")
      .join(pcodeArm,
        col(s"d.claim_header_id") === col(s"p.claim_header_id"), "full")
      .select(
        coalesce(col(s"d.$idCol"), col(s"r.$idCol"), col(s"p.$idCol"))
          .as(idCol),
        coalesce(col("d.claim_header_id"), col("r.claim_header_id"),
          col("p.claim_header_id")).as("claim_header_id"),
        coalesce(col("d.svc_date"), col("r.svc_date"), col("p.svc_date"))
          .as("svc_date"),
        col("d.icdcm_flag").as("icdcm_flag"),
        col("r.rx_flag").as("rx_flag"),
        col("p.pcode_flag").as("pcode_flag"))
    val oudDiagMonth = oudClaims.filter(col("icdcm_flag") === 1)
      .select(id,
        trunc(col("svc_date"), "month").as("first_encounter_date"),
        last_day(col("svc_date")).as("last_encounter_date"))
      .distinct()
    val oudDiagMin = oudDiagMonth.groupBy(id)
      .agg(min(col("first_encounter_date")).as("oud_diag_min"))
    val moudMonths = oudClaims.filter(col("icdcm_flag").isNull)
      .join(oudDiagMin, Seq(idCol))
      .withColumn("moud_include",
        when(col("oud_diag_min") <= col("svc_date"), 1).otherwise(0))
      .filter(col("moud_include") === 1)
      .select(id,
        trunc(col("svc_date"), "month").as("first_encounter_date"),
        last_day(col("svc_date")).as("last_encounter_date"))
      .distinct()
    val oudRows = oudDiagMonth.union(moudMonths).distinct()
      .withColumn("bh_cond", lit("sud_opioid"))

    // step 6: final union
    condSpans.union(oudRows).distinct()
  }
}
