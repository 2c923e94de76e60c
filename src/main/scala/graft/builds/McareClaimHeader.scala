package graft.builds

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Composed mcare claim_header build — the full assembly of
  * load_stage.mcare_claim_header.R:85-404 (union of drifted source files,
  * each with its own payment arithmetic and denial filter) with steps
  * 1-6 of the build (:60-680): eligibility-existence filter, claim-type
  * crosswalk, header-level min/max windows + dedup, line/procedure/
  * diagnosis rollups, and the claim-type-gated ED event flags.
  *
  * The mcaid sibling is [[ClaimHeader]] (q66); this composes the mcare
  * side the same way. Deliberately omitted from the composition:
  *  - the trailing global DENSE_RANK utilization ids (:760-790) — a
  *    single-partition window; the (id_person, first_service_date)
  *    composite carries the same identity scale-safely (SURVEY §7.5.1,
  *    pinned by q66's episode ids);
  *  - pc_visit (:480-551) — the same MAX(CASE) rollup shape as the ED
  *    flags but over two more ref tables (taxonomy crosswalks); nothing
  *    new operator-wise.
  *
  * Scale: the union is scan-stage narrow work; the only shuffles are the
  * union DISTINCT, one claim-keyed window+dedup, and claim-keyed rollup
  * joins. The crosswalk is broadcast. Nothing re-keys more than once.
  */
object McareClaimHeader {

  /** @param target   declared union schema; must include id_person,
    *                  claim_id, claim_type_src, admission_date,
    *                  discharge_date
    * @param sources  (filetype tag, frame) — each frame already applies
    *                 its OWN payment arithmetic + denial filter, the
    *                 per-source SELECT of the reference union. CONTRACT:
    *                 within a source, every column except admission/
    *                 discharge dates must be constant per claim_id — the
    *                 collapse window-uniforms only the dates (exactly
    *                 what the reference's min/max windows + step-6
    *                 DISTINCT do), so a line-varying payment column would
    *                 survive as duplicate header rows there too
    * @param eligIds  persons with eligibility data; claims of unknown
    *                 persons are dropped (left join + IS NOT NULL ->
    *                 left_semi)
    * @param claimTypeXwalk small (claim_type_src, claim_type_id) ref —
    *                 broadcast
    * @param lines    (claim_id, pos_code, rev_code) claim lines
    * @param procs    (claim_id, procedure_code) claim procedures
    * @param dx       (claim_id, icdcm_number, icdcm_norm) diagnoses
    * @return one row per claim header with event flags
    */
  def build(target: StructType, sources: Seq[(String, DataFrame)],
      eligIds: DataFrame, claimTypeXwalk: DataFrame, lines: DataFrame,
      procs: DataFrame, dx: DataFrame): DataFrame = {
    // step 1: drifted union (per-source casts, NULL-pad, distinct) +
    // eligibility existence + claim-type crosswalk
    val unioned = MultiSourceUnion.build(target, sources)
      .join(eligIds.select(col("id_person")).distinct(), Seq("id_person"),
        "left_semi")
      .join(broadcast(claimTypeXwalk), Seq("claim_type_src"), "left")
    // header-level min/max over the claim: line-level source files carry
    // several rows per header whose admission dates differ; the windows
    // make them uniform and the DISTINCT collapses to one header row
    // (:72-74 min/max OVER(PARTITION BY claim_header_id) + step-6
    // SELECT DISTINCT). inpatient_flag is computed from the WINDOWED
    // discharge (the reference reads the raw row's — a mixed
    // null/non-null claim would survive its DISTINCT as two rows with
    // different flags; real '60' files always carry discharge, where the
    // two definitions agree and ours cannot duplicate headers)
    val wClaim = Window.partitionBy(col("claim_id"))
    val hdr = unioned
      .withColumn("admission_date", min(col("admission_date")).over(wClaim))
      .withColumn("discharge_date", max(col("discharge_date")).over(wClaim))
      .withColumn("inpatient_flag",
        (col("claim_type_src") === "60" && col("discharge_date").isNotNull)
          .cast("int"))
      .distinct()

    // steps 2-3: line + procedure rollups (MAX(CASE) with the reference's
    // char-class patterns; the procedure frame subsets to flagged claims
    // before joining — :474-477)
    val lineFlags = lines.groupBy(col("claim_id")).agg(
      max((col("pos_code") === "23").cast("int")).as("ed_pos"),
      max(col("rev_code").rlike("^045[01269]$").cast("int"))
        .as("ed_rev_perform"),
      max((col("rev_code").rlike("^045[01269]$") ||
        col("rev_code") === "0981").cast("int")).as("ed_rev_pophealth"))
    val procFlags = procs.groupBy(col("claim_id")).agg(
        max(col("procedure_code").rlike("^9928[123458]$").cast("int"))
          .as("ed_proc_perform"),
        max((col("procedure_code").rlike("^9928[12345]$") ||
          col("procedure_code") === "99291").cast("int"))
          .as("ed_proc_pophealth"))
      .filter(col("ed_proc_perform") === 1 || col("ed_proc_pophealth") === 1)
    // step 5: primary diagnosis — first ordered ICD code when >1 primary
    val dx1 = dx.filter(col("icdcm_number") === "01")
      .groupBy(col("claim_id"))
      .agg(min(col("icdcm_norm")).as("primary_diagnosis"))

    // step 6: claim-type-gated event flags (:646-661)
    hdr
      .join(lineFlags, Seq("claim_id"), "left")
      .join(procFlags, Seq("claim_id"), "left")
      .join(dx1, Seq("claim_id"), "left")
      .withColumn("ed_perform",
        when(col("claim_type_id") === 4 &&
          (col("ed_rev_perform") === 1 || col("ed_proc_perform") === 1 ||
            col("ed_pos") === 1), 1).otherwise(0))
      .withColumn("ed_yale_carrier",
        when(col("claim_type_id") === 5 &&
          ((col("ed_proc_pophealth") === 1 && col("ed_pos") === 1) ||
            col("ed_rev_pophealth") === 1), 1).otherwise(0))
      .withColumn("ed_yale_opt",
        when(col("claim_type_id") === 4 &&
          (col("ed_rev_pophealth") === 1 || col("ed_pos") === 1 ||
            col("ed_proc_pophealth") === 1), 1).otherwise(0))
      .withColumn("ed_yale_ipt",
        when(col("claim_type_id") === 1 &&
          (col("ed_rev_pophealth") === 1 || col("ed_pos") === 1 ||
            col("ed_proc_pophealth") === 1), 1).otherwise(0))
  }
}
