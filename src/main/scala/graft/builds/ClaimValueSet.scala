package graft.builds

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** stage.mcaid_claim_value_set — the persistent claim↔value-set
  * membership table (load_stage.mcaid_claim_value_set.R:55-333): every
  * claim header that meets an RDA or curated-HEDIS value-set definition,
  * one row per (value set, claim, primary-dx scope).
  *
  * The reference is 14 INSERT arms, each a full scan of one claim table
  * joined to one slice of a code dim:
  *
  *  - procedure vs ref.rda_value_set CPT/HCPCS/ICD10PCS/ICD9PCS (:57-70)
  *  - header DRG vs rda DRG (:72-87)
  *  - dx primary-only ICD10CM / ICD9CM (:89-125, icdcm_number = '01')
  *  - dx any-position ICD10CM / ICD9CM (:127-163) — NOTE: unlike the
  *    perf views, these arms carry NO service-date cutover; version
  *    alone routes a code to ICD9CM vs ICD10CM
  *  - pharmacy NDC with the active = 'Y' residual (:165-182)
  *  - line revenue code vs rda UBREV (:184-199)
  *  - six HEDIS arms vs archive.hedis_code_system: procedure CPT/HCPCS
  *    (FUH/TCM sets, :201-225), line UBREV (:227-243), header UBTOB
  *    (:245-260) and POS (:262-283), dx ICD10CM primary + any
  *    (:285-327, Mental Health Diagnosis / Mental Illness)
  *
  * Re-expressed Spark-first as ONE scan per claim table (5 total, vs the
  * reference's 14):
  *
  *  - per-table arms that differ only in which dim slice they join
  *    become one broadcast join against the UNION of the slices, each
  *    row pre-tagged with its arm's descriptive columns;
  *  - the header's three code namespaces (DRG / UBTOB / POS) become a
  *    stack() unpivot to (namespace, code) long rows — a generator, no
  *    shuffle — then one equi-join on (namespace, code);
  *  - the dx primary/any duality becomes an explode: every matched row
  *    emits its 'N' (any-position) row, plus a 'Y' row when
  *    icdcm_number = '01' — one dx scan instead of four.
  *
  * Scale: all code dims are curated lookups (thousands of rows) →
  * broadcast; no fact-side shuffle anywhere until the final DISTINCT,
  * which is the output grain's one unavoidable exchange (map-side
  * combined). Arms cannot collide across tables (the code_set column
  * separates them), so a single post-union DISTINCT reproduces the
  * reference's per-arm SELECT DISTINCTs.
  */
object ClaimValueSet {

  private val outCols = Seq("value_set_group", "value_set_name",
    "data_source_type", "sub_group", "code_set", "primary_dx_only",
    "id_mcaid", "claim_header_id", "service_date")

  /** The six HEDIS arm configurations: (value-set names, code systems). */
  private val hedisProcSets = Seq("FUH Stand Alone Visits",
    "FUH Visits Group 1", "FUH Visits Group 2", "TCM 7 Day", "TCM 14 Day")
  private val hedisLineSets = Seq("Inpatient Stay",
    "Nonacute Inpatient Stay", "FUH RevCodes Group 1",
    "FUH RevCodes Group 2")
  private val hedisTobSets = Seq("Nonacute Inpatient Stay")
  private val hedisPosSets = Seq("FUH POS Group 1", "FUH POS Group 2")
  private val hedisDxSets = Seq("Mental Health Diagnosis", "Mental Illness")

  /** rda slice → unified dim rows carrying the output descriptive
    * columns. */
  private def rdaDim(rda: DataFrame, codeSets: Seq[String],
      activeOnly: Boolean = false): DataFrame =
    rda.filter(col("code_set").isin(codeSets: _*) &&
        (if (activeOnly) col("active") === "Y" else lit(true)))
      .select(col("value_set_group"), col("value_set_name"),
        col("data_source_type"), col("sub_group"), col("code_set"),
        col("code"))

  /** hedis slice → the same unified shape (group literal 'HEDIS',
    * data_source_type/sub_group NULL, code_set = code_system). */
  private def hedisDim(hedis: DataFrame, valueSets: Seq[String],
      codeSystems: Seq[String]): DataFrame =
    hedis.filter(col("value_set_name").isin(valueSets: _*) &&
        col("code_system").isin(codeSystems: _*))
      .select(lit("HEDIS").as("value_set_group"), col("value_set_name"),
        lit(null).cast("string").as("data_source_type"),
        lit(null).cast("string").as("sub_group"),
        col("code_system").as("code_set"), col("code"))

  /** @param proc   (id_mcaid, claim_header_id, first_service_date,
    *               procedure_code)
    * @param header (id_mcaid, claim_header_id, first_service_date,
    *               drvd_drg_code, type_of_bill_code,
    *               place_of_service_code)
    * @param dx     (id_mcaid, claim_header_id, first_service_date,
    *               icdcm_version, icdcm_number, icdcm_norm)
    * @param pharm  (id_mcaid, claim_header_id, rx_fill_date, ndc)
    * @param line   (id_mcaid, claim_header_id, first_service_date,
    *               rev_code)
    * @param rda    ref.rda_value_set: (value_set_group, value_set_name,
    *               data_source_type, sub_group, code_set, code, active)
    * @param hedis  archive.hedis_code_system: (value_set_name,
    *               code_system, code)
    */
  def build(proc: DataFrame, header: DataFrame, dx: DataFrame,
      pharm: DataFrame, line: DataFrame, rda: DataFrame,
      hedis: DataFrame): DataFrame = {

    val nullPrim = lit(null).cast("string").as("primary_dx_only")

    // ---- procedure: RDA procedure sets ∪ HEDIS FUH/TCM (one scan) ----
    val procDim = rdaDim(rda,
        Seq("CPT", "HCPCS", "ICD10PCS", "ICD9PCS"))
      .unionByName(hedisDim(hedis, hedisProcSets, Seq("CPT", "HCPCS")))
    val procArm = proc.join(broadcast(procDim),
        proc("procedure_code") === procDim("code"))
      .select(col("value_set_group"), col("value_set_name"),
        col("data_source_type"), col("sub_group"), col("code_set"),
        nullPrim, col("id_mcaid"), col("claim_header_id"),
        col("first_service_date").as("service_date"))

    // ---- header: DRG / UBTOB / POS via stack() unpivot (one scan) ----
    // namespace tags keep UBTOB bill codes from matching POS codes even
    // when the strings collide (distinct code-system namespaces may
    // share strings — same discipline as the CAP line frame)
    val hdrLong = header.select(col("id_mcaid"), col("claim_header_id"),
        col("first_service_date"),
        expr("""stack(3,
          'DRG', drvd_drg_code,
          'UBTOB', type_of_bill_code,
          'POS', place_of_service_code) AS (ns, claim_code)"""))
      .filter(col("claim_code").isNotNull)
    val hdrDim = rdaDim(rda, Seq("DRG")).withColumn("ns", lit("DRG"))
      .unionByName(hedisDim(hedis, hedisTobSets, Seq("UBTOB"))
        .withColumn("ns", lit("UBTOB")))
      .unionByName(hedisDim(hedis, hedisPosSets, Seq("POS"))
        .withColumn("ns", lit("POS")))
    val hdrArm = hdrLong.join(broadcast(hdrDim),
        hdrLong("ns") === hdrDim("ns") &&
          hdrLong("claim_code") === hdrDim("code"))
      .select(col("value_set_group"), col("value_set_name"),
        col("data_source_type"), col("sub_group"), col("code_set"),
        nullPrim, col("id_mcaid"), col("claim_header_id"),
        col("first_service_date").as("service_date"))

    // ---- diagnosis: version-routed code_set, Y/N explode (one scan) --
    val dxDim = rdaDim(rda, Seq("ICD9CM", "ICD10CM"))
      .unionByName(hedisDim(hedis, hedisDxSets, Seq("ICD10CM")))
    val claimCodeSet = when(col("icdcm_version") === 9, "ICD9CM")
      .when(col("icdcm_version") === 10, "ICD10CM")
    val dxArm = dx
      .withColumn("claim_code_set", claimCodeSet)
      .join(broadcast(dxDim),
        col("claim_code_set") === dxDim("code_set") &&
          col("icdcm_norm") === dxDim("code"))
      // 'N' (any position) always; 'Y' only from principal-dx rows —
      // exploding reproduces the reference's paired primary/any arms
      .select(col("value_set_group"), col("value_set_name"),
        col("data_source_type"), col("sub_group"), col("code_set"),
        explode(when(col("icdcm_number") === "01",
            array(lit("Y"), lit("N"))).otherwise(array(lit("N"))))
          .as("primary_dx_only"),
        col("id_mcaid"), col("claim_header_id"),
        col("first_service_date").as("service_date"))

    // ---- pharmacy: NDC with the active = 'Y' residual ----
    val phDim = rdaDim(rda, Seq("NDC"), activeOnly = true)
    val phArm = pharm.join(broadcast(phDim),
        pharm("ndc") === phDim("code"))
      .select(col("value_set_group"), col("value_set_name"),
        col("data_source_type"), col("sub_group"), col("code_set"),
        nullPrim, col("id_mcaid"), col("claim_header_id"),
        col("rx_fill_date").as("service_date"))

    // ---- line: RDA UBREV ∪ HEDIS UBREV (one scan) ----
    val lnDim = rdaDim(rda, Seq("UBREV"))
      .unionByName(hedisDim(hedis, hedisLineSets, Seq("UBREV")))
    val lnArm = line.join(broadcast(lnDim),
        line("rev_code") === lnDim("code"))
      .select(col("value_set_group"), col("value_set_name"),
        col("data_source_type"), col("sub_group"), col("code_set"),
        nullPrim, col("id_mcaid"), col("claim_header_id"),
        col("first_service_date").as("service_date"))

    procArm.unionByName(hdrArm).unionByName(dxArm).unionByName(phArm)
      .unionByName(lnArm)
      .distinct()
      .select(outCols.map(col): _*)
  }
}
