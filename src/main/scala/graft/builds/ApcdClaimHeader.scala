package graft.builds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** APCD claim header staging build — the reference's biggest-source
  * composition (load_stage.apcd_claim_header.R, 1,251 LoC, steps 1-8 and
  * 10-11; the injury classification of step 9 lives in [[ApcdInjury]]):
  *
  *  step 1   base: denied/orphaned exclusion (:148), claim-status ref
  *           join (:144-146), -1/-2 sentinel nulling of product code /
  *           type-of-bill / place-of-setting (:76,:82), the concatenated
  *           `claim_type.setting.place` APCD type id whose NULL place
  *           nulls the whole id (T-SQL concat semantics, :112-115), and
  *           the line-grain rollup (max discharge date, ED
  *           place-of-service '23', ED revenue 045[01269]/0981 —
  *           :135-139);
  *  step 2   ED procedure-code flag 9928[1-5]/99291 rolled to the header,
  *           kept only where 1 (:166-180);
  *  step 3   Oregon primary-care visit detection: procedure ∈ cpt/hcpcs
  *           ref, ICD-10 Z-code ∈ ref, and rendering/attending provider
  *           taxonomy reached through provider → NPI → master — the
  *           reference's OR-join on primary/secondary taxonomy (:243)
  *           re-expressed as an unpivot to (npi, taxonomy) rows + one
  *           equi-join, which partitions instead of nested-looping;
  *  step 4   primary diagnosis: min(icdcm_norm) where number '01' (:272);
  *  step 6   kc claim-type crosswalk + the derived flags: ed_perform
  *           (RDA), the three Yale ED flags by kc type, inpatient
  *           (type 1.1.1 + primary/secondary status + discharge), and
  *           the final pc_visit gate with its setting exclusions (:383+);
  *  step 7   utilization concept sequence ids per (person, date) — the
  *           reference's global DENSE_RANK surrogates become
  *           (id_apcd, seq) composites, scale-safe (SURVEY §7.5.1);
  *  step 8   RDA behavioral-health dx flags (mh/sud × primary/any);
  *  step 10  Yale ED population-health 1-day episode clustering
  *           ([[Intervals.islandIds]] on first_service_date);
  *  step 11  final distinct join-back.
  *
  * Scale shape: every rollup is a partial-agg shuffle keyed on
  * claim_header_id (the natural high-cardinality key — no skew); the ref
  * tables (status, type xwalk, PC codes, NPI, provider master, icd ref)
  * all broadcast; the only person-keyed exchange is the ED sliver's
  * episode pass. The 23 OnPoint service-type flags ride through untouched
  * via `flagCols`.
  */
object ApcdClaimHeader {

  private def nullSentinel(c: Column): Column =
    when(c.isin(-1, -2), lit(null)).otherwise(c)

  /** Step 1's line rollup: discharge + ED place/revenue signals. */
  def lineRollup(line: DataFrame): DataFrame =
    line.groupBy(col("claim_header_id"))
      .agg(max(col("discharge_date")).as("discharge_date"),
        max(when(col("place_of_service_code") === "23", 1).otherwise(0))
          .as("ed_pos_temp"),
        max(when(col("revenue_code").rlike("^045[01269]$") ||
          col("revenue_code") === "0981", 1).otherwise(0))
          .as("ed_revenue_code_temp"))

  /** Step 2: header-level ED procedure flag, kept only where set. */
  def edProcedureFlag(proc: DataFrame): DataFrame =
    proc.groupBy(col("claim_header_id"))
      .agg(max(when(col("procedure_code").rlike("^9928[12345]$") ||
        col("procedure_code") === "99291", 1).otherwise(0))
        .as("ed_procedure_code_temp"))
      .filter(col("ed_procedure_code_temp") === 1)

  /** Step 3: Oregon PC-visit signals. `pcRef` carries (code,
    * code_system); provider taxonomy is resolved provider → NPI →
    * master, with the master's primary/secondary taxonomy UNPIVOTED to
    * rows so the ref match is one equi-join. Kept only where the
    * reference's pre-filter holds: (procedure or zcode) AND taxonomy. */
  def pcVisitFlags(proc: DataFrame, dx: DataFrame, provider: DataFrame,
      npiRef: DataFrame, providerMaster: DataFrame,
      pcRef: DataFrame): DataFrame = {
    def codes(sel: Column, as: String) = pcRef.filter(sel)
      .select(col("code").as(as)).distinct()
    val pcProc = proc.join(
        broadcast(codes(col("code_system").isin("cpt", "hcpcs"),
          "procedure_code")), Seq("procedure_code"))
      .select(col("claim_header_id")).distinct()
      .withColumn("pc_procedure_temp", lit(1))
    val pcZ = dx.filter(col("icdcm_version") === 10)
      .join(broadcast(codes(col("code_system") === "icd10cm",
        "icdcm_norm")), Seq("icdcm_norm"))
      .select(col("claim_header_id")).distinct()
      .withColumn("pc_zcode_temp", lit(1))
    // taxonomy chain: rendering/attending provider ids -> NPI -> master
    // taxonomies unpivoted -> PC taxonomy ref
    val masterTax = providerMaster.select(col("npi"),
        explode(array(col("primary_taxonomy"), col("secondary_taxonomy")))
          .as("taxonomy"))
      .filter(col("taxonomy").isNotNull)
    val pcNpi = masterTax.join(
        broadcast(codes(col("code_system") === "provider_taxonomy",
          "taxonomy")), Seq("taxonomy"))
      .select(col("npi")).distinct()
    val pcTax = provider
      .filter(col("provider_type").isin("rendering", "attending"))
      .join(broadcast(npiRef), Seq("provider_id_apcd"))
      .join(broadcast(pcNpi), Seq("npi"))
      .select(col("claim_header_id")).distinct()
      .withColumn("pc_taxonomy_temp", lit(1))
    pcProc.join(pcZ, Seq("claim_header_id"), "full")
      .join(pcTax, Seq("claim_header_id"), "full")
      .filter((col("pc_procedure_temp") === 1 || col("pc_zcode_temp") === 1) &&
        col("pc_taxonomy_temp") === 1)
  }

  /** Step 4: first-ordered primary diagnosis per header. */
  def primaryDx(dx: DataFrame): DataFrame =
    dx.filter(col("icdcm_number") === "01")
      .groupBy(col("claim_header_id"))
      .agg(min(col("icdcm_norm")).as("primary_diagnosis"),
        min(col("icdcm_version")).as("icdcm_version"))

  /** Step 8: RDA behavioral-health flags from the icd ref's mh_any /
    * sud_any columns, primary = restricted to dx number '01'. */
  def bhFlags(dx: DataFrame, icdRef: DataFrame): DataFrame = {
    val ref = icdRef.select(col("icdcm"), col("icdcm_version").as("v"),
      col("mh_any").as("ref_mh"), col("sud_any").as("ref_sud"))
    dx.join(broadcast(ref), dx("icdcm_norm") === ref("icdcm") &&
        dx("icdcm_version") === ref("v"))
      .groupBy(col("claim_header_id"))
      .agg(
        max(when(col("icdcm_number") === "01" && col("ref_mh") === 1, 1)
          .otherwise(0)).as("mh_primary"),
        max(when(col("ref_mh") === 1, 1).otherwise(0)).as("mh_any"),
        max(when(col("icdcm_number") === "01" && col("ref_sud") === 1, 1)
          .otherwise(0)).as("sud_primary"),
        max(when(col("ref_sud") === 1, 1).otherwise(0)).as("sud_any"))
  }

  /** Primary/secondary claim statuses (the reference's recurring
    * `claim_status_id in (-1,-2,1,5,2,6)` gate). */
  private val primaryStatuses = Seq(-1, -2, 1, 5, 2, 6)

  /** PC-visit setting exclusions: inpatient, swing bed, free-standing
    * ambulatory (:505). */
  private val pcExcludedTypes =
    Seq("1.1.1", "1.1.14", "1.1.2", "2.3.8", "2.3.2", "1.2.8")

  /** Full composition. `flagCols` are passed through from the header
    * (the OnPoint service-type flag battery). */
  def build(header: DataFrame, line: DataFrame, proc: DataFrame,
      dx: DataFrame, provider: DataFrame, statusRef: DataFrame,
      typeXwalk: DataFrame, npiRef: DataFrame, providerMaster: DataFrame,
      pcRef: DataFrame, icdRef: DataFrame,
      flagCols: Seq[String]): DataFrame = {
    // step 1: base with status join, sentinel nulling, type concat, line
    // rollup. Spark concat() yields NULL when any argument is NULL —
    // exactly the T-SQL `+` semantics the reference relies on for NULL
    // place-of-setting.
    val base = header
      .filter(col("denied_header_flag") === "N" &&
        col("orphaned_header_flag") === "N")
      .join(broadcast(statusRef), Seq("claim_status_code"), "left")
      .join(lineRollup(line), Seq("claim_header_id"), "left")
      .withColumn("product_code_id", nullSentinel(col("product_code_id")))
      .withColumn("type_of_bill_code",
        when(col("type_of_bill_code").isin("-1", "-2"), lit(null))
          .otherwise(col("type_of_bill_code")))
      .withColumn("claim_type_apcd_id",
        concat(col("claim_type_raw").cast("string"), lit("."),
          col("type_of_setting_id").cast("string"), lit("."),
          nullSentinel(col("place_of_setting_id")).cast("string")))
      .withColumn("ed_perform_temp",
        when(col("emergency_room_flag") === "Y", 1).otherwise(0))
      .withColumn("ipt_flag",
        when(col("claim_type_raw") === 1 && col("type_of_setting_id") === 1 &&
          col("place_of_setting_id") === 1 &&
          col("claim_status_id").isin(primaryStatuses: _*) &&
          col("discharge_date").isNotNull, 1).otherwise(0))
    // steps 2-4 + 8 rollups, all keyed on claim_header_id
    val withConcepts = base
      .join(edProcedureFlag(proc), Seq("claim_header_id"), "left")
      .join(pcVisitFlags(proc, dx, provider, npiRef, providerMaster, pcRef),
        Seq("claim_header_id"), "left")
      .join(primaryDx(dx), Seq("claim_header_id"), "left")
      .join(bhFlags(dx, icdRef), Seq("claim_header_id"), "left")
    // step 6: kc type crosswalk + derived flags
    val xw = typeXwalk.filter(col("source_desc") === "apcd")
      .select(col("source_clm_type_id").as("claim_type_apcd_id"),
        col("kc_clm_type_id").as("claim_type_id"))
    val flagged = withConcepts
      .join(broadcast(xw), Seq("claim_type_apcd_id"), "left")
      .withColumn("ed_perform",
        when(col("ed_perform_temp") === 1 && col("claim_type_id") === 4, 1)
          .otherwise(0))
      .withColumn("ed_yale_carrier",
        when(col("claim_type_id") === 5 &&
          ((col("ed_procedure_code_temp") === 1 && col("ed_pos_temp") === 1) ||
            col("ed_revenue_code_temp") === 1), 1).otherwise(0))
      .withColumn("ed_yale_opt",
        when(col("claim_type_id") === 4 &&
          (col("ed_revenue_code_temp") === 1 || col("ed_pos_temp") === 1 ||
            col("ed_procedure_code_temp") === 1), 1).otherwise(0))
      .withColumn("ed_yale_ipt",
        when(col("claim_type_id") === 1 &&
          (col("ed_revenue_code_temp") === 1 || col("ed_pos_temp") === 1 ||
            col("ed_procedure_code_temp") === 1), 1).otherwise(0))
      .withColumn("inpatient", col("ipt_flag"))
      .withColumn("pc_visit",
        when((col("pc_procedure_temp") === 1 || col("pc_zcode_temp") === 1) &&
          col("pc_taxonomy_temp") === 1 &&
          !col("claim_type_apcd_id").isin(pcExcludedTypes: _*) &&
          col("claim_status_id").isin(primaryStatuses: _*), 1).otherwise(0))
      .withColumn("mh_primary", coalesce(col("mh_primary"), lit(0)))
      .withColumn("mh_any", coalesce(col("mh_any"), lit(0)))
      .withColumn("sud_primary", coalesce(col("sud_primary"), lit(0)))
      .withColumn("sud_any", coalesce(col("sud_any"), lit(0)))
    // step 7: per-person concept sequence ids (composite surrogates).
    // r14 shape (guide §2.4 "remove shuffles outright"): the reference
    // computes each seq by ranking the flagged SLIVER and joining it
    // back on claim_header_id; expressed that way the whole upstream
    // join tree re-executes once per sliver (4x counting step 10) and
    // each join is its own pair of exchanges. A dense_rank over the
    // FULL frame ordered flag-DESC-then-date is value-identical for
    // the flagged rows (every flag=1 row sorts before every flag=0 row
    // of the same person, so the rank a flagged row receives counts
    // exactly the distinct service dates of the person's flagged rows
    // up to its own — the sliver rank), and the unflagged rows get
    // NULL exactly as the reference's left-join miss does. All four
    // windows share ONE hashpartitioning(id_apcd) exchange; only the
    // per-window in-partition sort differs. Oracle-verified
    // hash-identical at sf0.001/0.01/0.1 (q142/q143/q246).
    // sort on the NORMALIZED predicate, not the raw column: the
    // sliver-rank equivalence needs every flag=1 row to sort before all
    // other rows of the person, which `col(flag).desc` only gives for
    // non-null {0,1} flags — `(flag === 1).desc` (false/null together,
    // true first) keeps the guarantee even if an upstream flag ever
    // turns nullable or multi-valued (ADVICE r14)
    def conceptSeqCol(flag: String): Column =
      when(col(flag) === 1,
        dense_rank().over(Window.partitionBy(col("id_apcd"))
          .orderBy((col(flag) === 1).desc, col("first_service_date"))))
    val withSeqs = flagged
      .withColumn("pc_visit_seq", conceptSeqCol("pc_visit"))
      .withColumn("inpatient_seq", conceptSeqCol("inpatient"))
      .withColumn("ed_perform_seq", conceptSeqCol("ed_perform"))
    // step 10: Yale ED population-health 1-day episode clustering —
    // the same flag-DESC trick applied to [[Intervals.islandIds]]'s
    // lag/flag/running-sum formulation (from = to = first_service_date,
    // maxGapDays = 1, tie-break last_service_date, claim_header_id).
    // For an ED row every preceding row in its window is also ED, so
    // lag/sum see exactly the sliver; non-ED rows sort after all ED
    // rows and their start-flags never enter an ED row's running sum.
    val edFlag = when(col("ed_yale_carrier") === 1 ||
      col("ed_yale_opt") === 1 || col("ed_yale_ipt") === 1, 1).otherwise(0)
    // islandIds orders (from, to, tie-breaks); here from == to ==
    // first_service_date, so the key appears ONCE (the r14 duplicate
    // was a copy of that mirror, not a semantic need — ADVICE r14)
    val wEd = Window.partitionBy(col("id_apcd"))
      .orderBy((edFlag === 1).desc, col("first_service_date"),
        col("last_service_date"), col("claim_header_id"))
    val prevTo = lag(col("first_service_date"), 1).over(wEd)
    val isStart = when(prevTo.isNull ||
      datediff(col("first_service_date"), prevTo) > 1, 1).otherwise(0)
    // step 11: final projection
    val out = withSeqs
      .withColumn("ed_pophealth_seq",
        when(edFlag === 1, sum(isStart).over(
          wEd.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    out.select((Seq("id_apcd", "claim_header_id", "product_code_id",
      "first_service_date", "last_service_date", "first_paid_date",
      "last_paid_date", "charge_amt", "primary_diagnosis", "icdcm_version",
      "claim_status_id", "claim_type_apcd_id", "claim_type_id",
      "type_of_bill_code", "mh_primary", "mh_any", "sud_primary",
      "sud_any") ++ flagCols ++ Seq("ed_perform", "ed_yale_carrier",
      "ed_yale_opt", "ed_yale_ipt", "inpatient", "discharge_date",
      "pc_visit", "pc_visit_seq", "inpatient_seq", "ed_perform_seq",
      "ed_pophealth_seq")).map(col): _*).distinct()
  }
}
