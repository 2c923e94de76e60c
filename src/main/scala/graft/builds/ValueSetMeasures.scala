package graft.builds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Value-set-driven RDA/HEDIS measure feeders — the reference's DSHS
  * treatment-penetration family and the two small HEDIS-coded views that
  * share its join shape:
  *
  *  - TPM mental-health treatment penetration
  *    (create_stage.v_perf_tpm_numerator.sql:46-130,
  *    create_stage.v_perf_tpm_denominator.sql:58-135)
  *  - TPM by diagnosis sub-group
  *    (create_stage.v_perf_tpm_by_dx_numerator.sql:11-84,
  *    create_stage.v_perf_tpm_by_dx_denominator.sql:9-58)
  *  - TPO opioid / TPS SUD penetration — the same three kernels with
  *    different value-set names and claim frames
  *    (create_stage.v_perf_tpo_*.sql, create_stage.v_perf_tps_*.sql;
  *    the TPS numerator create_stage.v_perf_tps_numerator.sql:40-160
  *    is [[codeValueSet]] over procedure/DRG/NDC frames UNIONed with
  *    the [[dxValueSet]] INTERSECT arm — encounters needing both a
  *    Set-6 procedure and a Set-1 primary diagnosis)
  *  - CAP ambulatory visits (create_stage.v_perf_cap_ambulatory_visit.sql)
  *  - MH/AOD ED-episode pivot (create_stage.v_mcaid_mh_aod_ed.sql)
  *  - the perf_staging N/D aggregation that consumes them
  *    (create_stage.sp_perf_staging.sql:414-492)
  *
  * Scale shape: `ref.rda_value_set` / `archive.hedis_code_system` are
  * small curated dims (thousands of codes), so every kernel here is ONE
  * broadcast hash equi-join per claim frame — the fact scan never
  * shuffles on the code. The reference's ICD9-vs-ICD10 split (two UNIONed
  * SELECTs per table with a version predicate and a date cut) collapses
  * into a single equi-join by deriving the claim-side code_set from
  * icdcm_version and putting the per-version date cut in one residual
  * predicate — same rows, half the scans.
  */
object ValueSetMeasures {

  /** Generic value-set membership join: claims with a code column vs the
    * broadcast value-set dim filtered to one value_set_name and its code
    * systems. Works for procedure (CPT/HCPCS), pharmacy (NDC), line
    * revenue (UBREV) and header DRG frames alike — the TPS denominator is
    * this kernel over four different frames
    * (create_stage.v_perf_tps_denominator.sql).
    *
    * @param claims frame carrying `codeCol` plus passthrough columns
    * @param rda (value_set_name, code_set, code, sub_group, active) dim
    * @param activeOnly replicate the reference's `active = 'Y'` residual
    *                   (only TPO's NDC arm sets it)
    */
  def codeValueSet(claims: DataFrame, codeCol: String, rda: DataFrame,
      valueSetName: String, codeSets: Seq[String],
      activeOnly: Boolean = false): DataFrame = {
    val dim = rda.filter(col("value_set_name") === valueSetName &&
        col("code_set").isin(codeSets: _*) &&
        (if (activeOnly) col("active") === "Y" else lit(true)))
      .select(col("code"), col("sub_group"))
    claims.join(broadcast(dim), claims(codeCol) === dim("code"))
  }

  /** Diagnosis value-set membership with the reference's version split:
    * ICD9CM rows match version-9 claims before the cutover date, ICD10CM
    * rows match version-10 claims on/after it — one equi-join on
    * (code_set, code) with the cut as a residual, not two UNIONed scans.
    *
    * @param dx (id_person, claim_id, first_service_date, icdcm_version,
    *           icdcm_number, icdcm_norm) claim-diagnosis rows
    * @param primaryOnly restrict to icdcm_number = '01' (numerators);
    *                    denominators take any diagnosis position
    */
  def dxValueSet(dx: DataFrame, rda: DataFrame, valueSetName: String,
      primaryOnly: Boolean, cutDate: String = "2015-10-01"): DataFrame = {
    val cut = to_date(lit(cutDate))
    val dim = rda.filter(col("value_set_name") === valueSetName &&
        col("code_set").isin("ICD9CM", "ICD10CM"))
      .select(col("code_set").as("vs_code_set"), col("code"),
        col("sub_group"))
    val claimCodeSet = when(col("icdcm_version") === 9, "ICD9CM")
      .when(col("icdcm_version") === 10, "ICD10CM")
    dx.filter(if (primaryOnly) col("icdcm_number") === "01" else lit(true))
      // the version/date cut: ICD9 claims count only before the cutover,
      // ICD10 claims only on/after (v_perf_tpm_denominator.sql WHERE)
      .filter(when(col("icdcm_version") === 9,
          col("first_service_date") < cut)
        .otherwise(col("first_service_date") >= cut))
      .join(broadcast(dim),
        claimCodeSet === col("vs_code_set") &&
        col("icdcm_norm") === col("code"))
  }

  private val tpCols = Seq("id_person", "claim_id", "first_service_date")

  private def tagged(df: DataFrame): DataFrame =
    df.select(tpCols.map(col) :+ lit(1).as("flag"): _*)

  /** TPM numerator (create_stage.v_perf_tpm_numerator.sql:46-130):
    * outpatient procedure in MH-procedure-value-set, UNION (procedure in
    * MH-procedure-with-Dx-value-set INTERSECT primary diagnosis in
    * MH-Dx-value-set). T-SQL UNION/INTERSECT are distinct set ops. */
  def tpmNumerator(proc: DataFrame, dx: DataFrame, rda: DataFrame,
      cutDate: String = "2015-10-01"): DataFrame = {
    val procAlone = tagged(codeValueSet(proc, "procedure_code", rda,
      "MH-procedure-value-set", Seq("CPT", "HCPCS")))
    val procWithDx = tagged(codeValueSet(proc, "procedure_code", rda,
      "MH-procedure-with-Dx-value-set", Seq("CPT", "HCPCS")))
    val primaryDx = tagged(dxValueSet(dx, rda, "MH-Dx-value-set",
      primaryOnly = true, cutDate))
    procAlone.union(procWithDx.intersect(primaryDx)).distinct()
  }

  /** TPM denominator (create_stage.v_perf_tpm_denominator.sql:58-135):
    * numerator claims UNION any-position MH diagnosis UNION psychotropic
    * pharmacy fill (rx_fill_date standing in for first_service_date). */
  def tpmDenominator(numerator: DataFrame, dx: DataFrame, pharm: DataFrame,
      rda: DataFrame, cutDate: String = "2015-10-01"): DataFrame = {
    val anyDx = tagged(dxValueSet(dx, rda, "MH-Dx-value-set",
      primaryOnly = false, cutDate))
    val rx = tagged(codeValueSet(
      pharm.withColumn("first_service_date", col("rx_fill_date")),
      "ndc", rda, "MH-Rx-value-set", Seq("NDC")))
    numerator.select(tpCols.map(col) :+ col("flag"): _*)
      .union(anyDx).union(rx).distinct()
  }

  /** The perf_staging aggregation (create_stage.sp_perf_staging.sql:
    * 456-492): one row per (year_month, person) with MAX(flag), tagged
    * 'N' or 'D'. Partial aggregation makes this one map-side-combined
    * shuffle over (ym, person) regardless of claim fan-in. */
  def staging(claims: DataFrame, measureName: String,
      numDenom: String): DataFrame =
    claims.groupBy(
        (year(col("first_service_date")) * 100 +
          month(col("first_service_date"))).as("year_month"),
        col("id_person"))
      .agg(max(col("flag")).as("measure_value"))
      .select(col("year_month"), col("id_person"),
        lit(measureName).as("measure_name"),
        lit(numDenom).as("num_denom"), col("measure_value"))

  /** TPM end-to-end: numerator + denominator staging rows stacked, the
    * unit the reference INSERTs into stage.perf_staging. */
  def tpmStaging(proc: DataFrame, dx: DataFrame, pharm: DataFrame,
      rda: DataFrame, measureName: String,
      cutDate: String = "2015-10-01"): DataFrame = {
    val num = tpmNumerator(proc, dx, rda, cutDate)
    staging(num, measureName, "N")
      .unionAll(staging(tpmDenominator(num, dx, pharm, rda, cutDate),
        measureName, "D"))
  }

  /** TPO opioid treatment penetration
    * (create_stage.v_perf_tpo_numerator.sql:44-104,
    * create_stage.v_perf_tpo_denominator.sql:40-150) — the TPM sibling
    * with a different arm structure: numerator = MAT pharmacy fill (NDC
    * set, the family's only `active = 'Y'` residual) UNION
    * receipt-of-MAT procedure (HCPCS); denominator = OUD diagnosis in
    * ANY position (ICD9/10 with the 2015-10-01 version cut) UNION both
    * numerator arms. Same broadcast value-set kernels; the TPS SUD
    * variant is this shape again under the SUD-Tx-Pen-* names. */
  def tpoStaging(proc: DataFrame, dx: DataFrame, pharm: DataFrame,
      rda: DataFrame, measureName: String,
      cutDate: String = "2015-10-01"): DataFrame = {
    val rx = tagged(codeValueSet(
      pharm.withColumn("first_service_date", col("rx_fill_date")),
      "ndc", rda, "OUD-Tx-Pen-Value-Set-2", Seq("NDC"),
      activeOnly = true))
    val mat = tagged(codeValueSet(proc, "procedure_code", rda,
      "OUD-Tx-Pen-Receipt-of-MAT", Seq("HCPCS")))
    val num = rx.union(mat).distinct()
    val den = num.union(tagged(dxValueSet(dx, rda,
      "OUD-Tx-Pen-Value-Set-1", primaryOnly = false, cutDate)))
      .distinct()
    staging(num, measureName, "N")
      .unionAll(staging(den, measureName, "D"))
  }

  /** ED-visit numerator (create_stage.v_perf_ed_visit_num.sql): every ED
    * visit counts (same-day visits on separate claims each count) —
    * three qualification routes UNION-distinct'ed: (1) ED claim type +
    * place-of-service 23; (2) ED claim type + an ED revenue-code line;
    * (3) ED claim type + an ED E&M procedure code. Each route is one
    * equi-join (lines/procs co-keyed on claim_id); the distinct collapses
    * multi-line/multi-code fan-out back to claim grain.
    *
    * @param headers claim_id, id_person, first_service_date,
    *   last_service_date, clm_type, pos */
  def edVisitNum(headers: DataFrame, lines: DataFrame, procs: DataFrame,
      edClaimTypes: Seq[String] = Seq("3", "26", "34"),
      edPos: Seq[String] = Seq("23"),
      edRevCodes: Seq[String] =
        Seq("0450", "0451", "0452", "0456", "0459"),
      edProcCodes: Seq[String] =
        Seq("99281", "99282", "99283", "99284", "99285", "99288"))
      : DataFrame = {
    val ed = headers.filter(col("clm_type").isin(edClaimTypes: _*))
    val out = Seq("id_person", "claim_id", "first_service_date",
      "last_service_date").map(col)
    val byPos = ed.filter(col("pos").isin(edPos: _*)).select(out: _*)
    val byRev = ed.join(
      lines.filter(col("rev_code").isin(edRevCodes: _*))
        .select(col("claim_id")), Seq("claim_id"), "left_semi")
      .select(out: _*)
    val byProc = ed.join(
      procs.filter(col("procedure_code").isin(edProcCodes: _*))
        .select(col("claim_id")), Seq("claim_id"), "left_semi")
      .select(out: _*)
    byPos.union(byRev).union(byProc).distinct()
      .select(
        (year(col("first_service_date")) * 100 +
          month(col("first_service_date"))).as("year_month"),
        col("id_person"), col("claim_id"), col("first_service_date"),
        col("last_service_date"), lit(1).as("ed_visit_num"))
  }

  /** One-scan TPM staging — the 100-TB shape of [[tpmStaging]]. The
    * reference algebra operates on (person, claim, date) tuples drawn
    * from the same key space, so UNION ≡ OR and INTERSECT ≡ AND over
    * per-tuple MAX flags (the same argument as
    * [[FuhMeasure.membershipFlags]]): each claim table is scanned ONCE
    * against the union of its value sets with per-set flag columns —
    * procedure once (both procedure sets), diagnosis once (primary flag
    * as a column), pharmacy once — then one tuple-grain aggregation
    * feeds both the numerator and denominator filters. The set-op path
    * re-derives the numerator lineage inside the denominator (~9 scans);
    * this is 3 scans + one shuffle. ValueSetMeasuresSpec pins equality
    * against [[tpmStaging]]; the DuckDB oracle (set-op formulation) pins
    * it again at three scales. */
  def tpmStagingOneScan(proc: DataFrame, dx: DataFrame, pharm: DataFrame,
      rda: DataFrame, measureName: String,
      cutDate: String = "2015-10-01"): DataFrame = {
    val zero = lit(0)
    val procDim = rda.filter(col("value_set_name").isin(
        "MH-procedure-value-set", "MH-procedure-with-Dx-value-set") &&
        col("code_set").isin("CPT", "HCPCS"))
      .select(col("code"), col("value_set_name").as("_vs"))
    val tProc = proc.join(broadcast(procDim),
        col("procedure_code") === col("code"))
      .select(tpCols.map(col) ++ Seq(
        when(col("_vs") === "MH-procedure-value-set", 1).otherwise(0)
          .as("p1"),
        when(col("_vs") === "MH-procedure-with-Dx-value-set", 1)
          .otherwise(0).as("p2"),
        zero.as("dxp"), zero.as("dxa"), zero.as("rx")): _*)
    val tDx = dxValueSet(dx, rda, "MH-Dx-value-set", primaryOnly = false,
        cutDate)
      .select(tpCols.map(col) ++ Seq(zero.as("p1"), zero.as("p2"),
        when(col("icdcm_number") === "01", 1).otherwise(0).as("dxp"),
        lit(1).as("dxa"), zero.as("rx")): _*)
    val tRx = codeValueSet(
        pharm.withColumn("first_service_date", col("rx_fill_date")),
        "ndc", rda, "MH-Rx-value-set", Seq("NDC"))
      .select(tpCols.map(col) ++ Seq(zero.as("p1"), zero.as("p2"),
        zero.as("dxp"), zero.as("dxa"), lit(1).as("rx")): _*)
    val flags = tProc.unionAll(tDx).unionAll(tRx)
      .groupBy(tpCols.map(col): _*)
      .agg(max(col("p1")).as("p1"), max(col("p2")).as("p2"),
        max(col("dxp")).as("dxp"), max(col("dxa")).as("dxa"),
        max(col("rx")).as("rx"))
    val isNum = col("p1") === 1 || (col("p2") === 1 && col("dxp") === 1)
    val one = (df: DataFrame) => df.withColumn("flag", lit(1))
    staging(one(flags.filter(isNum)), measureName, "N")
      .unionAll(staging(one(flags.filter(isNum ||
        col("dxa") === 1 || col("rx") === 1)), measureName, "D"))
  }

  /** TPM-by-diagnosis numerator
    * (create_stage.v_perf_tpm_by_dx_numerator.sql:11-84): a qualifying
    * procedure claim counts toward EVERY sub-group (the reference CROSS
    * JOINs the 7-row sub-group list), while a primary-dx claim counts
    * toward its code's sub-group IF the claim also carries a
    * with-Dx-value-set procedure (`claim_header_id IN (...)` — a
    * LEFT SEMI join here, so the probe side never duplicates). */
  def tpmByDxNumerator(proc: DataFrame, dx: DataFrame, rda: DataFrame,
      subGroups: Seq[String],
      cutDate: String = "2015-10-01"): DataFrame = {
    import proc.sparkSession.implicits._
    val procAlone = codeValueSet(proc, "procedure_code", rda,
        "MH-procedure-value-set", Seq("CPT", "HCPCS"))
      .select(tpCols.map(col): _*)
      .crossJoin(broadcast(subGroups.toDF("sub_group")))
    val withDxClaims = codeValueSet(proc, "procedure_code", rda,
        "MH-procedure-with-Dx-value-set", Seq("CPT", "HCPCS"))
      .select(col("claim_id"))
    val dxArm = dxValueSet(dx, rda, "MH-Dx-value-set", primaryOnly = true,
        cutDate)
      .select(tpCols.map(col) :+ col("sub_group"): _*)
      .join(withDxClaims, Seq("claim_id"), "left_semi")
    procAlone.select(tpCols.map(col) :+ col("sub_group"): _*)
      .union(dxArm.select(tpCols.map(col) :+ col("sub_group"): _*))
      .distinct()
      .withColumn("flag", lit(1))
  }

  /** Pharmacy-class -> diagnosis sub-group recode of the by-dx
    * denominator (create_stage.v_perf_tpm_by_dx_denominator.sql:40-52).
    * 'Antimania Rx' -> 'Mania/Bipolar' etc.; classes outside the map
    * (none in the reference) fall out as NULL sub_group, matching the
    * unmatched-CASE NULL. */
  def tpmByDxDenominator(dx: DataFrame, pharm: DataFrame, rda: DataFrame,
      rxRecode: Map[String, String],
      cutDate: String = "2015-10-01"): DataFrame = {
    val anyDx = dxValueSet(dx, rda, "MH-Dx-value-set", primaryOnly = false,
        cutDate)
      .select(tpCols.map(col) :+ col("sub_group"): _*)
    val recode = rxRecode.foldLeft(lit(null).cast("string")) {
      case (acc, (k, v)) =>
        when(col("sub_group") === k, v).otherwise(acc)
    }
    val rx = codeValueSet(
        pharm.withColumn("first_service_date", col("rx_fill_date")),
        "ndc", rda, "MH-Rx-value-set", Seq("NDC"))
      .select(tpCols.map(col) :+ recode.as("sub_group"): _*)
    anyDx.union(rx).distinct().withColumn("flag", lit(1))
  }

  /** Per-sub-group staging (create_stage.sp_perf_staging.sql:777-849):
    * the measure key is derived from the sub-group, so the aggregate is
    * keyed (year_month, person, sub_group). */
  def byDxStaging(claims: DataFrame, measurePrefix: String,
      numDenom: String): DataFrame =
    claims.groupBy(
        (year(col("first_service_date")) * 100 +
          month(col("first_service_date"))).as("year_month"),
        col("id_person"), col("sub_group"))
      .agg(max(col("flag")).as("measure_value"))
      .select(col("year_month"), col("id_person"),
        concat(lit(measurePrefix + ": "), col("sub_group"))
          .as("measure_name"),
        lit(numDenom).as("num_denom"), col("measure_value"))

  /** CAP ambulatory visits
    * (create_stage.v_perf_cap_ambulatory_visit.sql): the 'Ambulatory
    * Visits' HEDIS set matched against procedure (CPT/HCPCS), ICD-10
    * diagnosis, and line revenue code (UBREV) frames, UNION-distinct,
    * stamped with the service year_month. The reference joins a date dim
    * row-per-day for year_month; deriving it arithmetically is the same
    * value without shipping a broadcast the size of the calendar. */
  def capAmbulatoryVisits(proc: DataFrame, dx10: DataFrame,
      lines: DataFrame, hedis: DataFrame): DataFrame = {
    def arm(claims: DataFrame, codeCol: String, sets: Seq[String]) =
      codeValueSet(claims, codeCol, hedis, "Ambulatory Visits", sets)
        .select(col("id_person"), col("claim_id"),
          col("first_service_date"), col("last_service_date"),
          lit(1).as("flag"))
    arm(proc, "procedure_code", Seq("CPT", "HCPCS"))
      .union(arm(dx10, "icdcm_norm", Seq("ICD10CM")))
      .union(arm(lines, "rev_code", Seq("UBREV")))
      .distinct()
      .select(
        (year(col("first_service_date")) * 100 +
          month(col("first_service_date"))).as("year_month"),
        col("id_person"), col("claim_id"), col("first_service_date"),
        col("last_service_date"), col("flag"))
  }

  /** MH/AOD ED-episode pivot (create_stage.v_mcaid_mh_aod_ed.sql): ED
    * population-health episodes whose primary ICD-10 diagnosis falls in
    * the Mental Illness or AOD value sets, PIVOTed to one row per episode
    * with a 0/1 flag per set. `pivot` gets the EXPLICIT value list so no
    * extra distinct-scan job runs to discover it, and the aggregation is
    * a plain partial-aggregated shuffle on the episode id.
    *
    * @param headers (ed_pophealth_id, icdcm_version, primary_diagnosis)
    *                claim headers; NULL episode ids are dropped as in the
    *                reference's WHERE. */
  def mhAodEd(headers: DataFrame, hedis: DataFrame): DataFrame = {
    val sets = Seq("Mental Illness", "AOD Abuse and Dependence")
    val dim = hedis.filter(col("value_set_name").isin(sets: _*))
      .select(col("value_set_name"), col("code"))
    headers.filter(col("ed_pophealth_id").isNotNull &&
        col("icdcm_version") === 10)
      .join(broadcast(dim), col("primary_diagnosis") === col("code"))
      .groupBy(col("ed_pophealth_id"))
      .pivot(col("value_set_name"), sets)
      .agg(max(lit(1)))
      .select(col("ed_pophealth_id"),
        coalesce(col("Mental Illness"), lit(0)).as("mental_illness"),
        coalesce(col("AOD Abuse and Dependence"), lit(0))
          .as("aod_abuse_dependence"))
  }

  /** FUA follow-up visits
    * (create_stage.fn_perf_fua_follow_up_visit.sql:74-396) — the HEDIS
    * five-condition UNION, each condition an INTERSECT of claim sets at
    * (person, claim, first/last service date) grain:
    *
    *  1. IET Stand Alone Visits (CPT/HCPCS procedures ∪ UBREV lines)
    *     ∩ AOD primary dx;
    *  2. IET Visits Group 1 (CPT) ∩ IET POS Group 1 (header place of
    *     service) ∩ AOD primary dx;
    *  3. IET Visits Group 2 ∩ IET POS Group 2 ∩ AOD primary dx;
    *  4. Telephone Visits ∩ AOD primary dx;
    *  5. Online Assessments ∩ AOD primary dx.
    *
    * AOD primary dx = icdcm_number '01' AND icdcm_version = 10 (the
    * reference joins only the ICD10CM rows — no ICD-9 arm), all arms
    * window-filtered on first_service_date. The telehealth-modifier
    * value set appears only in the reference's comments ("with or
    * without a telehealth modifier") — it never joins, and neither
    * here.
    *
    * Scale: every HEDIS dim broadcasts; INTERSECT/UNION distinct
    * shuffle on the claim-grain key. */
  def fuaFollowUpVisits(proc: DataFrame, lines: DataFrame,
      headers: DataFrame, dx: DataFrame, hedis: DataFrame,
      winFrom: String, winTo: String): DataFrame = {
    val out = Seq("id_person", "claim_id", "first_service_date",
      "last_service_date").map(col)
    def win(df: DataFrame) = df.filter(
      col("first_service_date").between(lit(winFrom), lit(winTo)))
    def codes(vs: String, systems: Seq[String]) =
      hedis.filter(col("value_set_name") === vs &&
        col("code_system").isin(systems: _*)).select(col("code"))
    def procArm(vs: String, systems: Seq[String]) =
      win(proc).join(broadcast(codes(vs, systems)),
        col("procedure_code") === col("code")).select(out: _*)
    def lineArm(vs: String) =
      win(lines).join(broadcast(codes(vs, Seq("UBREV"))),
        col("rev_code") === col("code")).select(out: _*)
    def posArm(vs: String) =
      win(headers).join(broadcast(codes(vs, Seq("POS"))),
        col("pos") === col("code")).select(out: _*)
    val aod = win(dx)
      .filter(col("icdcm_version") === 10 && col("icdcm_number") === "01")
      .join(broadcast(codes("AOD Abuse and Dependence", Seq("ICD10CM"))),
        col("icdcm_norm") === col("code")).select(out: _*)
    val c1 = procArm("IET Stand Alone Visits", Seq("CPT", "HCPCS"))
      .union(lineArm("IET Stand Alone Visits")).intersect(aod)
    val c2 = procArm("IET Visits Group 1", Seq("CPT"))
      .intersect(posArm("IET POS Group 1")).intersect(aod)
    val c3 = procArm("IET Visits Group 2", Seq("CPT"))
      .intersect(posArm("IET POS Group 2")).intersect(aod)
    val c4 = procArm("Telephone Visits", Seq("CPT")).intersect(aod)
    val c5 = procArm("Online Assessments", Seq("CPT")).intersect(aod)
    c1.union(c2).union(c3).union(c4).union(c5).distinct()
      .withColumn("flag", lit(1))
  }
}
