package graft.qa

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The per-claim-table QA batteries the mcaid master script runs between
  * each claim-stage load and its final promote
  * (qa_stage.mcaid_claim_icdcm_header.R:63-340, qa_stage.mcaid_claim_line
  * .R:63-255, qa_stage.mcaid_claim_procedure.R:63-280,
  * qa_stage.mcaid_claim_pharm.R:60-218 — the gates
  * master_mcaid_analytic.R sums into its hard stop). Each battery emits
  * the reference's metadata.qa_mcaid rows verbatim — (table_name,
  * qa_item, qa_result, note), the volatile last_run/qa_date columns
  * dropped — with the glue note templates rendered exactly, including
  * the reference's quirks:
  *
  *  - the elig-containment FAIL note says "{n} more IDs than in the
  *    final ..." via `ifelse(chk >= 0, 'more', 'fewer')` even though
  *    chk counts claimants MISSING from elig (it is never negative);
  *  - the dx-coverage FAIL note inserts the word "table" that the PASS
  *    note omits;
  *  - the pharm year-change row's qa_item is 'Change in number of
  *    pharmacy claim rows' in the PASS branch but '... claim row' in
  *    both FAIL branches, and its no-change note says "claim lines";
  *  - the year comparison LEFT-joins from the NEW side, so a year
  *    present only in the prior table escapes the check entirely;
  *  - the no-change branch fires on min(pct)+max(pct) == 0, so a year
  *    up x% exactly cancelling a year down x% reports "No change".
  *
  * Deviation (documented): R renders pct_change via as.character on
  * round(round(pct, 4), 2) — banker's rounding and trailing-zero
  * trimming. Doubles do not format identically across Spark and DuckDB,
  * so the pct here is fixed-point: centi-percent = round(|diff| *
  * 10000 / prior) half-up on the absolute value (sign applied after,
  * so Scala and SQL agree on .5 cases), rendered with R's
  * trailing-zero trim ("5", "5.1", "5.13") and "Inf" when the prior
  * year count is 0 (R's diff/0 = Inf). The branch test runs on
  * micro-percent integers the same way.
  *
  * Scale: every check is a distributed aggregate collected as ONE
  * verdict row (the year comparison collects one row per calendar
  * year). The elig-containment check is one scan over the DISTINCT
  * claimant ids with two left joins — person-grain inputs, so the
  * exchange is the id hash, never the claim-line fact. Callers should
  * materialize the stage frame once (localCheckpoint) before the
  * battery fan-out — the q246 discipline — since the battery reads it
  * 3-4 times.
  */
object ClaimTableQa {

  /** One metadata.qa_mcaid row: (table_name, qa_item, qa_result, note). */
  type QaRow = (String, String, String, String)

  /** +Inf sentinel for a year whose prior count is 0 (R's x/0 = Inf). */
  private val InfPct = Long.MaxValue

  def toDf(s: SparkSession, rows: Seq[QaRow]): DataFrame = {
    import s.implicits._
    rows.toDF("table_name", "qa_item", "qa_result", "note")
  }

  /** 'Distinct IDs compared to elig tables' (qa_stage.mcaid_claim_*.R —
    * identical across the claim batteries): claimants absent from
    * elig_demo and from elig_timevar, counted in one scan over the
    * distinct stage ids with two left joins. `quoted` renders the bh
    * battery's variant whose glue template wraps the note in LITERAL
    * single quotes (qa_stage.mcaid_claim_bh.R:109-117 — the apostrophes
    * are inside the string, a reference quirk kept verbatim). */
  def idsVsEligRow(stage: DataFrame, idCol: String,
      demoIds: DataFrame, demoIdCol: String,
      timevarIds: DataFrame, tvIdCol: String, table: String,
      quoted: Boolean = false): QaRow = {
    val r = stage.select(col(idCol).as("qa_id")).distinct()
      .join(demoIds.select(col(demoIdCol).as("qa_d")).distinct(),
        col("qa_id") === col("qa_d"), "left")
      .join(timevarIds.select(col(tvIdCol).as("qa_t")).distinct(),
        col("qa_id") === col("qa_t"), "left")
      .agg(coalesce(sum(when(col("qa_d").isNull, 1L).otherwise(0L)), lit(0L)),
        coalesce(sum(when(col("qa_t").isNull, 1L).otherwise(0L)), lit(0L)))
      .head()
    val d = r.getLong(0)
    val tv = r.getLong(1)
    def mf(x: Long) = if (x >= 0) "more" else "fewer"
    val q = if (quoted) "'" else ""
    if (d == 0 && tv == 0)
      (table, "Distinct IDs compared to elig tables", "PASS",
        s"${q}There were the same number of IDs as in the final " +
          s"mcaid_elig_demo and mcaid_elig_timevar tables$q")
    else
      (table, "Distinct IDs compared to elig tables", "FAIL",
        s"${q}There were $d ${mf(d)} IDs than in the final " +
          s"mcaid_elig_demo table and $tv ${mf(tv)} IDs than in the " +
          s"final mcaid_elig_timevar table$q")
  }

  /** R-style fixed-point pct rendering: centi-percent of |diff|/prior,
    * trailing zeros trimmed ("5", "5.1", "5.13"); "Inf" for prior 0. */
  def pctString(diffAbs: Long, prior: Long): String =
    if (prior == 0L) "Inf"
    else {
      val c = math.round(diffAbs * 10000.0 / prior)
      val whole = c / 100
      val frac = c % 100
      if (frac == 0) s"$whole"
      else if (frac % 10 == 0) s"$whole.${frac / 10}"
      else s"$whole." + f"$frac%02d"
    }

  /** ', '-glued list with R glue_collapse's ' and ' before the last
    * element. */
  private def glueList(els: Seq[String]): String =
    if (els.length <= 1) els.mkString
    else els.init.mkString(", ") + " and " + els.last

  /** 'Change in number of <X>' — per-year counts of the new stage frame
    * vs the prior final table (LEFT join from the new side — the
    * reference quirk above), with the reference's three-branch verdict.
    * `qaItemFail` exists for the pharm battery's rows/row qa_item split;
    * the other batteries pass the same string twice. */
  def yearChangeRow(cur: DataFrame, prior: DataFrame, dateCol: String,
      table: String, qaItemPass: String, qaItemFail: String,
      listUnit: String, noChangeUnit: String): QaRow = {
    val n = cur.groupBy(year(col(dateCol)).as("qa_y"))
      .agg(count(lit(1)).as("qa_new"))
    val p = prior.groupBy(year(col(dateCol)).as("qa_py"))
      .agg(count(lit(1)).as("qa_cur"))
    // one row per calendar year on the driver — bounded by the data's
    // year span, the same cardinality the reference pulls into R
    val rows = n.join(p, col("qa_y") === col("qa_py"), "left")
      .select(col("qa_y"),
        col("qa_new"), coalesce(col("qa_cur"), lit(0L)).as("qa_cur"))
      .orderBy(col("qa_y"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // micro-percent integers for the branch test (sign applied after
    // the half-up round of the absolute value, so SQL replays exactly)
    def microPct(nw: Long, cu: Long): Long =
      if (cu == 0L) InfPct
      else {
        val m = math.round(math.abs(nw - cu) * 1000000.0 / cu)
        if (nw >= cu) m else -m
      }
    val micro = rows.map { case (_, nw, cu) => microPct(nw, cu) }
    // an empty frame pair degrades to the no-change FAIL branch (the
    // empty-input sweep runs every catalog query on empty tables)
    val maxM = if (micro.isEmpty) 0L else micro.max
    val minM = if (micro.isEmpty) 0L else micro.min
    def list(pred: Long => Boolean, word: String): String =
      glueList(rows.zip(micro).collect { case ((y, nw, cu), m)
          if pred(m) =>
        s"$y (${pctString(math.abs(nw - cu), cu)}% $word)"
      }.toSeq)
    if (maxM > 0 && minM >= 0)
      (table, qaItemPass, "PASS",
        s"The following years had more $listUnit than in the final " +
          s"schema table: ${list(_ > 0, "more")}")
    else if (minM + maxM == 0)
      (table, qaItemFail, "FAIL",
        s"No change in the number of $noChangeUnit compared to final " +
          "schema table")
    else
      (table, qaItemFail, "FAIL",
        s"The following years had fewer $listUnit than in the final " +
          s"schema table: ${list(_ < 0, "fewer")}")
  }

  /** qa_stage.mcaid_claim_icdcm_header.R:63-340 — six verdict rows:
    * elig containment, ICD-9 length == 5, ICD-10 length exactly 3-7,
    * icdcm_number domain, dx ref-coverage under the < `dxThreshold`
    * allowance, and the per-year diagnosis-count comparison. The three
    * envelope/domain checks fuse into ONE conditional-aggregation scan
    * (the reference runs three). */
  def icdcmBattery(stage: DataFrame, idCol: String,
      demoIds: DataFrame, demoIdCol: String,
      timevarIds: DataFrame, tvIdCol: String,
      ref: DataFrame, refVersionCol: String, refCodeCol: String,
      prior: DataFrame, table: String, refName: String,
      dxThreshold: Long = 350L): DataFrame = {
    val s = stage.sparkSession
    val allowed: Seq[Any] = (1 to 12).map(i => f"$i%02d") :+ "admit"
    val a = stage.agg(
      min(when(col("icdcm_version") === 9,
        length(col("icdcm_norm")))).as("min9"),
      max(when(col("icdcm_version") === 9,
        length(col("icdcm_norm")))).as("max9"),
      min(when(col("icdcm_version") === 10,
        length(col("icdcm_norm")))).as("min10"),
      max(when(col("icdcm_version") === 10,
        length(col("icdcm_norm")))).as("max10"),
      coalesce(sum(when(!col("icdcm_number").isin(allowed: _*),
        1L).otherwise(0L)), lit(0L)).as("badnum")).head()
    def gi(i: Int): Int = if (a.isNullAt(i)) 0 else a.getInt(i)
    val (min9, max9) = (gi(0), gi(1))
    val (min10, max10) = (gi(2), gi(3))
    val badNum = a.getLong(4)
    val icd9Row =
      if (min9 == 5 && max9 == 5)
        (table, "Length of ICD-9-CM codes", "PASS",
          "The ICD-9-CM codes were all 5 characters in length")
      else
        (table, "Length of ICD-9-CM codes", "FAIL",
          s"The ICD-9-CM codes ranged from $min9 to $max9 characters " +
            "in length (should be all 5)")
    val icd10Row =
      if (min10 == 3 && max10 == 7)
        (table, "Length of ICD-10-CM codes", "PASS",
          s"The ICD-10-CM codes ranged from $min10 to $max10 " +
            "characters in length, as expected")
      else
        (table, "Length of ICD-10-CM codes", "FAIL",
          s"The ICD-10-CM codes ranged from $min10 to $max10 " +
            "characters in length (should be 3-7)")
    val numRow =
      if (badNum == 0)
        (table, "icdcm_number = 01-12 or admit", "PASS",
          "All icdcm_number values were 01:12 or admit")
      else
        (table, "icdcm_number = 01-12 or admit", "FAIL",
          s"There were $badNum icdcm_number values not 01 through 12 " +
            "or admit")
    val refR = ref.select(col(refVersionCol).as("qa_ref_v"),
      col(refCodeCol).as("qa_ref_c")).distinct()
    val dx = stage.select(col("icdcm_version"), col("icdcm_norm"))
      .distinct()
      .join(refR, col("icdcm_version") === col("qa_ref_v") &&
        col("icdcm_norm") === col("qa_ref_c"), "left_anti")
      .count()
    val dxRow =
      if (dx < dxThreshold)
        (table, "Almost all dx codes join to ICD-CM reference table",
          "PASS", s"There were $dx dx values not in $refName " +
            s"(acceptable is < $dxThreshold)")
      else
        (table, "Almost all dx codes join to ICD-CM reference table",
          "FAIL", s"There were $dx dx values not in $refName table " +
            s"(acceptable is < $dxThreshold)")
    toDf(s, Seq(
      idsVsEligRow(stage, idCol, demoIds, demoIdCol, timevarIds,
        tvIdCol, table),
      icd9Row, icd10Row, numRow, dxRow,
      yearChangeRow(stage, prior, "last_service_date", table,
        "Change in number of diagnoses", "Change in number of diagnoses",
        "diagnoses", "diagnoses")))
  }

  /** qa_stage.mcaid_claim_line.R:63-255 — four verdict rows: elig
    * containment, distinct claim lines vs the raw load, the rev_code
    * 4-digit-numeric shape, and the per-year claim-line comparison. */
  def lineBattery(stage: DataFrame, idCol: String, lineIdCol: String,
      demoIds: DataFrame, demoIdCol: String,
      timevarIds: DataFrame, tvIdCol: String,
      raw: DataFrame, rawLineIdCol: String,
      prior: DataFrame, table: String, fromTable: String): DataFrame = {
    val s = stage.sparkSession
    val rowsLine = stage.agg(
      count_distinct(col(lineIdCol)),
      coalesce(sum(when(col("rev_code").isNotNull &&
        (length(col("rev_code")) =!= 4 ||
          !col("rev_code").rlike("^[0-9]+$")), 1L).otherwise(0L)),
        lit(0L))).head()
    val nLine = rowsLine.getLong(0)
    val badRev = rowsLine.getLong(1)
    val nRaw = raw.agg(count_distinct(col(rawLineIdCol))).head().getLong(0)
    val linesRow =
      if (nLine == nRaw)
        (table, "Number of distinct claim lines compared to raw data",
          "PASS", "There were the same number of distinct claim lines " +
            "as in the raw data")
      else
        (table, "Number of distinct claim lines compared to raw data",
          "FAIL", s"$table had $nLine distinct claim lines compared " +
            s"to $nRaw in $fromTable")
    val revRow =
      if (badRev == 0)
        (table, "Format of rev_code field", "PASS",
          "All rows of rev_code formatted properly")
      else
        (table, "Format of rev_code field", "FAIL",
          "rev_code field had some rows with length != 4 or characters")
    toDf(s, Seq(
      idsVsEligRow(stage, idCol, demoIds, demoIdCol, timevarIds,
        tvIdCol, table),
      linesRow, revRow,
      yearChangeRow(stage, prior, "from_srvc_date", table,
        "Change in number of claim lines", "Change in number of claim lines",
        "claim lines", "claim lines")))
  }

  /** qa_stage.mcaid_claim_procedure.R:63-280 — three verdict rows: elig
    * containment, the CPT/HCPCS/ICD-PCS code-system classification with
    * its < 50 unknown-code allowance (modifier rows excluded — the
    * reference keeps modifiers in separate columns, this build unpivots
    * them as 'M*' slot rows), and the per-year procedure comparison.
    * The procedure_code_number domain check is commented out in the
    * reference (:180-214) and is skipped here the same way. */
  def procedureBattery(stage: DataFrame, idCol: String,
      demoIds: DataFrame, demoIdCol: String,
      timevarIds: DataFrame, tvIdCol: String,
      prior: DataFrame, table: String,
      unknownThreshold: Long = 50L): DataFrame = {
    val s = stage.sparkSession
    val unknown = stage
      .filter(!col("pcode_number").startsWith("M"))
      .filter(graft.functions.ProcedureCodes.codeSystem(col("pcode")) ===
        "UNKNOWN")
      .agg(count_distinct(col("pcode"))).head().getLong(0)
    val fmtRow =
      if (unknown < unknownThreshold)
        (table, "Format of procedure codes", "PASS",
          s"There were $unknown distinct procedure codes with an " +
            s"unknown format (<$unknownThreshold ok)")
      else
        (table, "Format of procedure codes", "FAIL",
          s"There were $unknown distinct procedure codes with an " +
            "unknown format")
    toDf(s, Seq(
      idsVsEligRow(stage, idCol, demoIds, demoIdCol, timevarIds,
        tvIdCol, table),
      fmtRow,
      yearChangeRow(stage, prior, "first_service_date", table,
        "Change in number of procedures", "Change in number of procedures",
        "procedures", "procedures")))
  }

  /** qa_stage.mcaid_claim_pharm.R:60-218 — three verdict rows: elig
    * containment, the NDC 11-digit-numeric shape, and the per-year rx
    * comparison (with the reference's rows/row qa_item split and
    * "claim lines" no-change wording). */
  def pharmBattery(stage: DataFrame, idCol: String,
      demoIds: DataFrame, demoIdCol: String,
      timevarIds: DataFrame, tvIdCol: String,
      prior: DataFrame, table: String): DataFrame = {
    val s = stage.sparkSession
    val badNdc = stage.agg(
      coalesce(sum(when(col("ndc").isNotNull &&
        (length(col("ndc")) =!= 11 || !col("ndc").rlike("^[0-9]+$")),
        1L).otherwise(0L)), lit(0L))).head().getLong(0)
    val ndcRow =
      if (badNdc == 0)
        (table, "Format of ndc field", "PASS",
          "All rows of ndc formatted properly")
      else
        (table, "Format of ndc field", "FAIL",
          "ndc field had some rows with length != 11 or numeric")
    toDf(s, Seq(
      idsVsEligRow(stage, idCol, demoIds, demoIdCol, timevarIds,
        tvIdCol, table),
      ndcRow,
      yearChangeRow(stage, prior, "rx_fill_date", table,
        "Change in number of pharmacy claim rows",
        "Change in number of pharmacy claim row",
        "pharmacy claim rows", "pharmacy claim lines")))
  }

  /** Render a pct held in 1e-4-percent fixed-point units, R-style
    * trailing-zero trimmed ("5", "5.1", "5.1234"). */
  def render4(v: Long): String = {
    val whole = v / 10000
    var frac = v % 10000
    if (frac == 0) s"$whole"
    else {
      var digits = 4
      while (frac % 10 == 0) { frac /= 10; digits -= 1 }
      s"$whole." + s"%0${digits}d".format(frac)
    }
  }

  /** 4-dp variant of [[pctString]] for the housing trend note. */
  def pct4String(num: Long, den: Long): String =
    if (den == 0L) "Inf"
    else render4(math.round(num * 1000000.0 / den))

  /** qa_stage.mcaid_claim_bh.R:36-160 — the bh battery: distinct
    * condition count vs the final table, elig containment (with the bh
    * script's literally-quoted notes), and the 2017-style mid-study
    * prevalence frame. The reference only PRINTS the prevalence frame
    * for analyst review (:103-117) — here it lands as INFO rows, since
    * a printed frame is still a QA artifact; the pct is the 2-dp
    * fixed-point rendering. */
  def bhBattery(stage: DataFrame, idCol: String,
      demoIds: DataFrame, demoIdCol: String,
      timevarIds: DataFrame, tvIdCol: String,
      finalTbl: DataFrame, timevarPop: DataFrame, popIdCol: String,
      popFromCol: String, popToCol: String, midYear: Int,
      table: String): DataFrame = {
    val s = stage.sparkSession
    val nCond = stage.agg(count_distinct(col("bh_cond"))).head().getLong(0)
    val nFinal = finalTbl.agg(count_distinct(col("bh_cond"))).head()
      .getLong(0)
    val condRow =
      if (nCond >= nFinal)
        (table, "# distinct conditions", "PASS",
          s"There were $nCond conditions analyzed")
      else
        (table, "# distinct conditions", "FAIL",
          s"There were $nCond conditions analyzed, but there are " +
            s"$nFinal conditions in the final table")
    val pop = timevarPop
      .filter(year(col(popFromCol)) <= midYear &&
        year(col(popToCol)) >= midYear)
      .agg(count_distinct(col(popIdCol))).head().getLong(0)
    // one row per condition — the frame the reference prints
    val prev = stage
      .filter(year(col("first_encounter_date")) <= midYear &&
        year(col("last_encounter_date")) >= midYear)
      .groupBy(col("bh_cond"))
      .agg(count_distinct(col(idCol)).as("id_dcount"))
      .orderBy(col("bh_cond"))
      .collect()
      .map { r =>
        val (cond, n) = (r.getString(0), r.getLong(1))
        (table, s"$midYear prevalence: $cond", "INFO",
          s"$n of $pop members (${pctString(n, pop)}%)")
      }.toSeq
    toDf(s, Seq(condRow,
      idsVsEligRow(stage, idCol, demoIds, demoIdCol, timevarIds,
        tvIdCol, table, quoted = true)) ++ prev)
  }

  /** qa_stage.mcaid_claim_moud.R:60-246 — five verdict rows with the
    * reference's copy-paste quirks kept verbatim: the FAIL branches put
    * the COUNT in the qa_item (not the note), and three unrelated PASS
    * notes reuse the pharm battery's 'All rows of ndc formatted
    * properly'. The three row-level flag checks fuse into ONE
    * conditional-aggregation scan. */
  def moudBattery(stage: DataFrame, idCol: String,
      demoIds: DataFrame, demoIdCol: String,
      timevarIds: DataFrame, tvIdCol: String,
      pharmTmp: DataFrame, adminCol: String,
      unspecAndSupply: org.apache.spark.sql.Column,
      multiFlag: org.apache.spark.sql.Column,
      missingDays: org.apache.spark.sql.Column,
      table: String): DataFrame = {
    val s = stage.sparkSession
    val newNdc = pharmTmp.filter(col(adminCol).isNull).count()
    val a = stage.agg(
      coalesce(sum(when(unspecAndSupply, 1L).otherwise(0L)), lit(0L)),
      coalesce(sum(when(multiFlag, 1L).otherwise(0L)), lit(0L)),
      coalesce(sum(when(missingDays, 1L).otherwise(0L)), lit(0L))).head()
    val (nUnspec, nMulti, nMissing) =
      (a.getLong(0), a.getLong(1), a.getLong(2))
    val ndcRow =
      if (newNdc == 0)
        (table, "No new NDCs", "PASS",
          "All rows of ndc formatted properly")
      else
        (table, s"$newNdc new NDC(s) missing from ref.ndc_codes", "FAIL",
          "ndc field had some rows with length != 11 or numeric")
    val unspecRow =
      if (nUnspec == 0)
        (table, "No rows with unspec_proc_flag AND non-zero MOUD supply",
          "PASS", "All rows of ndc formatted properly")
      else
        (table,
          s"$nUnspec row(s) with unspec_proc_flag AND non-zero MOUD supply",
          "FAIL", "rows where ndc field not formatted properly")
    val multiRow =
      if (nMulti == 0)
        (table, "No rows with more than one type of MOUD flag", "PASS",
          "All rows of ndc formatted properly")
      else
        (table, s"$nMulti rows with more than one type of MOUD flag",
          "FAIL",
          "ndc field had some rows with more than one type of MOUD flag")
    val missRow =
      if (nMissing == 0)
        (table,
          "No rows that have missing MOUD days if methadone/bupe/naltrexone",
          "PASS", "All rows have MOUD days")
      else
        (table, s"$nMissing rows that have missing MOUD days if " +
          "methadone/bupe/naltrexone", "FAIL",
          "rows have missing MOUD days if methadone/bupe/naltrexone")
    toDf(s, Seq(
      idsVsEligRow(stage, idCol, demoIds, demoIdCol, timevarIds,
        tvIdCol, table),
      ndcRow, unspecRow, multiRow, missRow))
  }

  /** qa_stage.mcaid_claim_preg_episode.R:40-240 — seven verdict rows;
    * the qa_item itself flips wording per branch (e.g. 'Minimum age >=
    * 12 as expected' vs 'Minimum age is under 12, lower than
    * expected'), and the PASS notes repeat the item. All six count
    * checks fuse into ONE conditional-aggregation scan. */
  def pregBattery(stage: DataFrame, idCol: String,
      demoIds: DataFrame, demoIdCol: String,
      timevarIds: DataFrame, tvIdCol: String, table: String): DataFrame = {
    val s = stage.sparkSession
    val a = stage.agg(
      coalesce(sum(when(col("age_at_outcome") < 12, 1L).otherwise(0L)),
        lit(0L)),
      coalesce(sum(when(col("age_at_outcome") > 55, 1L).otherwise(0L)),
        lit(0L)),
      coalesce(sum(when(col("preg_start_date").isNull ||
        col("preg_end_date").isNull, 1L).otherwise(0L)), lit(0L)),
      coalesce(sum(when(col("valid_ga") === 1 &&
        (col("ga_days").isNull || col("ga_weeks").isNull ||
          col("ga_estimation_step").isNull), 1L).otherwise(0L)), lit(0L)),
      count_distinct(col("preg_endpoint")),
      coalesce(sum(when(col("preg_endpoint") === "lb" &&
        col("valid_ga") === 1 && col("lb_type").isNull, 1L)
        .otherwise(0L)), lit(0L))).head()
    val (minAge, maxAge, nullDate) =
      (a.getLong(0), a.getLong(1), a.getLong(2))
    val (nullGa, endTypes, nullLb) =
      (a.getLong(3), a.getLong(4), a.getLong(5))
    val rows = Seq(
      idsVsEligRow(stage, idCol, demoIds, demoIdCol, timevarIds,
        tvIdCol, table),
      if (minAge == 0)
        (table, "Minimum age >= 12 as expected", "PASS",
          "Minimum age >= 12 as expected")
      else
        (table, "Minimum age is under 12, lower than expected", "FAIL",
          s"$minAge row(s) with age lower than expected minimum (12)"),
      if (maxAge == 0)
        (table, "Maximum age <= 55 as expected", "PASS",
          "Maximum age <= 55 as expected")
      else
        (table, "Maximum age is over 55, higher than expected", "FAIL",
          s"$maxAge row(s) with age higher than expected maximum (55)"),
      if (nullDate == 0)
        (table, "All rows with non-null start and end dates", "PASS",
          "All rows with non-null start and end dates")
      else
        (table, "Rows with null start or end dates", "FAIL",
          s"$nullDate row(s) with null start or end dates"),
      if (nullGa == 0)
        (table, "All valid GA rows with non-null GA columns", "PASS",
          "All valid GA rows with non-null GA columns")
      else
        (table, "Valid GA rows with null GA columns", "FAIL",
          s"$nullGa valid GA row(s) with null GA columns"),
      if (endTypes == 7)
        (table, "Expected # of distict preg endpoint types (7)", "PASS",
          "Expected # of distict preg endpoint types (7)")
      else
        (table, "Incorrect # of distict preg endpoint types (expecting 7)",
          "FAIL", s"$endTypes distinct preg endpoint types (expecting 7)"),
      if (nullLb == 0)
        (table, "All LB records with valid GA with non-null lb_type",
          "PASS", "All LB records with valid GA with non-null lb_type")
      else
        (table, "LB records with valid GA with null lb_type", "FAIL",
          s"$nullLb LB row(s) with valid GA with null lb_type"))
    toDf(s, rows)
  }

  /** qa_stage.mcaid_housing_status.R:28-137 — two verdict rows:
    * duplicate (id, from_date) pairs, and the month-to-month
    * distinct-member trend (consecutive PRESENT months via row_number,
    * |next-cur|/cur rounded to 4 dp, flagged at >= 5%). The reference's
    * FAIL note references an undefined `diff_check` variable — an R
    * error it could never render — so the FAIL note here renders the
    * intended values ('{n} months with up to {maxDiff}% difference')
    * with the 4-dp fixed-point pct. */
  def housingBattery(stage: DataFrame, idCol: String, fromCol: String,
      table: String): DataFrame = {
    val s = stage.sparkSession
    val dup = stage.groupBy(col(idCol), col(fromCol))
      .agg(count(lit(1)).as("qa_n"))
      .filter(col("qa_n") > 1).count()
    val dupRow =
      if (dup == 0)
        (table, "Confirmed there are zero duplicate IDs per [from_date]",
          "PASS", "There are no duplicate IDs per [from_date]")
      else
        (table, s"There are $dup duplicate IDs per [from_date]", "FAIL",
          "There are duplicate IDs per [from_date]")
    // one row per present month on the driver — bounded by the study's
    // month span, the same frame the reference pulls into R
    val months = stage
      .groupBy((year(col(fromCol)) * 100 + month(col(fromCol)))
        .as("qa_ym"))
      .agg(count_distinct(col(idCol)).as("qa_ids"))
      .orderBy(col("qa_ym"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val diffs = months.sliding(2).collect {
      case Array((_, cur), (_, nxt)) =>
        // pct in 1e-4 units, half-up on |diff| (matches pct4String)
        math.round(math.abs(nxt - cur) * 1000000.0 / cur)
    }.toSeq
    val over = diffs.count(_ >= 50000L) // >= 5.0000%
    val trendRow =
      if (over == 0)
        (table, "Confirmed there are zero months with >= 5% difference " +
          "compared to previous months", "PASS",
          "Checked for Month-to-Month trends of >= 5% difference")
      else {
        val maxD = diffs.max
        (table, s"$over months with up to ${render4(maxD)}% difference",
          "FAIL", "There are trends of >= 5% difference")
      }
    toDf(s, Seq(dupRow, trendRow))
  }
}
