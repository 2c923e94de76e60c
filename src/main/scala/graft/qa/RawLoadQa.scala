package graft.qa

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Raw partial-load QA batteries
  * (load_raw/tables/load_load_raw.mcaid_claim_partial.R:70-176,
  * load_load_raw.mcaid_elig_partial.R:113-270, over the
  * scripts_general/qa_load_file.R:325-478 row-count and :483-680
  * date-range helpers) — the checks every incremental raw delivery
  * passes before its etl_log row gets date_load_raw stamped:
  *
  *  - loaded row count vs the batch's etl_log expectation. The PASS
  *    note carries the reference's double-assignment QUIRK
  *    (qa_load_file.R:457-462: the PASS branch assigns a note, then
  *    immediately REASSIGNS it from the qa_result==F rows — an empty
  *    set — leaving "…match expected value(s): " with a dangling
  *    separator), kept verbatim.
  *  - distinct-key row count vs total. The claim battery dedups on
  *    ALL columns EXCEPT the four provider-address fields (addresses
  *    legitimately differ across otherwise-identical resubmitted
  *    lines) and compares against COUNT(DISTINCT CLM_LINE_TCN); the
  *    elig battery dedups on its 8-or-9-column key (SECONDARY_RAC_CODE
  *    joins the key only for legacy HOH_ID-era files,
  *    …elig_partial.R:95-111) and compares against the total. The
  *    elig check's qa_item LABEL DIFFERS between outcomes (the FAIL
  *    arm spells out the full column list, the PASS arm an
  *    abbreviated one — :127-146) — kept verbatim. The claim check
  *    hard-stops on failure; the elig one only warns (:135).
  *  - min/max of the delivery's date column vs the batch expectation
  *    (FROM_SRVC_DATE as dates; CLNDR_YEAR_MNTH as yyyymm ints).
  *  - fixed-width identifier checks (elig): LEN(MEDICAID_RECIPIENT_ID)
  *    min=max=11, LEN(RAC_CODE) min=max=4.
  *  - NULL RAC_FROM_DATE share ≤ 2% (elig). The reference computes
  *    the share via a ROW_NUMBER() OVER (ORDER BY NEWID()) self-join
  *    of two one-row aggregates (:233-245 — both seqnums are 1; it is
  *    a plain count pair) and rounds to 3 decimals; here the percent
  *    renders from an exact integer milli-percent (half-up — R's
  *    half-even differs only exactly ON a .0005 boundary, which real
  *    counts never land on) so Spark and DuckDB print identical
  *    strings.
  *
  * Output: (etl_batch_id, table_name, qa_item, qa_result, note) —
  * the metadata.qa_mcaid row shape, qa_date dropped (volatile audit
  * metadata, the q230 discipline).
  *
  * Scale: every check is one distributed aggregate over the delivery;
  * the battery FUSES them into a single pass per input frame (one
  * scan computes total, distinct keys, length bounds, and null
  * counts together — the Qa.fusedTableChecks rule), and only the
  * handful of verdict scalars reach the driver. */
object RawLoadQa {

  /** The batch's etl_log expectations (file row count and the
    * delivery's declared date range, etl_log.R's columns). */
  case class Batch(etlBatchId: Int, rowCount: Long,
      dateMin: String, dateMax: String)

  private def row(batchId: Int, table: String, item: String,
      pass: Boolean, note: String): (Int, String, String, String,
      String) =
    (batchId, table, item, if (pass) "PASS" else "FAIL", note)

  /** qa_load_file.R:456-475 note pair (overall=T → the one source is
    * labeled like the reference's single-table frame). */
  private def rowCountNotes(pass: Boolean, expected: Long,
      actual: Long): String =
    if (pass)
      // the double-assignment quirk: the second paste over zero FAIL
      // rows leaves the dangling "…: " (qa_load_file.R:457-458)
      "Number of rows loaded to SQL match expected value(s): "
    else
      s"The following table(s) had discrepancies in row counts: " +
        s"overall (Expected: $expected, actual: $actual)"

  /** qa_load_file.R:657-676 note pair. */
  private def dateRangeNotes(pass: Boolean, expMin: String,
      expMax: String, actMin: String, actMax: String): String =
    if (pass)
      "Date range of table(s) loaded to SQL match(es) expected value(s)"
    else
      "The following table(s) had discrepancies in date ranges: " +
        s"overall (Expected min: $expMin, actual min: $actMin /  " +
        s"Expected max: $expMax, actual max: $actMax)"

  /** Exact milli-percent (half-up) rendered the way R prints
    * round(x, 3) for non-boundary values: integer part, then up to 3
    * decimals with trailing zeros stripped. */
  private[qa] def pctString(numer: Long, denom: Long): String = {
    val milli =
      if (denom == 0L) 0L
      else (numer * 100000L * 2L + denom) / (2L * denom)
    val frac = milli % 1000L
    if (frac == 0L) (milli / 1000L).toString
    else s"${milli / 1000L}." + f"$frac%03d".reverse.dropWhile(_ == '0')
      .reverse
  }

  /** mcaid claim partial-load battery
    * (load_load_raw.mcaid_claim_partial.R:70-140). `raw` is the
    * loaded delivery; the four address columns are excluded from the
    * distinctness key when present (vars_distinct, :40-43). */
  def mcaidClaimPartial(s: SparkSession, raw: DataFrame,
      batch: Batch): DataFrame = {
    val addrCols = Seq("BILLING_PRVDR_ADDRESS", "SERVICING_PRVDR_ADDRESS",
      "MCO_PRVDR_ADDRESS", "MCO_PRVDR_COUNTY")
    val keyCols = raw.columns.filterNot(addrCols.contains)
    // ONE scan: total, addr-excluded distinct, distinct TCN, date range
    val m = raw.agg(
      count(lit(1)).as("n"),
      count_distinct(struct(keyCols.map(col).toIndexedSeq: _*)).as("d"),
      count_distinct(col("CLM_LINE_TCN")).as("tcn"),
      min(col("FROM_SRVC_DATE")).cast("string").as("dmin"),
      max(col("FROM_SRVC_DATE")).cast("string").as("dmax")).head()
    val (n, d, tcn) = (m.getLong(0), m.getLong(1), m.getLong(2))
    val (dmin, dmax) = (m.getString(3), m.getString(4))
    val t = "load_raw.mcaid_claim"
    val rowsPass = n == batch.rowCount
    val tcnPass = d == tcn
    val datePass = dmin == batch.dateMin && dmax == batch.dateMax
    val out = Seq(
      row(batch.etlBatchId, t,
        "Number rows loaded to SQL vs. expected value(s)", rowsPass,
        rowCountNotes(rowsPass, batch.rowCount, n)),
      row(batch.etlBatchId, t, "Distinct TCNs", tcnPass,
        if (tcnPass)
          s"Number of distinct TCNs equals total # rows (after " +
            "excluding address fields)"
        else "No. distinct TCNs did not match rows even after " +
          "excluding addresses"),
      row(batch.etlBatchId, t,
        "Actual vs. expected date range in data", datePass,
        dateRangeNotes(datePass, batch.dateMin, batch.dateMax,
          dmin, dmax)))
    import s.implicits._
    out.toDF("etl_batch_id", "table_name", "qa_item", "qa_result",
      "note")
  }

  /** mcaid elig partial-load battery
    * (load_load_raw.mcaid_elig_partial.R:113-270). `legacy` adds
    * SECONDARY_RAC_CODE to the distinct key (the HOH_ID-era branch). */
  def mcaidEligPartial(s: SparkSession, raw: DataFrame, batch: Batch,
      legacy: Boolean = false): DataFrame = {
    val rac2 = if (legacy) Seq("SECONDARY_RAC_CODE") else Nil
    val keyCols = Seq("MBR_H_SID", "CLNDR_YEAR_MNTH",
      "MEDICAID_RECIPIENT_ID", "RAC_FROM_DATE", "RAC_TO_DATE",
      "RAC_CODE") ++ rac2 ++ Seq("END_REASON_NAME",
      "DUALELIGIBLE_INDICATOR")
    val m = raw.agg(
      count(lit(1)).as("n"),
      count_distinct(struct(keyCols.map(col).toIndexedSeq: _*)).as("d"),
      min(col("CLNDR_YEAR_MNTH")).cast("string").as("dmin"),
      max(col("CLNDR_YEAR_MNTH")).cast("string").as("dmax"),
      min(length(col("MEDICAID_RECIPIENT_ID"))).as("id_min"),
      max(length(col("MEDICAID_RECIPIENT_ID"))).as("id_max"),
      min(length(col("RAC_CODE"))).as("rac_min"),
      max(length(col("RAC_CODE"))).as("rac_max"),
      count(when(col("RAC_FROM_DATE").isNull, 1)).as("nulls")).head()
    val (n, d) = (m.getLong(0), m.getLong(1))
    val (dmin, dmax) = (m.getString(2), m.getString(3))
    // empty delivery → NULL length bounds; read as 0 so the battery
    // reports (FAILing the fixed-width checks) instead of throwing —
    // the empty-input sweep's no-throw contract
    def i(ix: Int) = if (m.isNullAt(ix)) 0 else m.getInt(ix)
    val (idMin, idMax) = (i(4), i(5))
    val (racMin, racMax) = (i(6), i(7))
    val nulls = m.getLong(8)
    val t = "load_raw.mcaid_elig"
    val rowsPass = n == batch.rowCount
    val distinctPass = d == n
    val rac2Label = if (legacy) "SECONDARY_RAC_CODE, " else ""
    val datePass = dmin == batch.dateMin && dmax == batch.dateMax
    val idPass = idMin == 11 && idMax == 11
    val racPass = racMin == 4 && racMax == 4
    val pct = pctString(nulls, n)
    val nullsPass = {
      // the reference compares round(pct, 3) > 2.0 — with the exact
      // milli-percent that is 20000
      val milli = if (n == 0) 0L else (nulls * 100000L * 2L + n) / (2L * n)
      milli <= 20000L
    }
    val out = Seq(
      row(batch.etlBatchId, t,
        "Number rows loaded to SQL vs. expected value(s)", rowsPass,
        rowCountNotes(rowsPass, batch.rowCount, n)),
      // the outcome-dependent item label (:127-146)
      row(batch.etlBatchId, t,
        if (distinctPass)
          "Distinct rows (ID, CLNDR_YEAR_MNTH, FROM/TO DATE, " +
            "RAC_CODE, END_REASON_NAME, DUALELIGIBLE_INDICATOR)"
        else
          s"Distinct rows (MBR_H_SID, CLNDR_YEAR_MNTH, " +
            s"MEDICAID_RECIPIENT_ID, RAC_FROM_DATE, RAC_TO_DATE, " +
            s"RAC_CODE, ${rac2Label}END_REASON_NAME, " +
            "DUALELIGIBLE_INDICATOR)",
        distinctPass,
        if (distinctPass)
          s"Number of distinct rows equals total # rows ($n)"
        else s"Number distinct rows ($d) != total rows ($n)"),
      row(batch.etlBatchId, t,
        "Actual vs. expected date range in data", datePass,
        dateRangeNotes(datePass, batch.dateMin, batch.dateMax,
          dmin, dmax)),
      row(batch.etlBatchId, t, "Length of Medicaid ID", idPass,
        if (idPass) "All Medicaid IDs were 11 characters"
        else s"Minimum ID length was $idMin, maximum was $idMax"),
      row(batch.etlBatchId, t, "Length of RAC codes", racPass,
        if (racPass) "All RAC codes were 4 characters"
        else s"Min RAC_CODE length was $racMin, max was $racMax"),
      row(batch.etlBatchId, t, "NULL from dates", nullsPass,
        if (nullsPass)
          s"<2% of from date rows were null ($pct% of total rows)"
        else s"There were $nulls NULL from dates ($pct% of total rows)"))
    import s.implicits._
    out.toDF("etl_batch_id", "table_name", "qa_item", "qa_result",
      "note")
  }
}
