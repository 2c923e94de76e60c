package graft.qa

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** QA batteries for the combined mcaid+mcare (APDE) tables — the
  * metadata.qa_xwalk / qa_mcare families the combined master script
  * runs (qa_stage.mcaid_mcare_elig_demo.R, qa_stage.mcaid_mcare_elig_
  * timevar.R, qa_stage.mcare_elig_timevar.R,
  * qa_stage.xwalk_apde_mcaid_mcare_pha.R) and the two analyst probe
  * scripts (qa_stage.mcaid_mcare_claim_header.sql,
  * qa_stage.mcaid_mcare_claim_ccw.sql). Same conventions as
  * [[ClaimTableQa]]: verdict rows named and worded verbatim from the
  * reference (multi-line glue notes collapse to one line — the q288
  * precedent), counts distributed, one row per check on the driver.
  *
  * Quirks kept: the xwalk battery's FAIL notes misspell "shoudl", its
  * PHOUSING_ID FAIL note repeats the prior count twice while the PASS
  * note omits it, its pairing checks emit WARNING (not FAIL), and the
  * mcare timevar battery renders its hard-coded date window inside
  * DOUBLE quotes (R's dbQuoteIdentifier on a date string).
  */
object CombinedQa {

  import ClaimTableQa.QaRow

  private def diffRow(table: String, item: String, unitFewer: String,
      unitMore: String, n: Long, p: Long): QaRow = {
    val diff = n - p
    if (diff < 0)
      (table, item, "FAIL",
        s"There were $diff $unitFewer in the most recent table ($n vs. $p)")
    else
      (table, item, "PASS",
        s"There were $diff $unitMore in the most recent table ($n vs. $p)")
  }

  /** qa_stage.mcaid_mcare_elig_demo.R:15-120 — two rows: rows vs the
    * stored prior run, and distinct id_apde == rows (note wording
    * differs from the mcaid battery's — kept verbatim). */
  def mmEligDemoQa(stage: DataFrame, idCol: String, priorRows: Long,
      table: String): DataFrame = {
    val st = stage.agg(count(lit(1)), count_distinct(col(idCol))).head()
    val (n, ids) = (st.getLong(0), st.getLong(1))
    val idRow =
      if (ids != n)
        (table, "Number distinct IDs", "FAIL",
          s"There were $ids distinct IDs but $n rows overall " +
            "(should be the same)")
      else
        (table, "Number distinct IDs", "PASS",
          "The number of distinct IDs matched number of overall " +
            s"rows ($ids)")
    ClaimTableQa.toDf(stage.sparkSession, Seq(
      diffRow(table, "Number new rows compared to most recent run",
        "fewer rows", "more rows", n, priorRows),
      idRow))
  }

  /** qa_stage.mcaid_mcare_elig_timevar.R:15-150 — two rows: row count
    * and distinct-id count, each against the prior run's stored
    * qa_xwalk_values. */
  def mmEligTimevarQa(stage: DataFrame, idCol: String, priorRows: Long,
      priorIds: Long, table: String): DataFrame = {
    val st = stage.agg(count(lit(1)), count_distinct(col(idCol))).head()
    val (n, ids) = (st.getLong(0), st.getLong(1))
    ClaimTableQa.toDf(stage.sparkSession, Seq(
      diffRow(table, "Number new rows compared to most recent run",
        "fewer rows", "more rows", n, priorRows),
      diffRow(table, "Number distinct IDs", "fewer IDs", "more IDs",
        ids, priorIds)))
  }

  /** qa_stage.mcare_elig_timevar.R:30-220 — four rows: rows vs prior,
    * distinct ids vs the WA MBSF bene universe, duplicate rows (note
    * asymmetry: only the PASS note says "(excl. ref_geo vars)"), and
    * the from/to envelope against the HARD-CODED study window, dates
    * rendered in double quotes (dbQuoteIdentifier). */
  def mcareEligTimevarQa(stage: DataFrame, idCol: String,
      mbsf: DataFrame, mbsfIdCol: String, priorRows: Long,
      windowFrom: String, windowTo: String, table: String): DataFrame = {
    val st = stage.agg(count(lit(1)), count_distinct(col(idCol)),
      count_distinct(struct(stage.columns.map(col).toIndexedSeq: _*)),
      min(col("from_date")), max(col("to_date"))).head()
    val (n, ids, dup) = (st.getLong(0), st.getLong(1), st.getLong(2))
    val (minF, maxT) = (Option(st.getDate(3)), Option(st.getDate(4)))
    val mbsfIds = mbsf.filter(col(mbsfIdCol).isNotNull)
      .agg(count_distinct(col(mbsfIdCol))).head().getLong(0)
    val idRow =
      if (ids != mbsfIds)
        (table, "Number distinct IDs", "FAIL",
          s"There were $ids distinct IDs but $mbsfIds in the WA MBSF " +
            "data (should be the same)")
      else
        (table, "Number distinct IDs", "PASS",
          "The number of distinct IDs matched number in the WA MBSF " +
            s"data ($ids)")
    val dupRow =
      if (dup != n)
        (table, "Duplicate rows", "FAIL",
          s"There were $dup distinct rows but $n rows overall " +
            "(should be the same)")
      else
        (table, "Duplicate rows", "PASS",
          "The number of distinct rows (excl. ref_geo vars) matched " +
            s"number total rows ($n)")
    val inWindow = (for (f <- minF; t <- maxT) yield
      !(f.toLocalDate.isBefore(java.time.LocalDate.parse(windowFrom)) ||
        t.toLocalDate.isAfter(java.time.LocalDate.parse(windowTo))))
      .getOrElse(false)
    def q(d: Option[java.sql.Date]) =
      "\"" + d.map(_.toString).getOrElse("NA") + "\""
    val dateRow =
      if (!inWindow)
        (table, "Date range", "FAIL",
          "Some from/to dates fell outside the CLNDR_YEAR_MNTH range " +
            s"(min: ${q(minF)}, max: ${q(maxT)})")
      else
        (table, "Date range", "PASS",
          "All from/to dates fell within the CLNDR_YEAR_MNTH range " +
            s"""(min: "$windowFrom", max: "$windowTo")""")
    ClaimTableQa.toDf(stage.sparkSession, Seq(
      diffRow(table, "Number new rows compared to most recent run",
        "fewer rows", "more rows", n, priorRows),
      idRow, dupRow, dateRow))
  }

  /** qa_stage.xwalk_apde_mcaid_mcare_pha.R:40-410 — the identity
    * crosswalk battery: rows and distinct KCMASTER_ID / ID_APDE vs the
    * prior run's stored values, distinct mcaid/phousing ids vs the IDH
    * history universe, and the unique-pairing sweep (each id value maps
    * to exactly one id_apde; violations WARN). The reference's Medicare
    * arm sits behind skip_mcare and the current xwalk carries no mcare
    * links — skipped here the same way. */
  def xwalkQa(stage: DataFrame, prior: DataFrame,
      idhMcaidCount: Long, idhPhaCount: Long, table: String): DataFrame = {
    val st = stage.agg(count(lit(1)),
      count_distinct(col("KCMASTER_ID")),
      count_distinct(col("id_apde")),
      count_distinct(col("id_mcaid")),
      count_distinct(col("phousing_id"))).head()
    val (n, kcm, apde) = (st.getLong(0), st.getLong(1), st.getLong(2))
    val (mcaid, pha) = (st.getLong(3), st.getLong(4))
    val pr = prior.agg(count(lit(1)),
      count_distinct(col("KCMASTER_ID")),
      count_distinct(col("id_apde"))).head()
    val (pn, pKcm, pApde) = (pr.getLong(0), pr.getLong(1), pr.getLong(2))
    def storedRow(item: String, plural: String, c: Long, p: Long): QaRow =
      if (c < p)
        (table, s"Number distinct IDs - $item", "FAIL",
          s"There were $c distinct $plural but $p in the most recent " +
            "[claims].[metadata_qa_xwalk_values] (shoudl be >=)")
      else
        (table, s"Number distinct IDs - $item", "PASS",
          s"The number of distinct $plural ($c) is >= the most recent " +
            s"number in [claims].[metadata_qa_xwalk_values] ($p)")
    val mcaidRow =
      if (mcaid != idhMcaidCount)
        (table, "Number distinct IDs - Medicaid", "FAIL",
          s"There were $mcaid distinct MCAID IDs but $idhMcaidCount " +
            "in the most recent IDH table ([IDMatch].[IM_HISTORY_TABLE]) " +
            "(they should be equal)")
      else
        (table, "Number distinct IDs - Medicaid", "PASS",
          s"The number of distinct MCAID IDs ($mcaid) is equal to the " +
            s"number in the IDH ([IDMatch].[IM_HISTORY_TABLE]) " +
            s"($idhMcaidCount)")
    val phaRow =
      if (pha != idhPhaCount)
        (table, "Number distinct IDs - phousing_id", "FAIL",
          s"There were $pha distinct PHOUSING_IDs but $idhPhaCount in " +
            "the most recent [IDMatch].[IM_HISTORY_TABLE] in the IDH " +
            s"($idhPhaCount)")
      else
        (table, "Number distinct IDs - phousing_id", "PASS",
          s"The number of distinct PHOUSING_IDs ($pha) is equal to the " +
            "number in [IDMatch].[IM_HISTORY_TABLE] in the IDH")
    // unique-pairing sweep: one fused scan computing, per id column,
    // the distinct non-null values and the distinct (value, id_apde)
    // pairs (the reference loops four data.table passes)
    val pairCols = Seq("id_mcaid", "id_mcare", "phousing_id",
      "KCMASTER_ID")
    val pairAggs = pairCols.flatMap { c =>
      Seq(count_distinct(col(c)).as(s"v_$c"),
        count_distinct(when(col(c).isNotNull,
          struct(col(c), col("id_apde")))).as(s"p_$c"))
    }
    val pa = stage.agg(pairAggs.head, pairAggs.tail: _*).head()
    val pairRows = pairCols.zipWithIndex.map { case (c, i) =>
      val v = pa.getLong(2 * i)
      val p = pa.getLong(2 * i + 1)
      if (v == p)
        (table, s"Unique pairing with id_apde - $c", "PASS",
          s"There were $v $c values and $p $c--id_apde pairs")
      else
        (table, s"Unique pairing with id_apde - $c", "WARNING",
          s"There were $v $c values but $p $c--id_apde pairs")
    }
    ClaimTableQa.toDf(stage.sparkSession, Seq(
      diffRow(table, "Number new rows compared to most recent run",
        "fewer rows", "more rows", n, pn),
      storedRow("KCMASTER_ID", "KCMASTER_IDs", kcm, pKcm),
      storedRow("ID_APDE", "ID_APDEs", apde, pApde),
      mcaidRow, phaRow) ++ pairRows)
  }

  /** qa_stage.mcaid_mcare_claim_header.sql:1-20 — the pc-visit
    * duplicate probe: mcaid and mcare pc-visit headers unioned through
    * the crosswalk, grouped to (id_apde, first_service_date), rows with
    * more than one visit emitted (the reference's TOP 100 made
    * deterministic: ordered by the group key, first 100). */
  def headerDupProbe(mcaidPc: DataFrame, xwalkMcaid: DataFrame,
      mcarePc: DataFrame, xwalkMcare: DataFrame): DataFrame = {
    val a = mcaidPc.join(xwalkMcaid.select(col("id_mcaid"),
        col("id_apde").as("x_apde")), Seq("id_mcaid"), "left")
      .select(col("x_apde").as("id_apde"), col("first_service_date"),
        lit("mcaid").as("source_desc"))
    val b = mcarePc.join(xwalkMcare.select(col("id_mcare"),
        col("id_apde").as("x_apde")), Seq("id_mcare"), "left")
      .select(col("x_apde").as("id_apde"), col("first_service_date"),
        lit("mcare").as("source_desc"))
    a.union(b).distinct()
      .groupBy(col("id_apde"), col("first_service_date"))
      .agg(count(lit(1)).as("row_count"))
      .filter(col("row_count") > 1)
      .orderBy(col("id_apde"), col("first_service_date"))
      .limit(100)
  }
}
