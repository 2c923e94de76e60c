package graft.qa

import java.sql.Date

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Planted-fixture contracts for the per-claim-table QA batteries
  * (qa_stage.mcaid_claim_icdcm_header/line/procedure/pharm.R) — the
  * catalog rows (q292-q295) exercise the PASS arms on real data; these
  * fixtures drive every FAIL arm and the reference quirks the
  * batteries replicate verbatim. */
class ClaimTableQaSpec extends SparkSpec {

  import spark.implicits._

  private def row(df: DataFrame, item: String): (String, String) = {
    val r = df.filter(df("qa_item") === item).collect()
    assert(r.length == 1, s"expected one '$item' row, got ${r.length}")
    (r(0).getString(2), r(0).getString(3))
  }

  private val demo = Seq(1L, 2L, 3L).toDF("pid")
  private val tv = Seq(1L, 2L, 3L).toDF("pid")

  // --- elig containment -------------------------------------------------

  test("idsVsElig passes with the reference PASS note when covered") {
    val stage = Seq((1L, "x"), (2L, "x"), (2L, "y")).toDF("id", "c")
    val r = ClaimTableQa.idsVsEligRow(stage, "id", demo, "pid", tv, "pid",
      "stage.t")
    assert(r._3 == "PASS")
    assert(r._4 == "There were the same number of IDs as in the final " +
      "mcaid_elig_demo and mcaid_elig_timevar tables")
  }

  test("idsVsElig FAIL note keeps the reference's 'more' wording for " +
      "MISSING claimants (the ifelse(chk >= 0) quirk)") {
    val stage = Seq((1L, "x"), (9L, "x"), (8L, "y")).toDF("id", "c")
    val r = ClaimTableQa.idsVsEligRow(stage, "id", demo, "pid",
      Seq(1L, 8L).toDF("pid"), "pid", "stage.t")
    assert(r._3 == "FAIL")
    assert(r._4 == "There were 2 more IDs than in the final " +
      "mcaid_elig_demo table and 1 more IDs than in the final " +
      "mcaid_elig_timevar table")
  }

  // --- pct rendering -----------------------------------------------------

  test("pctString renders R-style trimmed 2-dp fixed point") {
    assert(ClaimTableQa.pctString(5, 100) == "5")       // 5.00 -> "5"
    assert(ClaimTableQa.pctString(51, 1000) == "5.1")   // 5.10 -> "5.1"
    assert(ClaimTableQa.pctString(513, 10000) == "5.13")
    assert(ClaimTableQa.pctString(1, 3) == "33.33")
    assert(ClaimTableQa.pctString(2, 3) == "66.67")     // half-up at 2dp
    assert(ClaimTableQa.pctString(7, 1) == "700")
    assert(ClaimTableQa.pctString(1, 0) == "Inf")       // R's x/0
    assert(ClaimTableQa.pctString(1, 10000) == "0.01")
    assert(ClaimTableQa.pctString(1, 100000) == "0")    // rounds to zero
  }

  // --- year-change branches ----------------------------------------------

  private def dated(rows: Seq[(Int, Int)]): DataFrame =
    rows.flatMap { case (y, n) =>
      Seq.fill(n)(Date.valueOf(s"$y-06-15"))
    }.toDF("d")

  test("yearChange PASS lists only grown years, glued with ' and '") {
    val cur = dated(Seq(2000 -> 21, 2001 -> 10, 2002 -> 12, 2003 -> 5))
    val pri = dated(Seq(2000 -> 20, 2001 -> 10, 2002 -> 8, 2003 -> 4))
    val r = ClaimTableQa.yearChangeRow(cur, pri, "d", "t", "Chg", "Chg",
      "diagnoses", "diagnoses")
    assert(r._3 == "PASS")
    assert(r._4 == "The following years had more diagnoses than in the " +
      "final schema table: 2000 (5% more), 2002 (50% more) and " +
      "2003 (25% more)")
  }

  test("yearChange FAIL 'fewer' branch renders the shrunk years") {
    val cur = dated(Seq(2000 -> 10, 2001 -> 3))
    val pri = dated(Seq(2000 -> 10, 2001 -> 4))
    val r = ClaimTableQa.yearChangeRow(cur, pri, "d", "t", "P", "F",
      "claim lines", "claim lines")
    assert(r._2 == "F")
    assert(r._3 == "FAIL")
    assert(r._4 == "The following years had fewer claim lines than in " +
      "the final schema table: 2001 (25% fewer)")
  }

  test("yearChange all-equal fires the no-change FAIL branch") {
    val cur = dated(Seq(2000 -> 10, 2001 -> 4))
    val r = ClaimTableQa.yearChangeRow(cur, cur, "d", "t", "P", "F",
      "procedures", "procedures")
    assert((r._2, r._3) == ("F", "FAIL"))
    assert(r._4 == "No change in the number of procedures compared to " +
      "final schema table")
  }

  test("yearChange replicates the min+max==0 cancellation quirk: +25% " +
      "and -25% report 'No change'") {
    val cur = dated(Seq(2000 -> 5, 2001 -> 3))
    val pri = dated(Seq(2000 -> 4, 2001 -> 4))
    // 2000: +25.0000%, 2001: -25.0000% -> min+max == 0 in the
    // reference's R (and in micro-percent integers here)
    val r = ClaimTableQa.yearChangeRow(cur, pri, "d", "t", "P", "F",
      "diagnoses", "diagnoses")
    assert(r._3 == "FAIL")
    assert(r._4.startsWith("No change"))
  }

  test("yearChange renders Inf for a year absent from the prior table") {
    val cur = dated(Seq(2000 -> 10, 2001 -> 4))
    val pri = dated(Seq(2000 -> 8))
    val r = ClaimTableQa.yearChangeRow(cur, pri, "d", "t", "P", "F",
      "diagnoses", "diagnoses")
    assert(r._3 == "PASS")
    assert(r._4 == "The following years had more diagnoses than in the " +
      "final schema table: 2000 (25% more) and 2001 (Inf% more)")
  }

  test("yearChange quirk: a year present ONLY in the prior table " +
      "escapes the check (left join from the new side)") {
    val cur = dated(Seq(2000 -> 10))
    val pri = dated(Seq(2000 -> 8, 1999 -> 50)) // 1999 vanished entirely
    val r = ClaimTableQa.yearChangeRow(cur, pri, "d", "t", "P", "F",
      "diagnoses", "diagnoses")
    assert(r._3 == "PASS") // the vanished year never enters the verdict
  }

  // --- icdcm battery FAIL arms -------------------------------------------

  private def icdcmFrame(rows: Seq[(Long, Long, String, Int, String, String)])
      : DataFrame =
    rows.map { case (ch, id, d, v, num, code) =>
      (ch, id, Date.valueOf(d), v, num, code)
    }.toDF("claim_header_id", "id_person", "last_service_date",
      "icdcm_version", "icdcm_number", "icdcm_norm")

  test("icdcm battery: length envelopes, number domain, and ref " +
      "coverage fail with the reference notes") {
    val stage = icdcmFrame(Seq(
      (1L, 1L, "2014-01-01", 9, "01", "2500"),    // ICD-9 len 4 (bad)
      (2L, 2L, "2014-01-01", 9, "13", "25000"),   // number out of domain
      (3L, 3L, "2016-01-01", 10, "02", "A1"),     // ICD-10 len 2 (bad)
      (4L, 1L, "2016-01-01", 10, "admit", "B12345")))
    val ref = Seq((9, "25000")).toDF("v", "c")
    val out = ClaimTableQa.icdcmBattery(stage, "id_person", demo, "pid",
      tv, "pid", ref, "v", "c", stage.limit(0), "stage.t", "ref.icd",
      dxThreshold = 2L)
    val (r9, n9) = row(out, "Length of ICD-9-CM codes")
    assert(r9 == "FAIL" && n9 == "The ICD-9-CM codes ranged from 4 to 5 " +
      "characters in length (should be all 5)")
    val (r10, n10) = row(out, "Length of ICD-10-CM codes")
    assert(r10 == "FAIL" && n10 == "The ICD-10-CM codes ranged from 2 " +
      "to 6 characters in length (should be 3-7)")
    val (rn, nn) = row(out, "icdcm_number = 01-12 or admit")
    assert(rn == "FAIL" &&
      nn == "There were 1 icdcm_number values not 01 through 12 or admit")
    // 3 distinct (version, code) pairs miss a 1-row ref -> >= threshold 2
    val (rd, nd) =
      row(out, "Almost all dx codes join to ICD-CM reference table")
    assert(rd == "FAIL" && nd == "There were 3 dx values not in ref.icd " +
      "table (acceptable is < 2)")
  }

  test("icdcm battery: clean frame passes all envelope rows") {
    val stage = icdcmFrame(Seq(
      (1L, 1L, "2014-01-01", 9, "01", "25000"),
      (2L, 2L, "2016-01-01", 10, "02", "A12"),     // len 3
      (3L, 3L, "2016-01-01", 10, "admit", "B123456"))) // len 7
    val ref = Seq((9, "25000"), (10, "A12"), (10, "B123456"))
      .toDF("v", "c")
    val out = ClaimTableQa.icdcmBattery(stage, "id_person", demo, "pid",
      tv, "pid", ref, "v", "c", stage, "stage.t", "ref.icd")
    assert(row(out, "Length of ICD-9-CM codes")._1 == "PASS")
    assert(row(out, "Length of ICD-10-CM codes")._1 == "PASS")
    assert(row(out, "icdcm_number = 01-12 or admit")._2 ==
      "All icdcm_number values were 01:12 or admit")
    assert(row(out, "Almost all dx codes join to ICD-CM reference table")
      ._2 == "There were 0 dx values not in ref.icd (acceptable is < 350)")
  }

  // --- line battery FAIL arms ---------------------------------------------

  test("line battery: count mismatch and rev_code violations fail with " +
      "the reference notes") {
    val stage = Seq(
      (1L, "T1001", "2000-01-01", "0450"),
      (2L, "T1002", "2000-01-01", "45A0"),   // non-numeric
      (3L, "T1003", "2001-01-01", "450"))    // len 3
      .map { case (id, tcn, d, rc) => (id, tcn, Date.valueOf(d), rc) }
      .toDF("mbr_h_sid", "clm_line_tcn", "from_srvc_date", "rev_code")
    val raw = Seq("T1001", "T1002", "T1003", "T1004").toDF("clm_line_tcn")
    val out = ClaimTableQa.lineBattery(stage, "mbr_h_sid", "clm_line_tcn",
      demo, "pid", tv, "pid", raw, "clm_line_tcn", stage.limit(0),
      "stage.mcaid_claim_line", "load_raw.mcaid_claim")
    val (rc, nc) =
      row(out, "Number of distinct claim lines compared to raw data")
    assert(rc == "FAIL" && nc == "stage.mcaid_claim_line had 3 distinct " +
      "claim lines compared to 4 in load_raw.mcaid_claim")
    val (rr, nr) = row(out, "Format of rev_code field")
    assert(rr == "FAIL" && nr ==
      "rev_code field had some rows with length != 4 or characters")
  }

  // --- procedure battery --------------------------------------------------

  test("procedure code-system classifier matches the reference taxonomy") {
    import graft.functions.ProcedureCodes.codeSystem
    val out = Seq("99213", "1234F", "0042T", "0001M", "0001U", "J1885",
        "123", "1234", "0DTJ4ZZ", "AB123", "12")
      .toDF("c").select(codeSystem($"c")).as[String].collect()
    assert(out.toSeq == Seq("CPT Category I", "CPT Category II",
      "CPT Category III", "CPT Other", "CPT Other", "HCPCS",
      "ICD-9-PCS", "ICD-9-PCS", "ICD-10-PCS", "UNKNOWN", "UNKNOWN"))
  }

  test("procedure battery: unknown-format count excludes modifier rows " +
      "and fails at the threshold") {
    val stage = Seq(
      (1L, 1L, "2014-01-01", "01", "ZZ"),   // unknown
      (2L, 2L, "2014-01-01", "02", "YY"),   // unknown
      (3L, 3L, "2014-01-01", "M1", "UR"))   // modifier: excluded
      .map { case (ch, id, d, num, pc) =>
        (ch, id, Date.valueOf(d), num, pc)
      }.toDF("claim_header_id", "id_person", "first_service_date",
        "pcode_number", "pcode")
    val out = ClaimTableQa.procedureBattery(stage, "id_person", demo,
      "pid", tv, "pid", stage.limit(0), "stage.t", unknownThreshold = 2L)
    val (rf, nf) = row(out, "Format of procedure codes")
    assert(rf == "FAIL" &&
      nf == "There were 2 distinct procedure codes with an unknown format")
  }

  // --- pharm battery -------------------------------------------------------

  test("pharm battery: NDC violations fail; qa_item carries the " +
      "reference's rows/row split") {
    val stage = Seq(
      (1L, "12345678901", "2000-06-01"),
      (2L, "1234567890", "2000-06-01"),   // len 10
      (3L, "1234567890A", "2001-06-01")) // non-numeric
      .map { case (id, ndc, d) => (id, ndc, Date.valueOf(d)) }
      .toDF("id_mcaid", "ndc", "rx_fill_date")
    val out = ClaimTableQa.pharmBattery(stage, "id_mcaid", demo, "pid",
      tv, "pid", stage, "stage.mcaid_claim_pharm")
    val (rn, nn) = row(out, "Format of ndc field")
    assert(rn == "FAIL" &&
      nn == "ndc field had some rows with length != 11 or numeric")
    // prior == current -> the no-change FAIL branch, whose qa_item drops
    // the trailing 's' and whose note says "claim lines" (both verbatim
    // from qa_stage.mcaid_claim_pharm.R:195-198)
    val (rc, ncn) = row(out, "Change in number of pharmacy claim row")
    assert(rc == "FAIL" && ncn == "No change in the number of pharmacy " +
      "claim lines compared to final schema table")
  }

  // --- bh battery -----------------------------------------------------------

  test("bh battery: condition-count FAIL, literally-quoted ids notes, " +
      "and prevalence INFO rows") {
    val stage = Seq(
      (1L, "mh", "1996-03-01", "1996-08-31"),
      (2L, "mh", "1995-01-01", "1995-06-30"), // outside the 1996 window
      (2L, "sud", "1996-02-01", "1997-01-31"))
      .map { case (id, c, f, t) =>
        (id, c, Date.valueOf(f), Date.valueOf(t))
      }.toDF("id_apde", "bh_cond", "first_encounter_date",
        "last_encounter_date")
    val fin = Seq(("mh", 1), ("sud", 1), ("adhd", 1)).toDF("bh_cond", "x")
    val pop = Seq(
      (1L, "1996-01-01", "1996-12-31"),
      (2L, "1996-01-01", "1996-12-31"),
      (3L, "1995-01-01", "1995-12-31")) // not enrolled across 1996
      .map { case (id, f, t) =>
        (id, Date.valueOf(f), Date.valueOf(t))
      }.toDF("pid", "f", "t")
    val out = ClaimTableQa.bhBattery(stage, "id_apde", demo, "pid", tv,
      "pid", fin, pop, "pid", "f", "t", 1996, "stage.mcaid_claim_bh")
    val (rc, nc) = row(out, "# distinct conditions")
    assert(rc == "FAIL" && nc == "There were 2 conditions analyzed, " +
      "but there are 3 conditions in the final table")
    val (ri, ni) = row(out, "Distinct IDs compared to elig tables")
    assert(ri == "PASS")
    assert(ni.startsWith("'") && ni.endsWith("'")) // the bh glue quirk
    val (rm, nm) = row(out, "1996 prevalence: mh")
    assert(rm == "INFO" && nm == "1 of 2 members (50%)")
    val (rs, ns) = row(out, "1996 prevalence: sud")
    assert(rs == "INFO" && ns == "1 of 2 members (50%)")
  }

  // --- moud battery ---------------------------------------------------------

  test("moud battery: FAIL branches put the count in the qa_item and " +
      "keep the copy-paste notes") {
    import org.apache.spark.sql.functions.col
    val stage = Seq(
      // (id, meth, bup, nal, unspec, supply, supply_new)
      (1L, 1, 0, 0, 0, 1.0, Option(1.0)),
      (2L, 0, 0, 0, 1, 5.0, Option(5.0)),   // unspec with supply > 0
      (3L, 1, 1, 0, 0, 1.0, Option(1.0)),   // two flags
      (4L, 0, 1, 0, 0, 1.0, None))          // bup with missing new days
      .toDF("id_person", "meth_proc_flag", "bup_proc_flag",
        "nal_proc_flag", "unspec_proc_flag", "moud_days_supply",
        "moud_days_supply_new")
    val pharmTmp = Seq(("a", Option("oral")), ("b", None), ("c", None))
      .toDF("ndc", "admin_method")
    val flags = col("meth_proc_flag") + col("bup_proc_flag") +
      col("nal_proc_flag") + col("unspec_proc_flag")
    val out = ClaimTableQa.moudBattery(stage, "id_person",
      Seq(1L, 2L, 3L, 4L).toDF("pid"), "pid",
      Seq(1L, 2L, 3L, 4L).toDF("pid"), "pid",
      pharmTmp, "admin_method",
      col("unspec_proc_flag") === 1 && col("moud_days_supply") > 0,
      flags > 1,
      (col("meth_proc_flag") === 1 || col("bup_proc_flag") === 1 ||
        col("nal_proc_flag") === 1) &&
        col("moud_days_supply_new").isNull,
      "stage.mcaid_claim_moud")
    val (r1, n1) = row(out, "2 new NDC(s) missing from ref.ndc_codes")
    assert(r1 == "FAIL" &&
      n1 == "ndc field had some rows with length != 11 or numeric")
    val (r2, n2) =
      row(out, "1 row(s) with unspec_proc_flag AND non-zero MOUD supply")
    assert(r2 == "FAIL" &&
      n2 == "rows where ndc field not formatted properly")
    val (r3, _) = row(out, "1 rows with more than one type of MOUD flag")
    assert(r3 == "FAIL")
    val (r4, n4) = row(out, "1 rows that have missing MOUD days if " +
      "methadone/bupe/naltrexone")
    assert(r4 == "FAIL" &&
      n4 == "rows have missing MOUD days if methadone/bupe/naltrexone")
  }

  // --- preg battery ---------------------------------------------------------

  test("preg battery: every FAIL arm flips the qa_item wording") {
    val stage = Seq(
      // (id, age, start, end, valid_ga, ga_days, ga_weeks, step, ep, lb)
      (1L, 11L, Option("2000-01-01"), "2000-09-01", Option(1),
        Option(245), Option(35.0), Option("anchor_procedure"), "lb",
        Option("ptb")),
      (2L, 60L, None, "2000-09-01", Option(1), None, Option(35.0),
        Option("anchor_procedure"), "lb", None),
      (3L, 30L, Option("2000-01-01"), "2000-09-01", None, None, None,
        None, "sa", None))
      .map { case (id, a, st, en, vg, gd, gw, step, ep, lb) =>
        (id, a, st.map(Date.valueOf), Date.valueOf(en), vg, gd, gw,
          step, ep, lb)
      }
      .toDF("id_person", "age_at_outcome", "preg_start_date",
        "preg_end_date", "valid_ga", "ga_days", "ga_weeks",
        "ga_estimation_step", "preg_endpoint", "lb_type")
    val out = ClaimTableQa.pregBattery(stage, "id_person",
      Seq(1L, 2L, 3L).toDF("pid"), "pid", Seq(1L, 2L, 3L).toDF("pid"),
      "pid", "stage.t")
    assert(row(out, "Minimum age is under 12, lower than expected")._2 ==
      "1 row(s) with age lower than expected minimum (12)")
    assert(row(out, "Maximum age is over 55, higher than expected")._2 ==
      "1 row(s) with age higher than expected maximum (55)")
    assert(row(out, "Rows with null start or end dates")._2 ==
      "1 row(s) with null start or end dates")
    assert(row(out, "Valid GA rows with null GA columns")._2 ==
      "1 valid GA row(s) with null GA columns")
    assert(row(out,
      "Incorrect # of distict preg endpoint types (expecting 7)")._2 ==
      "2 distinct preg endpoint types (expecting 7)")
    assert(row(out, "LB records with valid GA with null lb_type")._2 ==
      "1 LB row(s) with valid GA with null lb_type")
  }

  // --- housing battery ------------------------------------------------------

  test("housing battery: duplicate pairs and the >= 5% month trend " +
      "with 4-dp trimmed pct in the qa_item") {
    val rows = Seq.tabulate(40)(i => (i.toLong, "2000-01-01")) ++
      Seq.tabulate(37)(i => (i.toLong, "2000-02-01")) ++ // -7.5%
      Seq((1L, "2000-02-01")) // duplicate (1, Feb)
    val stage = rows.map { case (id, d) => (id, Date.valueOf(d)) }
      .toDF("id_mcaid", "from_date")
    val out = ClaimTableQa.housingBattery(stage, "id_mcaid", "from_date",
      "stage.mcaid_housing_status")
    assert(row(out, "There are 1 duplicate IDs per [from_date]")._1 ==
      "FAIL")
    // Feb has 37 distinct ids vs 40 in Jan: |37-40|/40 = 7.5%
    val (rt, nt) = row(out, "1 months with up to 7.5% difference")
    assert(rt == "FAIL" && nt == "There are trends of >= 5% difference")
  }

  test("render4 trims trailing zeros at 4 dp") {
    assert(ClaimTableQa.render4(75000L) == "7.5")
    assert(ClaimTableQa.render4(50000L) == "5")
    assert(ClaimTableQa.render4(51234L) == "5.1234")
    assert(ClaimTableQa.render4(50100L) == "5.01")
    assert(ClaimTableQa.render4(123L) == "0.0123")
  }
}
