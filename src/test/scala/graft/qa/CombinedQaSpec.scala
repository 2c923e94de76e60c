package graft.qa

import java.sql.Date

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Planted-fixture contracts for the combined mcaid+mcare QA batteries
  * (CombinedQa) — FAIL/WARNING arms and the reference quirks. */
class CombinedQaSpec extends SparkSpec {

  import spark.implicits._

  private def row(df: DataFrame, item: String): (String, String) = {
    val r = df.filter(df("qa_item") === item).collect()
    assert(r.length == 1, s"expected one '$item' row, got ${r.length}")
    (r(0).getString(2), r(0).getString(3))
  }

  test("mmEligDemoQa: fewer rows FAIL and id-mismatch FAIL with the " +
      "combined battery's wording") {
    val stage = Seq((1L, "x"), (1L, "y"), (2L, "x")).toDF("id_apde", "c")
    val out = CombinedQa.mmEligDemoQa(stage, "id_apde", 5L, "t")
    val (rr, nr) = row(out, "Number new rows compared to most recent run")
    assert(rr == "FAIL" && nr == "There were -2 fewer rows in the most " +
      "recent table (3 vs. 5)")
    val (ri, ni) = row(out, "Number distinct IDs")
    assert(ri == "FAIL" && ni ==
      "There were 2 distinct IDs but 3 rows overall (should be the same)")
  }

  test("mmEligTimevarQa: id-count row uses fewer/more IDs wording") {
    val stage = Seq((1L, "x"), (2L, "x")).toDF("id_apde", "c")
    val out = CombinedQa.mmEligTimevarQa(stage, "id_apde", 1L, 3L, "t")
    val (ri, ni) = row(out, "Number distinct IDs")
    assert(ri == "FAIL" &&
      ni == "There were -1 fewer IDs in the most recent table (2 vs. 3)")
    assert(row(out, "Number new rows compared to most recent run")._1 ==
      "PASS")
  }

  test("mcareEligTimevarQa: MBSF mismatch, duplicate rows, and the " +
      "double-quoted hard-window date notes") {
    val stage = Seq(
      ("E1", "2000-01-01", "2000-01-31"),
      ("E1", "2000-01-01", "2000-01-31"), // exact duplicate
      ("E2", "2010-02-01", "2010-02-28")) // outside the window
      .map { case (id, f, t) => (id, Date.valueOf(f), Date.valueOf(t)) }
      .toDF("id_mcare", "from_date", "to_date")
    val mbsf = Seq("E1", "E2", "E3").toDF("bene_id")
    val out = CombinedQa.mcareEligTimevarQa(stage, "id_mcare", mbsf,
      "bene_id", 3L, "2000-01-01", "2000-12-31", "t")
    val (ri, ni) = row(out, "Number distinct IDs")
    assert(ri == "FAIL" && ni == "There were 2 distinct IDs but 3 in " +
      "the WA MBSF data (should be the same)")
    val (rd, nd) = row(out, "Duplicate rows")
    assert(rd == "FAIL" && nd ==
      "There were 2 distinct rows but 3 rows overall (should be the same)")
    val (rw, nw) = row(out, "Date range")
    assert(rw == "FAIL")
    assert(nw == "Some from/to dates fell outside the CLNDR_YEAR_MNTH " +
      "range (min: \"2000-01-01\", max: \"2010-02-28\")")
  }

  test("xwalkQa: stored-count FAIL keeps the 'shoudl' typo and pairing " +
      "violations WARN") {
    val stage = Seq(
      ("a1", "K1", Option("M1"), None: Option[String], Option("P1")),
      ("a2", "K2", Option("M2"), None, Option("P1")), // P1 -> two id_apde
      ("a3", "K3", None, None, None))
      .toDF("id_apde", "KCMASTER_ID", "id_mcaid", "id_mcare",
        "phousing_id")
    val prior = Seq(
      ("a1", "K1", Option("M1"), None: Option[String], Option("P1")),
      ("a2", "K2", Option("M2"), None, None),
      ("a3", "K3", None, None, None),
      ("a4", "K4", None, None, None)) // prior had MORE KCM ids
      .toDF("id_apde", "KCMASTER_ID", "id_mcaid", "id_mcare",
        "phousing_id")
    val out = CombinedQa.xwalkQa(stage, prior, idhMcaidCount = 2L,
      idhPhaCount = 2L, "t")
    val (rk, nk) = row(out, "Number distinct IDs - KCMASTER_ID")
    assert(rk == "FAIL" && nk == "There were 3 distinct KCMASTER_IDs " +
      "but 4 in the most recent [claims].[metadata_qa_xwalk_values] " +
      "(shoudl be >=)")
    val (rm, nm) = row(out, "Number distinct IDs - Medicaid")
    assert(rm == "PASS" && nm.startsWith(
      "The number of distinct MCAID IDs (2) is equal"))
    // PHOUSING: stage has 1 distinct vs idh 2 -> FAIL repeating the
    // prior count twice (the reference glue quirk)
    val (rp, np) = row(out, "Number distinct IDs - phousing_id")
    assert(rp == "FAIL" && np == "There were 1 distinct PHOUSING_IDs " +
      "but 2 in the most recent [IDMatch].[IM_HISTORY_TABLE] in the " +
      "IDH (2)")
    // P1 pairs with a1 AND a2 -> WARNING with but-wording
    val (rw, nw) = row(out, "Unique pairing with id_apde - phousing_id")
    assert(rw == "WARNING" && nw ==
      "There were 1 phousing_id values but 2 phousing_id--id_apde pairs")
    assert(row(out, "Unique pairing with id_apde - KCMASTER_ID")._1 ==
      "PASS")
  }

  test("headerDupProbe flags only cross-source same-day collisions") {
    val mcaidPc = Seq((1L, "2000-01-01"), (2L, "2000-01-01"))
      .map { case (i, d) => (i, Date.valueOf(d)) }
      .toDF("id_mcaid", "first_service_date")
    val mcarePc = Seq(("C1", "2000-01-01"), ("C3", "2000-02-01"))
      .map { case (i, d) => (i, Date.valueOf(d)) }
      .toDF("id_mcare", "first_service_date")
    val xw1 = Seq((1L, 100L), (2L, 101L)).toDF("id_mcaid", "id_apde")
    val xw2 = Seq(("C1", 100L), ("C3", 103L)).toDF("id_mcare", "id_apde")
    val out = CombinedQa.headerDupProbe(mcaidPc, xw1, mcarePc, xw2)
      .collect()
    // only id_apde 100 has both a mcaid and a mcare pc visit that day
    assert(out.length == 1)
    assert(out(0).getLong(0) == 100L && out(0).getLong(2) == 2L)
  }
}
