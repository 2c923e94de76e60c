package graft.builds

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WAHBE export prep: the zero-pad normalization CASE, the unmatched
  * modal-ACES rank, the export's NULL row for unmatched persons, and
  * the rank()=1 full-tie behavior in the coverage pick. */
class WahbeDataPrepSpec extends SparkSpec {

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("normalizeAcesId: len 7 -> '00'+, len 8 -> '0'+, else NULL") {
    val s = spark
    import s.implicits._
    val got = Seq("1234567", "12345678", "123456789", "123")
      .toDF("a")
      .select(WahbeDataPrep.normalizeAcesId(col("a")).as("n"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(got == Seq(Some("001234567"), Some("012345678"), None, None))
  }

  test("unmatchedAces: most monthly rows wins, ACES ascending breaks " +
    "count ties") {
    val s = spark
    import s.implicits._
    val persons = Seq(
      ("ID1", Option.empty[String]), ("ID2", Option.empty[String]),
      ("ID3", Some("ID3"))) // matched -> excluded from the pick
      .toDF("id_mcaid", "MEDICAID_RECIPIENT_ID")
    val elig = (Seq.fill(3)(("ID1", "A9")) ++ Seq.fill(5)(("ID1", "A5")) ++
      Seq.fill(2)(("ID2", "B2")) ++ Seq.fill(2)(("ID2", "B1")) ++
      Seq.fill(9)(("ID3", "C1")))
      .toDF("MEDICAID_RECIPIENT_ID", "MBR_ACES_IDNTFR")
    val got = WahbeDataPrep.unmatchedAces(persons, elig)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("ID1", "A5"), ("ID2", "B1"))) // count, then aces
  }

  test("export: unmatched person keeps exactly one NULL-status row") {
    val s = spark
    import s.implicits._
    val persons = Seq(("UW1", "ID1"), ("UW2", "ID2"))
      .toDF("id_uw", "id_mcaid")
    val matched = Seq(
      ("001", "smoker", d("1996-01-01"), d("1996-12-31"), "A", "ID1"),
      ("001", "smoker", d("1997-01-01"), d("1997-12-31"), "A", "ID1"))
      .toDF("aces_id_norm", "smoking_status", "eligibility_start_date",
        "eligibility_end_date", "MBR_ACES_IDNTFR",
        "MEDICAID_RECIPIENT_ID")
    val got = WahbeDataPrep.export(persons, matched)
      .collect().map(r => (r.getString(0), Option(r.getString(1)),
        Option(r.getDate(2)).map(_.toString))).toSet
    assert(got == Set(
      ("UW1", Some("smoker"), Some("1996-01-01")),
      ("UW1", Some("smoker"), Some("1997-01-01")),
      ("UW2", None, None)))
  }

  test("coveragePick: equal-coverage tie resolves down the attribute " +
    "order (cov_type last); out-of-window coverage drops the id") {
    val s = spark
    import s.implicits._
    val ids = Seq("ID1", "ID2").toDF("id_mcaid")
    val timevar = Seq(
      // ID1: two groups with EQUAL summed coverage and equal tie-break
      // prefix differing only in cov_type -> rank()=1 picks the first
      ("ID1", 0L, 1, "Y", "FFS", 10, d("1996-01-01"), d("1996-03-01")),
      ("ID1", 0L, 1, "Y", "MC", 10, d("1996-02-01"), d("1996-04-01")),
      // ID2: coverage entirely OUTSIDE the window -> dropped
      ("ID2", 0L, 1, "Y", "FFS", 10, d("1990-01-01"), d("1990-03-01")))
      .toDF("id_mcaid", "dual", "bsp_group_cid", "full_benefit",
        "cov_type", "cov_time_day", "from_date", "to_date")
    val got = WahbeDataPrep.coveragePick(ids, timevar,
        "1994-01-01", "1997-06-30")
      .select("id_mcaid", "cov_type")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("ID1", "FFS"))) // FFS < MC in the tie order
  }
}
