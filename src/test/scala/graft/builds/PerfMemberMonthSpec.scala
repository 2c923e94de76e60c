package graft.builds

import java.sql.Date

import graft.SparkSpec

/** Hand fixtures for the perf member-month spine
  * (create_stage.sp_mcaid_perf_elig_member_month.sql). */
class PerfMemberMonthSpec extends SparkSpec {

  import spark.implicits._

  private def elig(rows: (String, String, String, String, Int, String,
      String)*) =
    rows.map { case (id, rac, f, t, cov, name, zip) =>
      (200001, id, rac, Date.valueOf(f), Date.valueOf(t),
        if (cov == 1) "MC" else "FFS", name, "N", "N", zip)
    }.map { case (ym, id, rac, f, t, cov, name, d, tp, zip) =>
      (ym, id, rac, f, t, cov, name, d, tp, zip)
    }.toDF("clndr_year_mnth", "medicaid_recipient_id",
      "rprtbl_rac_code", "from_date", "to_date", "coverage_type_ind",
      "mc_prvdr_name", "dual_elig", "tpl_full_flag",
      "rsdntl_postal_code")

  private val king = Seq("98101", "98102").toDF("zip_code")

  test("MCO map: five codes, both Coordinated Care spellings, " +
      "unmapped and non-MC names go NULL") {
    val in = elig(
      ("a", "R1", "2000-01-01", "2000-01-31", 1,
        "Amerigroup Washington Inc", "98101"),
      ("b", "R1", "2000-01-01", "2000-01-31", 1,
        "Coordinated Care Corporation", "98101"),
      ("c", "R1", "2000-01-01", "2000-01-31", 1,
        "Coordinated Care of Washington", "98101"),
      ("d", "R1", "2000-01-01", "2000-01-31", 1,
        "Some Other Plan LLC", "98101"),
      // FFS row with a mappable name still nulls (the reference CASE
      // requires COVERAGE_TYPE_IND = 'MC' in every arm)
      ("e", "R1", "2000-01-01", "2000-01-31", 0,
        "Amerigroup Washington Inc", "98101"))
    val out = PerfMemberMonth.build(in, king)
      .select("medicaid_recipient_id", "mc_prvdr_name")
      .as[(String, Option[String])].collect().toMap
    assert(out == Map("a" -> Some("AGP"), "b" -> Some("CCW"),
      "c" -> Some("CCW"), "d" -> None, "e" -> None))
  }

  test("King-zip gate drops non-King rows; longest span wins per " +
      "(member, month)") {
    val in = elig(
      ("a", "R1", "2000-01-01", "2000-01-10", 1,
        "Amerigroup Washington Inc", "98101"),   // span 9
      ("a", "R2", "2000-01-05", "2000-01-25", 1,
        "Molina Healthcare of Washington Inc", "98102"), // span 20: wins
      ("a", "R3", "2000-01-02", "2000-01-03", 1,
        "United Health Care Community Plan", "99999"))   // not King
    val out = PerfMemberMonth.build(in, king).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("rprtbl_rac_code") == "R2")
    assert(out(0).getAs[String]("mc_prvdr_name") == "MHW")
  }

  test("span ties break deterministically on from_date then rac") {
    val in = elig(
      ("a", "R9", "2000-01-11", "2000-01-16", 1,
        "Amerigroup Washington Inc", "98101"),
      ("a", "R2", "2000-01-05", "2000-01-10", 1,
        "Molina Healthcare of Washington Inc", "98101"))
    val out = PerfMemberMonth.build(in, king).collect()
    assert(out.length == 1)
    // both spans are 5 days: earlier from_date wins
    assert(out(0).getAs[String]("rprtbl_rac_code") == "R2")
  }
}
