package graft.builds

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the mcare claim-detail trio's reference quirks: the asymmetric
  * no-base-row denial behavior (claim_line), the trimmed-length pad
  * gate, the exact-`' '` slot drop + first-service-date ICD-9 gate
  * (icdcm_header), and the modifier unpivot/residual/blank-fold matrix
  * (procedure). */
class McareClaimDetailSpec extends SparkSpec {
  import spark.implicits._

  private val d = (s: String) => java.sql.Date.valueOf(s)

  private def enroll = Seq("B1", "B2").toDF("bene_id")

  test("claim_line: no-base-row excluded for carrier, kept for facility") {
    val line = Seq(("B1", "C1", "1", "23", "P")).toDF(
      "bene_id", "clm_id", "line_num", "line_place_of_srvc_cd",
      "line_cms_type_srvc_cd")
    val rev = Seq(("B1", "C1", "1", "0450")).toDF(
      "bene_id", "clm_id", "clm_line_num", "rev_cntr")
    val base = spark.emptyDataFrame
      .select(lit("X").as("clm_id"), lit(d("1995-01-01")).as("clm_from_dt"),
        lit(d("1995-01-02")).as("clm_thru_dt"),
        lit("1").as("carr_clm_pmt_dnl_cd"),
        lit("").as("clm_mdcr_non_pmt_rsn_cd"))
      .limit(0)
    val out = McareClaimLine.build(
      Seq(("carrier", line, base)), Seq(("hha", rev, base)), enroll)
      .collect()
    // carrier line lost its base row -> NULL denial code fails IN;
    // facility rev line passes (NULL satisfies the IS NULL arm)
    assert(out.map(_.getAs[String]("filetype_mcare")).toSeq == Seq("hha"))
    assert(out.head.getAs[java.sql.Date]("first_service_date") == null)
  }

  test("claim_line: pad gate pads trimmed-short codes, passes raw long ones") {
    val line = Seq(
      ("B1", "C1", "1", " 2", "P"), // trimmed len 1 -> '02'
      ("B1", "C2", "1", "23", "P")) // len 2 -> untouched
      .toDF("bene_id", "clm_id", "line_num", "line_place_of_srvc_cd",
        "line_cms_type_srvc_cd")
    val base = Seq(("C1", d("1995-01-01"), d("1995-01-02"), "1", ""),
      ("C2", d("1995-01-01"), d("1995-01-02"), "1", ""))
      .toDF("clm_id", "clm_from_dt", "clm_thru_dt",
        "carr_clm_pmt_dnl_cd", "clm_mdcr_non_pmt_rsn_cd")
    val out = McareClaimLine.build(Seq(("carrier", line, base)), Nil,
        enroll)
      .collect().map(r => r.getAs[String]("claim_header_id") ->
        r.getAs[String]("place_of_service_code")).toMap
    assert(out == Map("C1" -> "02", "C2" -> "23"))
  }

  test("icdcm: exact-single-space drop, slot labels, first-date ICD-9 gate") {
    val base = Seq(
      ("B1", "C1", d("2015-09-30"), d("2015-10-02"), "V12", "250", " "),
      ("B2", "C2", d("2015-10-01"), d("2015-10-02"), "V12", "  ", null))
      .toDF("bene_id", "clm_id", "clm_from_dt", "clm_thru_dt", "a", "d1",
        "d2")
    val out = McareClaimIcdcm.build(Seq(
        McareClaimIcdcm.arm(base, "inpatient", Some("a"),
          Seq("d1", "d2"), Nil)),
        enroll)
      .collect()
      .map(r => (r.getAs[String]("claim_header_id"),
        r.getAs[String]("icdcm_number"), r.getAs[String]("icdcm_raw"),
        r.getAs[String]("icdcm_norm"), r.getAs[Int]("icdcm_version")))
      .toSet
    assert(out == Set(
      // pre-cutover first date: V12 is ICD-9 and right-pads
      ("C1", "admit", "V12", "V1200", 9),
      ("C1", "01", "250", "25000", 9),
      // ' ' dropped exactly; '  ' (two spaces) SURVIVES (len 2, ICD-10)
      ("C2", "admit", "V12", "V12", 10),
      ("C2", "01", "  ", "  ", 10)))
  }

  test("procedure: modifier unpivot vs residual vs blank-fold matrix") {
    val gated = Seq(
      // hcpcs + one real modifier + one ' ' modifier
      ("B1", "C1", d("1995-01-01"), d("1995-01-02"), "99213", "25", " ",
        "M1A", "0210093"),
      // hcpcs, all modifiers null -> residual (hcpcs, NULL)
      ("B1", "C2", d("1995-01-01"), d("1995-01-02"), "99214", null, null,
        null, " "))
      .toDF("bene_id", "clm_id", "clm_from_dt", "clm_thru_dt", "pchcpcs",
        "mod1", "mod2", "pcbetos", "pc1")
    import McareClaimProcedure.ArmSpec
    val noFold = McareClaimProcedure.build(Seq(McareClaimProcedure.arm(
        gated, ArmSpec("inpatient", Seq("mod1", "mod2"), blankFold = false,
          None, Seq("pc1")))), enroll)
      .collect()
      .map(r => (r.getAs[String]("claim_header_id"),
        r.getAs[String]("procedure_code"),
        r.getAs[String]("modifier_code"))).toSet
    // ' ' modifier survives without blank-fold; ' ' PCS slot dropped
    assert(noFold == Set(("C1", "99213", "25"), ("C1", "99213", " "),
      ("C1", "0210093", null), ("C2", "99214", null)))
    val folded = McareClaimProcedure.build(Seq(McareClaimProcedure.arm(
        gated, ArmSpec("hha", Seq("mod1", "mod2"), blankFold = true,
          None, Nil))), enroll)
      .collect()
      .map(r => (r.getAs[String]("claim_header_id"),
        r.getAs[String]("procedure_code"),
        r.getAs[String]("modifier_code"))).toSet
    // blank-fold: ' ' -> NULL, so C1 keeps only the real modifier
    assert(folded == Set(("C1", "99213", "25"), ("C2", "99214", null)))
  }

  test("procedure: betos emits independently of hcpcs; enrollment gates") {
    val gated = Seq(
      ("B1", "C1", d("1995-01-01"), d("1995-01-02"), null, null, "M1A"),
      ("B9", "C9", d("1995-01-01"), d("1995-01-02"), "99213", null, "T1H"))
      .toDF("bene_id", "clm_id", "clm_from_dt", "clm_thru_dt", "pchcpcs",
        "mod1", "pcbetos")
    import McareClaimProcedure.ArmSpec
    val out = McareClaimProcedure.build(Seq(McareClaimProcedure.arm(
        gated, ArmSpec("carrier", Seq("mod1"), blankFold = false,
          Some("pcbetos"), Nil))), enroll)
      .collect()
      .map(r => (r.getAs[String]("claim_header_id"),
        r.getAs[String]("procedure_code"))).toSet
    // C1: no hcpcs but betos row; C9's member unenrolled -> dropped
    assert(out == Set(("C1", "M1A")))
  }
}
