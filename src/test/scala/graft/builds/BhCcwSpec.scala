package graft.builds

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hand-computed fixtures for the combined-source BH and CCW builds
  * (scripts_general/claim_bh.R, load_ccw.R). */
class BhCcwSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  // ---- BhConditions ----

  private val ref = Seq(
    ("bh_depression", "ICD10CM", "F329", Some(10), "rda-bh", None),
    ("sud_opioid", "ICD10CM", "F1120", Some(10), "rda-bh", None),
    ("sud_opioid", "NDC", "33333333333", None, "rda-ndc", None),
    ("sud_opioid", "HCPCS", "H0020", None, "apde-moud-procedure", Some(1)),
    ("sud_opioid", "HCPCS", "J0571", None, "apde-moud-procedure", Some(0)))
    .toDF("sub_group_condition", "code_set", "code", "icdcm_version",
      "value_set_name", "oud_dx1_flag")

  private val emptyPharm = Seq.empty[(Long, Long, String, Date)]
    .toDF("id_apde", "claim_header_id", "ndc", "rx_fill_date")

  test("BH: MOUD claims count only from the first OUD-diagnosis month; " +
      "H0020 requires primary OUD dx, J0571 does not") {
    // person 1: OUD dx in 2020-03 (claim 1); MOUD J0571 in 2020-02
    // (claim 2, BEFORE first dx month -> excluded) and in 2020-04
    // (claim 3, after -> person-month row)
    val icdcm = Seq(
      (1L, 1L, "F1120", 10, d("2020-03-10")))
      .toDF("id_apde", "claim_header_id", "icdcm_norm", "icdcm_version",
        "first_service_date")
    val proc = Seq(
      (1L, 2L, "J0571", d("2020-02-15")),
      (1L, 3L, "J0571", d("2020-04-20")),
      // person 2: H0020 with NO primary-OUD header -> dropped entirely
      (2L, 4L, "H0020", d("2020-05-05")))
      .toDF("id_apde", "claim_header_id", "procedure_code",
        "first_service_date")
    val header = Seq(
      (1L, "F1120", 10), (2L, "I10", 10), (3L, "I10", 10), (4L, "I10", 10))
      .toDF("claim_header_id", "primary_diagnosis", "icdcm_version")
    val out = BhConditions.build(icdcm, emptyPharm, proc, header, ref)
      .filter(col("bh_cond") === "sud_opioid")
      .select("id_apde", "first_encounter_date", "last_encounter_date")
      .as[(Long, Date, Date)].collect().toSet
    assert(out === Set(
      (1L, d("2020-03-01"), d("2020-03-31")),  // dx month
      (1L, d("2020-04-01"), d("2020-04-30")))) // post-dx MOUD month
  }

  test("BH: H0020 on a claim whose primary dx IS OUD counts; dx months " +
      "and MOUD months dedupe") {
    val icdcm = Seq((1L, 1L, "F1120", 10, d("2020-03-10")))
      .toDF("id_apde", "claim_header_id", "icdcm_norm", "icdcm_version",
        "first_service_date")
    // H0020 on claim 2 whose header primary dx is OUD (same month as dx)
    val proc = Seq((1L, 2L, "H0020", d("2020-03-25")))
      .toDF("id_apde", "claim_header_id", "procedure_code",
        "first_service_date")
    val header = Seq((1L, "F1120", 10), (2L, "F1120", 10))
      .toDF("claim_header_id", "primary_diagnosis", "icdcm_version")
    val out = BhConditions.build(icdcm, emptyPharm, proc, header, ref)
      .filter(col("bh_cond") === "sud_opioid")
      .select("id_apde", "first_encounter_date")
      .as[(Long, Date)].collect().toSeq
    // one deduped 2020-03 person-month row
    assert(out === Seq((1L, d("2020-03-01"))))
  }

  test("BH: non-OUD conditions collapse to one first/last span") {
    val icdcm = Seq(
      (1L, 1L, "F329", 10, d("2019-01-05")),
      (1L, 2L, "F329", 10, d("2020-06-07")))
      .toDF("id_apde", "claim_header_id", "icdcm_norm", "icdcm_version",
        "first_service_date")
    val proc = Seq.empty[(Long, Long, String, Date)]
      .toDF("id_apde", "claim_header_id", "procedure_code",
        "first_service_date")
    val header = Seq((1L, "I10", 10), (2L, "I10", 10))
      .toDF("claim_header_id", "primary_diagnosis", "icdcm_version")
    val out = BhConditions.build(icdcm, emptyPharm, proc, header, ref)
      .collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("bh_cond") === "bh_depression")
    assert(out.head.getAs[Date]("first_encounter_date") === d("2019-01-05"))
    assert(out.head.getAs[Date]("last_encounter_date") === d("2020-06-07"))
  }

  // ---- CcwConditions ----

  import CcwConditions.{CcwArm, CcwDef}

  private val ccwRef = Seq(
    ("E119", 10, 1, 0), ("O2412", 10, 0, 1))
    .toDF("icdcm", "icdcm_version", "ccw_diabetes", "ccw_diabetes_exclude")

  private val diabetes = CcwDef(2, "Diabetes", "diabetes", claimCount = 2,
    lookbackMonths = 12, dxClaim1 = Seq(1), dxClaim2 = Seq(4),
    exclude1 = Some("ccw_diabetes_exclude"), exclude2 = None,
    icd9 = CcwArm(run = false, dxFields = "1-2"),
    icd10 = CcwArm(run = true, dxFields = "1-2"))

  private def dxRow(chid: Long, norm: String, num: String) =
    (10L, chid, norm, 10, num)

  private def runCcw(hdr: Seq[(Long, Long, Int, Date)],
      dx: Seq[(Long, Long, String, Int, String)]) =
    CcwConditions.build(
      hdr.toDF("id_apde", "claim_header_id", "claim_type_id",
        "first_service_date"),
      dx.toDF("id_apde", "claim_header_id", "icdcm_norm", "icdcm_version",
        "icdcm_number"),
      ccwRef, Seq(diabetes))

  test("CCW rule 2: two condition-2 claims qualify only inside the " +
      "month-boundary lookback and at least 1 day apart") {
    // person A: claims on 2020-01-31 and 2021-01-01 -> datediff(month)
    // = 12 (boundary count) <= 12, days >= 1 -> qualifies (a
    // months_between formulation would call this 11.x and also pass,
    // but 2020-01-31 -> 2021-01-31 is the discriminating boundary case)
    val out = runCcw(
      hdr = Seq((10L, 1L, 4, d("2020-01-31")), (10L, 2L, 4, d("2021-01-01"))),
      dx = Seq(dxRow(1L, "E119", "01"), dxRow(2L, "E119", "02")))
      .collect()
    assert(out.length === 1)
    assert(out.head.getAs[Date]("first_encounter_date") === d("2020-01-31"))
    assert(out.head.getAs[Date]("last_encounter_date") === d("2021-01-01"))
  }

  test("CCW rule 2: claims 13 month-boundaries apart do NOT qualify; " +
      "same-day duplicate claims do NOT qualify (days >= 1)") {
    val far = runCcw(
      hdr = Seq((10L, 1L, 4, d("2020-01-15")), (10L, 2L, 4, d("2021-02-01"))),
      dx = Seq(dxRow(1L, "E119", "01"), dxRow(2L, "E119", "01")))
    assert(far.count() === 0)
    val sameDay = runCcw(
      hdr = Seq((10L, 1L, 4, d("2020-01-15")), (10L, 2L, 4, d("2020-01-15"))),
      dx = Seq(dxRow(1L, "E119", "01"), dxRow(2L, "E119", "01")))
    assert(sameDay.count() === 0)
  }

  test("CCW: condition-1 claim types qualify alone; exclusion dx on the " +
      "claim blocks it; dx_fields '1-2' ignores dx position 3") {
    // inpatient (type 1) claim qualifies alone
    val alone = runCcw(
      hdr = Seq((10L, 1L, 1, d("2020-05-05"))),
      dx = Seq(dxRow(1L, "E119", "02")))
    assert(alone.count() === 1)
    // same claim with a gestational-diabetes exclusion dx -> blocked
    val excluded = runCcw(
      hdr = Seq((10L, 1L, 1, d("2020-05-05"))),
      dx = Seq(dxRow(1L, "E119", "02"), dxRow(1L, "O2412", "05")))
    assert(excluded.count() === 0)
    // condition dx only at position 3 -> fields '1-2' rejects
    val pos3 = runCcw(
      hdr = Seq((10L, 1L, 1, d("2020-05-05"))),
      dx = Seq(dxRow(1L, "E119", "03")))
    assert(pos3.count() === 0)
  }

  test("CCW: ICD-9 arm with run=false contributes nothing") {
    val ref9 = Seq(("25000", 9, 1, 0), ("E119", 10, 1, 0))
      .toDF("icdcm", "icdcm_version", "ccw_diabetes",
        "ccw_diabetes_exclude")
    val out = CcwConditions.build(
      Seq((10L, 1L, 1, d("2020-05-05")))
        .toDF("id_apde", "claim_header_id", "claim_type_id",
          "first_service_date"),
      Seq((10L, 1L, "25000", 9, "01"))
        .toDF("id_apde", "claim_header_id", "icdcm_norm", "icdcm_version",
          "icdcm_number"),
      ref9, Seq(diabetes))
    assert(out.count() === 0)
  }
}
