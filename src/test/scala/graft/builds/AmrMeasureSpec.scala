package graft.builds

import java.sql.Date
import graft.SparkSpec

/** Pins the AMR measure's qualification and ratio semantics on planted
  * persons: persistence (two-year identification), the dx_needed rule,
  * the ever-before exclusion, the >= 0.5 numerator cut, and the
  * ceiling-based oral med-unit computation (the documented divergence
  * from the reference's integer-division artifact). */
class AmrMeasureSpec extends SparkSpec {
  import spark.implicits._

  private val d = (s: String) => Date.valueOf(s)

  // NDCs: C1 controller inhaler, R1 reliever inhaler, L1 controller oral LK
  private lazy val medLists = Seq(
    ("Asthma Controller Medications", "C1", "NDC", "fluticasone",
      "inhalation", "Inhaled corticosteroids", None: Option[Double]),
    ("Asthma Reliever Medications", "R1", "NDC", "albuterol",
      "inhalation", "SABA", None: Option[Double]),
    ("Asthma Controller Medications", "L1", "NDC", "montelukast",
      "oral", "Leukotriene modifiers", None: Option[Double]))
    .toDF("medication_list_name", "code", "code_system",
      "generic_product_name", "route", "drug_class", "package_size")

  private lazy val valueSets = Seq(
    ("Asthma", "J4540", "ICD10CM"), ("COPD", "J440", "ICD10CM"),
    ("Outpatient", "99213", "CPT"))
    .toDF("value_set_name", "code", "code_system")

  private def fills(id: Long, ndc: String, dates: Seq[String],
      supply: Int = 10): Seq[(Long, String, Date, Int, Double)] =
    dates.map(dt => (id, ndc, d(dt), supply, 1.0))

  private lazy val out = {
    val pop = (for {
      id <- Seq(1L, 2L, 3L, 4L, 5L, 6L)
      (em, ym, beg) <- Seq(("1996-12-31", 199612, 199601),
        ("1997-12-31", 199712, 199701))
    } yield (id, ym, d(em), 30, 12, 0, beg))
      .toDF("id_mcaid", "year_month", "end_month", "end_month_age",
        "full_benefit_t_12_m", "dual_t_12_m", "beg_measure_year_month")
    def y4(y: Int) = Seq(s"$y-02-01", s"$y-04-01", s"$y-06-01", s"$y-08-01")
    val pharm = (
      fills(1L, "C1", y4(1996) ++ y4(1997)) ++            // persistent, amr 1
      fills(2L, "C1", y4(1997)) ++                        // 1997 only
      fills(3L, "C1", y4(1996) ++ y4(1997)) ++            // excluded by COPD
      fills(4L, "C1", y4(1996) ++ Seq("1997-02-01")) ++   // amr 1/4 in 1997
      fills(4L, "R1", Seq("1997-04-01", "1997-06-01", "1997-08-01")) ++
      fills(5L, "L1", y4(1996) ++ y4(1997)) ++            // dx_needed, no dx
      fills(6L, "C1", y4(1996) ++ Seq("1997-02-01", "1997-04-01")) ++
      fills(6L, "R1", Seq("1997-06-01", "1997-08-01")) ++
      fills(6L, "L1", Seq("1997-10-01"), supply = 75))    // ceil(75/30) = 3
      .toDF("id_mcaid", "ndc", "rx_fill_date", "rx_days_supply",
        "rx_quantity")
    val header = Seq((3L, 300L, d("1996-06-01"), 0, 0))
      .toDF("id_mcaid", "claim_header_id", "first_service_date",
        "ed_perform", "inpatient")
    val dx = Seq((3L, 300L, "J440", 10, "02"))
      .toDF("id_mcaid", "claim_header_id", "icdcm_norm", "icdcm_version",
        "icdcm_number")
    val proc = Seq.empty[(Long, Long, String)]
      .toDF("id_mcaid", "claim_header_id", "procedure_code")
    val ageGrp = Seq((30, "30-39")).toDF("age", "age_grp_10")
    AmrMeasure.build(pop, header, dx, proc, pharm, valueSets, medLists,
      ageGrp, endMonths = Seq("1996-12-31", "1997-12-31"))
      .select("id_mcaid", "end_month", "amr", "numerator")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString,
        r.getDouble(2), r.getInt(3))).toSet
  }

  test("persistence: only two-year-identified persons qualify, only in " +
      "the second year") {
    val ids1997 = out.filter(_._2 == "1997-12-31").map(_._1)
    assert(ids1997 == Set(1L, 4L, 6L))
    // 1996 has no prior identification year in the fixture
    assert(!out.exists(_._2 == "1996-12-31"))
  }

  test("one-year-only person is not persistent") {
    assert(!out.exists(_._1 == 2L))
  }

  test("ever-before COPD diagnosis excludes") {
    assert(!out.exists(_._1 == 3L))
  }

  test("oral-LK-only events require a diagnosis (dx_needed rule)") {
    assert(!out.exists(_._1 == 5L))
  }

  test("ratio and >= 0.5 numerator cut") {
    val p1 = out.find(_._1 == 1L).get
    assert(p1._3 == 1.0 && p1._4 == 1)
    val p4 = out.find(_._1 == 4L).get
    assert(p4._3 == 0.25 && p4._4 == 0)
  }

  test("oral med units use ceiling blocks (documented divergence from " +
      "the reference's integer division)") {
    // controller = 2 inhaler fills + ceil(75/30) = 5; reliever = 2
    val p6 = out.find(_._1 == 6L).get
    assert(p6._3 == math.rint(5.0 / 7.0 * 10000) / 10000)
    assert(p6._4 == 1)
  }
}
