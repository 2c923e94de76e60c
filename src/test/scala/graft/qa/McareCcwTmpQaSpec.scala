package graft.qa

import graft.SparkSpec

/** Hand-computed pins for the tmp-mode mcare CCW battery's age
  * arithmetic (qa_tmp.mcare_claim_ccw.sql:39-43): the T-SQL
  * floor((datediff(day)+1)/365.25) age, the -1→0 clamp, the <-1 NULL
  * fall-through, the missing-person LEFT-join arm, and the year
  * overlap filters. */
class McareCcwTmpQaSpec extends SparkSpec {
  import spark.implicits._

  test("age groups: band edges, the -1 clamp lands in 0-4, ages " +
      "below -1 and missing persons group under NULL") {
    val ccw = Seq(
      ("p1", 1, "ccw_a", "1995-03-01", "1995-04-01"),  // age 3  → 0-4
      ("p2", 1, "ccw_a", "1995-03-01", "1995-04-01"),  // clamp  → 0-4
      ("p3", 1, "ccw_a", "1995-03-01", "1995-04-01"),  // age -2 → NULL
      ("p4", 1, "ccw_a", "1995-03-01", "1995-04-01"),  // missing→ NULL
      ("p5", 1, "ccw_a", "1995-03-01", "1995-04-01"),  // 65     → 65+
      ("p6", 1, "ccw_a", "1996-01-01", "1996-02-01"))  // outside 1995
      .toDF("id_mcare", "ccw_code", "ccw_desc", "f", "l")
      .selectExpr("id_mcare", "ccw_code", "ccw_desc",
        "CAST(f AS DATE) AS first_encounter_date",
        "CAST(l AS DATE) AS last_encounter_date")
    val demo = Seq(
      ("p1", "1992-07-01"),
      ("p2", "1996-06-01"),   // floor((−152+1)/365.25) = −1 → 0
      ("p3", "1997-06-01"),   // −2 → NULL
      ("p5", "1930-12-31"),   // 65
      ("p6", "1990-01-01"))
      .toDF("id_mcare", "dob")
      .selectExpr("id_mcare", "CAST(dob AS DATE) AS dob")
    val tv = Seq(("p1", "1995-01-01", "1995-06-30"),
        ("p9", "1996-01-01", "1996-06-30"))  // outside 1995
      .toDF("id_mcare", "f", "l")
      .selectExpr("id_mcare", "CAST(f AS DATE) AS from_date",
        "CAST(l AS DATE) AS to_date")
    val out = McareCcwTmpQa.battery(ccw, demo, tv, 1995).collect()
    val s4 = out.filter(_.getAs[String]("qa_section") == "cond_age7")
      .map(r => Option(r.getAs[String]("age_grp7")).getOrElse("NULL") ->
        r.getAs[Long]("id_dcount")).toMap
    // p1 (age 3) and p2 (clamped -1→0) land in 0-4; p3 and p4 in the
    // NULL group; p5 in 65+; p6's spell is outside 1995
    assert(s4 == Map("0-4" -> 2L, "NULL" -> 2L, "65 and over" -> 1L))
    val s5 = out.filter(_.getAs[String]("qa_section") == "timevar_age7")
      .map(r => Option(r.getAs[String]("age_grp7")).getOrElse("NULL") ->
        r.getAs[Long]("id_dcount")).toMap
    assert(s5 == Map("0-4" -> 1L))  // only p1 enrolled in 1995
    val counts = out.filter(_.getAs[String]("qa_section") == "cond_count")
    assert(counts.head.getAs[Long]("id_dcount") == 1L)
    val dp = out.filter(_.getAs[String]("qa_section") == "demo_person_dcount")
    assert(dp.head.getAs[Long]("id_dcount") == 5L)
  }
}
