package graft.builds

import graft.SparkSpec

/** Hand-computed fixtures for the phase-1 normalization builds: ICD
  * zero-padding/version inference, proc+modifier unpivot labels, and the
  * ISNUMERIC-guarded pharm casts. */
class ClaimNormalizeSpec extends SparkSpec {

  test("icdcm: right-pad 3-4 char ICD-9, date-gated E/V version, null drop") {
    val s = spark
    import s.implicits._
    val d9 = java.sql.Date.valueOf("2014-06-01")   // pre ICD-10 cutover
    val d10 = java.sql.Date.valueOf("2016-01-01")  // post cutover
    val wide = Seq(
      // (claim, last_service_date, dx01, dx02, dx03)
      (1L, d9, "250", "E12", null.asInstanceOf[String]),  // digit len3 +'00'; pre-cutover E-code padded v9
      (2L, d10, "2500", "E119", "V07"),  // digit len4 +'0'; post-cutover E/V are ICD-10, untouched
      (3L, d9, " 99 ", "a123", "V7"),    // len-2 digit: v9 but NOT padded; non-E/V letter = v10
      (4L, d9, "42", "42", "  ")         // same code in 2 slots -> 2 rows; blank dropped
    ).toDF("claim_header_id", "last_service_date", "dx01", "dx02", "dx03")

    val out = ClaimIcdcm.build(wide, Seq("claim_header_id"),
        Seq("01" -> "dx01", "02" -> "dx02", "03" -> "dx03"))
      .select("claim_header_id", "icdcm_number", "icdcm_norm", "icdcm_version")
      .as[(Long, String, String, Int)].collect().toSet

    assert(out === Set(
      (1L, "01", "25000", 9),
      (1L, "02", "E1200", 9),
      (2L, "01", "25000", 9),
      (2L, "02", "E119", 10),
      (2L, "03", "V07", 10),
      (3L, "01", "99", 9),
      (3L, "02", "A123", 10),
      (3L, "03", "V7", 9),
      (4L, "01", "42", 9),
      (4L, "02", "42", 9)))
  }

  test("icdcm: duplicate (claim, slot, code) rows collapse via distinct") {
    val s = spark
    import s.implicits._
    val wide = Seq((1L, java.sql.Date.valueOf("2014-06-01"), "7"),
        (1L, java.sql.Date.valueOf("2014-06-01"), "7"))
      .toDF("claim_header_id", "last_service_date", "dx01")
    val out = ClaimIcdcm.build(wide, Seq("claim_header_id"), Seq("01" -> "dx01"))
    assert(out.count() === 1L)
  }

  test("procedure: proc + modifier slots unioned with labels, upper/trim, blanks dropped") {
    val s = spark
    import s.implicits._
    val wide = Seq(
      (1L, "99281", "j0696", "  ", "gt"),
      (2L, "99282", null.asInstanceOf[String], "25", null.asInstanceOf[String])
    ).toDF("claim_header_id", "pc01", "pc02", "mod1", "mod2")

    val out = ClaimProcedure.build(wide, Seq("claim_header_id"),
        procSlots = Seq("01" -> "pc01", "02" -> "pc02"),
        modSlots = Seq("M1" -> "mod1", "M2" -> "mod2"))
      .select("claim_header_id", "pcode_number", "pcode")
      .as[(Long, String, String)].collect().toSet

    assert(out === Set(
      (1L, "01", "99281"), (1L, "02", "J0696"), (1L, "M2", "GT"),
      (2L, "01", "99282"), (2L, "M1", "25")))
  }

  test("pharm: NDC shape validation + try_cast + domain clamp, rows never dropped") {
    val s = spark
    import s.implicits._
    val raw = Seq(
      (1L, "12345678901", "30"),   // valid ndc, valid supply
      (2L, "N2345678901", "30"),   // letter -> invalid ndc
      (3L, "1234567890", "30"),    // 10 digits -> invalid
      (4L, "12345678901", "NA"),   // unparseable supply -> null
      (5L, "12345678901", "400"),  // out of domain -> null
      (6L, "12345678901", "-1")    // below domain -> null
    ).toDF("claim_header_id", "ndc_raw", "supply_days_raw")

    val out = ClaimPharm.build(raw)
      .select("claim_header_id", "ndc", "ndc_valid", "supply_days")
      .as[(Long, Option[String], Boolean, Option[Int])].collect().toSet

    assert(out === Set(
      (1L, Some("12345678901"), true, Some(30)),
      (2L, None, false, Some(30)),
      (3L, None, false, Some(30)),
      (4L, Some("12345678901"), true, None),
      (5L, Some("12345678901"), true, None),
      (6L, Some("12345678901"), true, None)))
  }
}
