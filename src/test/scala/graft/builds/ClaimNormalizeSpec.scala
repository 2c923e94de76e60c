package graft.builds

import graft.SparkSpec

/** Hand-computed fixtures for the phase-1 normalization builds: ICD
  * zero-padding/version inference, proc+modifier unpivot labels, and the
  * ISNUMERIC-guarded pharm casts. */
class ClaimNormalizeSpec extends SparkSpec {

  test("icdcm: zero-pad, e-code pad, version inference, null drop, distinct") {
    val s = spark
    import s.implicits._
    val wide = Seq(
      // (claim, dx01, dx02, dx03)
      (1L, "42", "E12", null.asInstanceOf[String]), // numeric + e-code + null slot
      (2L, "a123", " 99 ", "V7"),                   // lower-case ICD-10, padded raw, V-code
      (3L, "42", "42", "42")                        // same code in 3 slots -> 3 rows (slot differs)
    ).toDF("claim_header_id", "dx01", "dx02", "dx03")

    val out = ClaimIcdcm.build(wide, Seq("claim_header_id"),
        Seq("01" -> "dx01", "02" -> "dx02", "03" -> "dx03"))
      .select("claim_header_id", "icdcm_number", "icdcm_norm", "icdcm_version")
      .as[(Long, String, String, Int)].collect().toSet

    assert(out === Set(
      (1L, "01", "00042", 9),
      (1L, "02", "E012", 9),
      (2L, "01", "A123", 10),
      (2L, "02", "00099", 9),
      (2L, "03", "V007", 9),
      (3L, "01", "00042", 9),
      (3L, "02", "00042", 9),
      (3L, "03", "00042", 9)))
  }

  test("icdcm: duplicate (claim, slot, code) rows collapse via distinct") {
    val s = spark
    import s.implicits._
    val wide = Seq((1L, "7"), (1L, "7")).toDF("claim_header_id", "dx01")
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
