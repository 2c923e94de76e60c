package graft.qa

import java.sql.Date

import graft.SparkSpec

/** Hand-computed contracts for the APCD line-level batteries
  * (qa_stage.apcd_claim_provider.sql et al.) — the catalog rows run
  * them over the planted-defect fixtures; these pin the per-arm
  * signatures on a frame small enough to verify by eye. */
class ApcdLineQaSpec extends SparkSpec {

  import spark.implicits._

  private val d1 = Date.valueOf("2020-01-10")
  private val d2 = Date.valueOf("2020-01-12")
  private val d9 = Date.valueOf("2020-02-01")

  // three headers: h1 full slots, h2 rendering-only NULL, h3 clean
  private val medClaim = Seq(
    (1L, 10L, d1, d2, 100L, Some(200L), Some(300L), Some(400L)),
    (2L, 20L, d1, d2, 101L, None, Some(301L), None),
    (3L, 30L, d1, d2, 102L, Some(202L), None, None))
    .toDF("id_apcd", "claim_header_id", "first_service_dt",
      "last_service_dt", "billing_provider_internal_id",
      "rendering_internal_provider_id",
      "attending_internal_provider_id",
      "referring_internal_provider_id")

  private def stageRows(rows: Seq[(Long, Long, Date, Date, Long, String)]) =
    rows.toDF("id_apcd", "claim_header_id", "first_service_date",
      "last_service_date", "provider_id_apcd", "provider_type")
      .withColumn("provider_id_raw_apcd",
        org.apache.spark.sql.functions.col("provider_id_apcd"))

  private val faithful = stageRows(Seq(
    (1L, 10L, d1, d2, 100L, "billing"),
    (1L, 10L, d1, d2, 200L, "rendering"),
    (1L, 10L, d1, d2, 300L, "attending"),
    (1L, 10L, d1, d2, 400L, "referring"),
    (2L, 20L, d1, d2, 101L, "billing"),
    (2L, 20L, d1, d2, 301L, "attending"),
    (3L, 30L, d1, d2, 102L, "billing"),
    (3L, 30L, d1, d2, 202L, "rendering")))

  private def verdict(df: org.apache.spark.sql.DataFrame,
      slot: String): (Long, Long, Long, Long, Int) = {
    val r = df.filter(df("provider_type") === slot).collect()
    assert(r.length == 1, s"expected one '$slot' row")
    (r(0).getLong(2), r(0).getLong(3), r(0).getLong(4), r(0).getLong(5),
      r(0).getInt(6))
  }

  test("a faithful reshape passes every slot and the date ride-along") {
    val out = ApcdLineQa.claimProviderQa(faithful, medClaim)
    for (slot <- Seq("billing", "rendering", "attending", "referring",
        "service_dates")) {
      val (_, _, miss, extra, pass) = verdict(out, slot)
      assert(miss == 0 && extra == 0 && pass == 1, slot)
    }
    // NULL slots never become expectations: h2/h3 contribute no
    // rendering/referring demands beyond their non-null slots
    assert(verdict(out, "rendering")._1 == 2)
    assert(verdict(out, "referring")._1 == 1)
  }

  test("a dropped row is missing-only; a corrupted id is missing+extra") {
    val tampered = stageRows(Seq(
      (1L, 10L, d1, d2, 100L, "billing"),
      // h1 rendering dropped
      (1L, 10L, d1, d2, 300L, "attending"),
      (1L, 10L, d1, d2, 400L, "referring"),
      (2L, 20L, d1, d2, 999L, "billing"), // corrupted id
      (2L, 20L, d1, d2, 301L, "attending"),
      (3L, 30L, d1, d2, 102L, "billing"),
      (3L, 30L, d1, d2, 202L, "rendering")))
    val out = ApcdLineQa.claimProviderQa(tampered, medClaim)
    assert(verdict(out, "rendering") == (2L, 1L, 1L, 0L, 0))
    assert(verdict(out, "billing") == (3L, 3L, 1L, 1L, 0))
    assert(verdict(out, "attending")._5 == 1)
  }

  test("a stage row with drifted dates fails only the date ride-along") {
    val drifted = stageRows(Seq(
      (1L, 10L, d1, d9, 100L, "billing"), // lsd drifted
      (1L, 10L, d1, d2, 200L, "rendering"),
      (1L, 10L, d1, d2, 300L, "attending"),
      (1L, 10L, d1, d2, 400L, "referring"),
      (2L, 20L, d1, d2, 101L, "billing"),
      (2L, 20L, d1, d2, 301L, "attending"),
      (3L, 30L, d1, d2, 102L, "billing"),
      (3L, 30L, d1, d2, 202L, "rendering")))
    val out = ApcdLineQa.claimProviderQa(drifted, medClaim)
    assert(verdict(out, "billing")._5 == 1) // the ID set still matches
    assert(verdict(out, "service_dates") == (8L, 8L, 1L, 0L, 0))
  }

  // --- ccwLineQa: hand graph -------------------------------------------

  import graft.builds.CcwConditions.{CcwArm, CcwDef}

  private val pairCond = Seq(CcwDef(2, "Diabetes", "diabetes",
    claimCount = 2, lookbackMonths = 24, dxClaim1 = Seq(1),
    dxClaim2 = Seq(2, 4, 5), exclude1 = Some("ccw_diabetes_exclude"),
    exclude2 = None, icd9 = CcwArm(run = true, dxFields = "1-2"),
    icd10 = CcwArm(run = true, dxFields = "1-2")))

  private val ccwRef = Seq(("E119", 10, 1, 0), ("O2412", 10, 0, 1))
    .toDF("icdcm", "icdcm_version", "ccw_diabetes",
      "ccw_diabetes_exclude")

  private def hdr(rows: Seq[(Long, Long, Int, String)]) =
    rows.map { case (id, ch, ct, d) => (id, ch, ct, Date.valueOf(d)) }
      .toDF("id_apcd", "claim_header_id", "claim_type_id",
        "first_service_date")

  private def dxOf(rows: Seq[(Long, Long, String, String)]) =
    rows.map { case (id, ch, code, num) => (id, ch, code, 10, num) }
      .toDF("id_apcd", "claim_header_id", "icdcm_norm",
        "icdcm_version", "icdcm_number")

  test("ccwLineQa re-derives pair/single qualification and catches a " +
      "tampered build row") {
    // p1: two type-2 claims 3 months apart -> pair-qualifies
    // p2: one type-1 claim -> qualifies alone
    // p3: one ISOLATED type-2 claim -> must NOT qualify
    // p4: type-1 claim with the exclusion code on the same claim -> out
    val h = hdr(Seq(
      (1L, 10L, 2, "2020-01-10"), (1L, 11L, 4, "2020-04-20"),
      (2L, 20L, 1, "2020-02-01"),
      (3L, 30L, 2, "2020-03-01"),
      (4L, 40L, 1, "2020-05-01")))
    val dx = dxOf(Seq(
      (1L, 10L, "E119", "01"), (1L, 11L, "E119", "02"),
      (2L, 20L, "E119", "01"),
      (3L, 30L, "E119", "01"),
      (4L, 40L, "E119", "01"), (4L, 40L, "O2412", "03")))
    val goodBuild = Seq(
      (1L, Date.valueOf("2020-01-10"), Date.valueOf("2020-04-20"), 2,
        "Diabetes"),
      (2L, Date.valueOf("2020-02-01"), Date.valueOf("2020-02-01"), 2,
        "Diabetes"))
      .toDF("id_apcd", "first_encounter_date", "last_encounter_date",
        "ccw_code", "ccw_desc")
    val ok = ApcdLineQa.ccwLineQa(goodBuild, h, dx, ccwRef, pairCond,
      "id_apcd").collect()(0)
    assert(ok.getLong(2) == 2 && ok.getLong(3) == 2 &&
      ok.getLong(4) == 0 && ok.getLong(5) == 0 && ok.getInt(6) == 1)
    // tamper: drop p2, add the non-qualifying p3 -> 2 member mismatches
    val tampered = goodBuild.filter($"id_apcd" =!= 2L).unionByName(Seq(
      (3L, Date.valueOf("2020-03-01"), Date.valueOf("2020-03-01"), 2,
        "Diabetes"))
      .toDF("id_apcd", "first_encounter_date", "last_encounter_date",
        "ccw_code", "ccw_desc"))
    val bad = ApcdLineQa.ccwLineQa(tampered, h, dx, ccwRef, pairCond,
      "id_apcd").collect()(0)
    assert(bad.getLong(4) == 2 && bad.getInt(6) == 0)
    // tamper spans only: p1's last date pulled back -> span mismatch
    val drift = goodBuild.withColumn("last_encounter_date",
      org.apache.spark.sql.functions.expr(
        "CASE WHEN id_apcd = 1 THEN DATE '2020-01-10' " +
        "ELSE last_encounter_date END"))
    val sp = ApcdLineQa.ccwLineQa(drift, h, dx, ccwRef, pairCond,
      "id_apcd").collect()(0)
    assert(sp.getLong(4) == 0 && sp.getLong(5) == 1 && sp.getInt(6) == 0)
  }
}
