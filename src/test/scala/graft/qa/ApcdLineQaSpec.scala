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
}
