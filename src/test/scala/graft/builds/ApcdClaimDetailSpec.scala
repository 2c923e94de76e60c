package graft.builds

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** APCD claim detail family: discharge-date correction branches, the
  * denied/orphan semi gate, line-grain DISTINCT, and the provider
  * reshape (load_stage.apcd_claim_{line,provider}.R). */
class ApcdClaimDetailSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  private val headers = Seq(
    (1L, "N", "N"), (2L, "N", "N"), (3L, "N", "N"), (4L, "N", "N"),
    (5L, "Y", "N"), // denied
    (6L, "N", "Y")  // orphaned
  ).toDF("claim_header_id", "denied_header_flag", "orphaned_header_flag")

  private def lineRow(chid: Long, lineId: Long, adm: Option[String],
      dis: Option[String]) =
    (10L, chid, lineId, 1, d("2020-03-10"), d("2020-03-12"),
      BigDecimal(100).setScale(2), "0450", "23",
      adm.map(d).orNull, dis.map(d).orNull, "01", "1", 1)

  private val lineCols = Seq("id_apcd", "claim_header_id", "claim_line_id",
    "line_counter", "first_service_dt", "last_service_dt", "charge_amt",
    "revenue_code", "place_of_service_code", "admission_dt",
    "discharge_dt", "discharge_status_code",
    "admission_point_of_origin_code", "admission_type")

  test("discharge correction: all four branches of the 2023-07-28 CASE") {
    val lines = Seq(
      // discharge < admission -> last_service
      lineRow(1L, 11L, Some("2020-03-08"), Some("2020-03-01")),
      // NULL admission, discharge < first_service -> last_service
      lineRow(2L, 21L, None, Some("2020-03-05")),
      // NULL admission, discharge >= first_service -> untouched
      lineRow(3L, 31L, None, Some("2020-03-11")),
      // sane discharge -> untouched; NULL discharge -> NULL
      lineRow(4L, 41L, Some("2020-03-09"), Some("2020-03-13")),
      lineRow(4L, 42L, Some("2020-03-09"), None)
    ).toDF(lineCols: _*)
    val out = ApcdClaimDetail.line(lines, headers)
      .select("claim_line_id", "discharge_date")
      .as[(Long, Option[Date])].collect().toMap
    assert(out(11L).contains(d("2020-03-12")))
    assert(out(21L).contains(d("2020-03-12")))
    assert(out(31L).contains(d("2020-03-11")))
    assert(out(41L).contains(d("2020-03-13")))
    assert(out(42L).isEmpty)
  }

  test("denied/orphaned headers and headerless lines are excluded; " +
      "planted duplicates collapse to one row") {
    val lines = Seq(
      lineRow(1L, 11L, None, None),
      lineRow(1L, 11L, None, None), // exact duplicate
      lineRow(5L, 51L, None, None), // denied header
      lineRow(6L, 61L, None, None), // orphaned header
      lineRow(9L, 91L, None, None)  // no header at all
    ).toDF(lineCols: _*)
    val out = ApcdClaimDetail.line(lines, headers)
    assert(out.count() === 1L)
    assert(out.select("claim_line_id").as[Long].head() === 11L)
  }

  test("provider reshape keeps all rows (no exclusion) and renames dates") {
    val prov = Seq(
      (10L, 1L, d("2020-01-01"), d("2020-01-02"), 7L, "RAW7", "rendering"),
      (11L, 5L, d("2020-02-01"), d("2020-02-02"), 8L, "RAW8", "billing"))
      .toDF("id_apcd", "claim_header_id", "first_service_dt",
        "last_service_dt", "provider_id_apcd", "provider_id_raw_apcd",
        "provider_type")
    val out = ApcdClaimDetail.provider(prov)
    assert(out.columns.toSeq === Seq("id_apcd", "claim_header_id",
      "first_service_date", "last_service_date", "provider_id_apcd",
      "provider_id_raw_apcd", "provider_type"))
    // the reference's provider extract has no denied/orphan join: claim 5
    // (denied above) stays
    assert(out.filter(col("claim_header_id") === 5L).count() === 1L)
  }

  test("icdcm and procedure extracts apply the same semi gate") {
    val dx = Seq((10L, 1L, d("2020-01-01"), d("2020-01-02"),
        "F10.9", "F109", 10, "01"),
      (10L, 5L, d("2020-01-01"), d("2020-01-02"), "F10.9", "F109", 10, "01"))
      .toDF("id_apcd", "claim_header_id", "first_service_dt",
        "last_service_dt", "icdcm_raw", "icdcm_norm", "icdcm_version",
        "icdcm_number")
    val prc = Seq((10L, 1L, d("2020-01-01"), d("2020-01-02"), "99213", "26"),
      (10L, 6L, d("2020-01-01"), d("2020-01-02"), "99213", null))
      .toDF("id_apcd", "claim_header_id", "first_service_dt",
        "last_service_dt", "procedure_code", "modifier_code")
    assert(ApcdClaimDetail.icdcm(dx, headers)
      .select("claim_header_id").as[Long].collect().toSeq === Seq(1L))
    assert(ApcdClaimDetail.procedure(prc, headers)
      .select("claim_header_id").as[Long].collect().toSeq === Seq(1L))
  }
}
