package graft.builds

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** mcare MOUD: the OUD-dx gate, the supply-tier dispatch, and the
  * same-day NDC-over-HCPCS dedup incl. the reference's loose re-join
  * artifact, on hand fixtures. */
class McareClaimMoudSpec extends SparkSpec {

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("dispatch: supply tiers and admin methods per code family") {
    val s = spark
    import s.implicits._
    val proc = Seq(
      (1L, 10L, d("1996-01-01"), "G2070"),  // 180-day injection tier
      (1L, 11L, d("1996-01-02"), "Q9991"),  // 30-day injection
      (1L, 12L, d("1996-01-03"), "G2078"),  // 7-day oral meth
      (1L, 13L, d("1996-01-04"), "G2086"),  // unspec: 0 supply, NULL admin
      (1L, 14L, d("1996-01-05"), "XXXX"))   // not MOUD -> dropped
      .toDF("id_person", "claim_header_id", "last_service_date",
        "procedure_code")
    val got = McareClaimMoud.flagProcEvents(proc)
      .select("procedure_code", "moud_days_supply", "admin_method",
        "meth_proc_flag", "bup_proc_flag", "unspec_proc_flag")
      .collect().map(r => (r.getString(0), r.getInt(1),
        Option(r.getString(2)), r.getInt(3), r.getInt(4), r.getInt(5)))
      .toSet
    assert(got == Set(
      ("G2070", 180, Some("injection/implant"), 0, 1, 0),
      ("Q9991", 30, Some("injection/implant"), 0, 1, 0),
      ("G2078", 7, Some("oral"), 1, 0, 0),
      ("G2086", 0, None, 0, 0, 1)))
  }

  test("OUD gate: H0033 and bup-TBD codes need the primary-dx flag; " +
    "plain codes pass without it") {
    val s = spark
    import s.implicits._
    val proc = Seq(
      (1L, 10L, d("1996-01-01"), "H0033"),  // gated, claim 10 has OUD
      (1L, 11L, d("1996-01-02"), "H0033"),  // gated, claim 11 does NOT
      (1L, 12L, d("1996-01-03"), "96372"),  // bup-TBD, claim 12 no OUD
      (1L, 13L, d("1996-01-04"), "H0020"))  // plain meth, no dx needed
      .toDF("id_person", "claim_header_id", "last_service_date",
        "procedure_code")
    val headers = Seq(
      (10L, "F1120", 10), (11L, "I10", 10), (12L, "I10", 10),
      (13L, "I10", 10))
      .toDF("claim_header_id", "primary_diagnosis", "icdcm_version")
    val oudDx = Seq(("F1120", 10)).toDF("code", "icdcm_version")
    val got = McareClaimMoud.gateByOudDx(
        McareClaimMoud.flagProcEvents(proc), headers, oudDx)
      .select("claim_header_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(10L, 13L))
  }

  test("same-day dedup: hcpcs drops next to a same-(id,date,moudtype) " +
    "dup group — even with a different admin method (loose re-join); " +
    "meth rows never drop") {
    val s = spark
    import s.implicits._
    def row(id: Long, day: String, meth: Option[Int], bup: Option[Int],
        bupRx: Option[Int], admin: String, supply: Double) =
      (id, d(day), meth, bup, Option.empty[Int], Option.empty[Int],
        bupRx, Option.empty[Int], admin, supply)
    val collapsed = Seq(
      // dup group: bup hcpcs + bup ndc, same admin -> hcpcs drops
      row(1L, "1996-01-01", None, Some(1), None, "oral", 7.0),
      row(1L, "1996-01-01", None, None, Some(1), "oral", 30.0),
      // OTHER admin hcpcs bup row same (id, date): ALSO dropped by the
      // loose (id, date, moudtype) re-join — the reference artifact
      row(1L, "1996-01-01", None, Some(1), None, "injection/implant",
        30.0),
      // meth row same day: moudtype NULL, never dropped
      row(1L, "1996-01-01", Some(1), None, None, "oral", 1.0),
      // singleton bup hcpcs on another day: kept
      row(1L, "1996-02-01", None, Some(1), None, "oral", 7.0))
      .toDF("id_person", "last_service_date", "meth_proc_flag",
        "bup_proc_flag", "nal_proc_flag", "unspec_proc_flag",
        "bup_rx_flag", "nal_rx_flag", "admin_method", "moud_days_supply")
    val got = McareClaimMoud.dedupSameDay(collapsed)
      .select("last_service_date", "meth_proc_flag", "bup_proc_flag",
        "bup_rx_flag", "moud_days_supply")
      .collect().map(r => (r.getDate(0).toString, Option(r.get(1)),
        Option(r.get(2)), Option(r.get(3)), r.getDouble(4))).toSet
    assert(got == Set(
      ("1996-01-01", None, None, Some(1), 30.0),   // the ndc fill
      ("1996-01-01", Some(1), None, None, 1.0),    // meth untouched
      ("1996-02-01", None, Some(1), None, 7.0)))   // singleton hcpcs
  }
}
