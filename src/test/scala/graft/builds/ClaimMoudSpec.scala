package graft.builds

import java.sql.Date
import graft.SparkSpec

/** Hand-computed fixtures for the MOUD kernels: H0033 monthly-context
  * disambiguation and the next-service-date methadone supply with
  * quarter-median fallbacks. */
class ClaimMoudSpec extends SparkSpec {

  private def d(s: String) = Date.valueOf(s)

  test("H0033 resolves from the person-month proc/rx context") {
    val s = spark
    import s.implicits._
    val proc = Seq(
      // person 1, Jan: meth-dominant month (2 meth, 1 bup) -> H0033 = meth
      (1L, d("2020-01-05"), "H0033"),
      (1L, d("2020-01-10"), "H0020"),
      (1L, d("2020-01-15"), "S0109"),
      (1L, d("2020-01-20"), "J0571"),
      // person 1, Feb: bup-dominant (0 meth, 1 bup) -> H0033 = bup
      (1L, d("2020-02-05"), "H0033"),
      (1L, d("2020-02-10"), "J0571"),
      // person 2, Mar: no proc evidence, but an rx fill -> H0033 = bup
      (2L, d("2020-03-05"), "H0033"),
      // person 3, Apr: no evidence at all -> H0033 = meth
      (3L, d("2020-04-05"), "H0033")
    ).toDF("id_person", "service_date", "procedure_code")
    val rx = Seq((2L, d("2020-03-07"), 1))
      .toDF("id_person", "service_date", "bup_rx_flag")
    val out = ClaimMoud.disambiguateH0033(ClaimMoud.flagEvents(proc), rx)
      .filter($"procedure_code" === "H0033")
      .select("id_person", "service_date", "meth_proc_flag", "bup_proc_flag")
      .as[(Long, Date, Int, Int)].collect().toSet
    assert(out === Set(
      (1L, d("2020-01-05"), 1, 0),
      (1L, d("2020-02-05"), 0, 1),
      (2L, d("2020-03-05"), 0, 1),
      (3L, d("2020-04-05"), 1, 0)))
  }

  test("methadone supply: next-gap baseline, median fallbacks, low-count") {
    val s = spark
    import s.implicits._
    // person 1, 2020 Q1: meth on Jan 1, 2, 3, 10, 30 -> gaps 1,1,7,20 and
    // null for the last. median = 4.0. 20 > 1.5*4 -> skipped-dose -> 4.0;
    // last date (null next) -> 4.0. supply_new = 1 + 1 + 4 + 4 + 4? No:
    // gaps sorted (1,1,7,20): median = (1+7)/2 = 4.0. Rows: gap1->1,
    // gap1->1, gap7 (7 <= 6? 1.5*4=6 -> 7 > 6 -> median 4.0), gap20->4.0,
    // null->4.0. total = 1+1+4+4+4 = 14.0
    val daily = Seq(
      (1L, d("2020-01-01"), 1, 0, 0, 0, 1L),
      (1L, d("2020-01-02"), 1, 0, 0, 0, 1L),
      (1L, d("2020-01-03"), 1, 0, 0, 0, 1L),
      (1L, d("2020-01-10"), 1, 0, 0, 0, 1L),
      (1L, d("2020-01-30"), 1, 0, 0, 0, 1L),
      // person 2: only 2 meth dates in the quarter -> low-count keeps
      // the nominal supply (7 each)
      (2L, d("2020-01-01"), 1, 0, 0, 0, 7L),
      (2L, d("2020-02-01"), 1, 0, 0, 0, 7L),
      // person 2: a non-meth day keeps its nominal supply untouched
      (2L, d("2020-02-15"), 0, 1, 0, 0, 30L)
    ).toDF("id_person", "service_date", "meth_proc_flag", "bup_proc_flag",
      "nal_proc_flag", "unspec_proc_flag", "moud_days_supply")
    val out = ClaimMoud.methDaysSupply(daily)
      .select("id_person", "service_date", "moud_days_supply_new")
      .as[(Long, Date, Double)].collect().toMap2
    assert(out((1L, d("2020-01-01"))) === 1.0)
    assert(out((1L, d("2020-01-02"))) === 1.0)
    assert(out((1L, d("2020-01-03"))) === 4.0)
    assert(out((1L, d("2020-01-10"))) === 4.0)
    assert(out((1L, d("2020-01-30"))) === 4.0)
    assert(out((2L, d("2020-01-01"))) === 7.0)
    assert(out((2L, d("2020-02-01"))) === 7.0)
    assert(out((2L, d("2020-02-15"))) === 30.0)
  }

  implicit class Tuple3Ops(rows: Array[(Long, Date, Double)]) {
    def toMap2: Map[(Long, Date), Double] =
      rows.map(r => (r._1, r._2) -> r._3).toMap
  }
}
