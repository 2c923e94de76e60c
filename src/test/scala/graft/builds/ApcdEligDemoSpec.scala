package graft.builds

import java.sql.Date
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** APCD elig_demo: hand-computed DOB estimation (contiguous-month age
  * change incl. the Dec→Jan `89` branch, single-age fallback), gender
  * recodes, and race rollup (load_stage.apcd_elig_demo.R). */
class ApcdEligDemoSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  private val ethMap = Seq((6, 8), (2, 2)).toDF("ethnicity_id", "race_id")

  private def demoRow(mm: Seq[(Long, String, Int, String)],
      elig: Seq[(Long, Long, Date, Int, Int, Int, Int, Int)] = Nil) = {
    val mmDf = mm.toDF("id_apcd", "year_month", "age", "gender_code")
    val eligDf = elig.toDF("eligibility_id", "id_apcd",
      "eligibility_end_dt", "race_id1", "race_id2", "hispanic_id",
      "ethnicity_id1", "ethnicity_id2")
    ApcdEligDemo.build(mmDf, eligDf, ethMap).collect()
      .map(r => r.getAs[Long]("id_apcd") -> r).toMap
  }

  test("dob_1: age increment across contiguous months pins the birthday " +
      "month, including the Dec->Jan 89-diff branch") {
    val out = demoRow(Seq(
      // person 1: 39 in 2020-02, 40 in 2020-03 (contiguous) -> dob
      // 1980-03-01 (ym 202003 - 40*100)
      (1L, "202002", 39, "F"), (1L, "202003", 40, "F"),
      // person 2: Dec->Jan year boundary: 49 in 2020-12, 50 in 2021-01
      // (diff 89) -> dob 1971-01-01
      (2L, "202012", 49, "M"), (2L, "202101", 50, "M"),
      // person 3: same increment but a GAP (202001 -> 202003): dob_1
      // must NOT fire; falls back to dob_2 from the last row:
      // 202003 - 41*100 = 197903, +1 month -> 1979-04-01
      (3L, "202001", 39, "M"), (3L, "202003", 40, "M")))
    assert(out(1L).getAs[Date]("dob") === d("1980-03-01"))
    assert(out(2L).getAs[Date]("dob") === d("1971-01-01"))
    assert(out(3L).getAs[Date]("dob") === d("1979-04-01"))
  }

  test("dob_2 single-month fallback and ninety_only top-code") {
    val out = demoRow(Seq(
      // single month 2020-06, age 30 -> 202006 - 3100 = 198906 + 1 month
      (1L, "202006", 30, "F"),
      (2L, "202001", 90, "U"), (2L, "202002", 90, "U")))
    assert(out(1L).getAs[Date]("dob") === d("1989-07-01"))
    assert(out(1L).getAs[Int]("ninety_only") === 0)
    assert(out(2L).getAs[Int]("ninety_only") === 1)
  }

  test("gender: Multiple when both seen, recent ignores U/NULL months, " +
      "all-unknown person resolves to Unknown deterministically") {
    val out = demoRow(Seq(
      (1L, "202001", 40, "F"), (1L, "202002", 40, "M"),
      (1L, "202003", 40, "U"),
      (2L, "202001", 40, "U"), (2L, "202002", 40, null)))
    val p1 = out(1L)
    assert(p1.getAs[String]("gender_me") === "Multiple")
    // recent = gender at max non-U month (202002 -> M)
    assert(p1.getAs[String]("gender_recent") === "Male")
    assert(p1.getAs[Int]("gender_female") === 1)
    assert(p1.getAs[Int]("gender_male") === 1)
    val p2 = out(2L)
    // min(gender_unk) over (U -> 1, NULL -> 0) = 0: me stays NULL (the
    // reference's CASE falls through); recent tie-break picks 'U'
    assert(p2.getAs[String]("gender_me") === null)
    assert(p2.getAs[String]("gender_recent") === "Unknown")
  }

  test("race: latino via ethnicity map, z_Multiple unmask on recent, " +
      "Multiple recomputed at person level ignoring Unknown rows") {
    val mm = Seq((1L, "202001", 40, "F"), (2L, "202001", 40, "F"))
    val out = demoRow(mm, Seq(
      // person 1, row A (end 2020-01-01): white only
      (11L, 1L, d("2020-01-01"), 5, 0, 2, 0, 0),
      // person 1, row B (end 2020-06-01): ethnicity 6 -> race 8 = latino
      (12L, 1L, d("2020-06-01"), 0, 0, 0, 6, 0),
      // person 2: single unknown row (race ids out of domain)
      (21L, 2L, d("2020-01-01"), 7, 8, 3, 10, 11)))
    val p1 = out(1L)
    // flags maxed: white + latino -> eth-inclusive Multiple, but race_me
    // (latino excluded) stays White
    assert(p1.getAs[String]("race_eth_me") === "Multiple")
    assert(p1.getAs[String]("race_me") === "White")
    // recent = row with max end_dt (the latino row)
    assert(p1.getAs[String]("race_eth_recent") === "Latino")
    // race_me for the latino-only row falls to the ELSE 'Unknown'; the
    // white row (earlier) sorts before it on end_dt, so race_recent =
    // the latino row's race_me = Unknown
    assert(p1.getAs[String]("race_recent") === "Unknown")
    assert(p1.getAs[Int]("race_latino") === 1)
    assert(p1.getAs[Int]("race_white") === 1)
    assert(p1.getAs[Int]("race_unknown") === 0)
    val p2 = out(2L)
    assert(p2.getAs[String]("race_eth_me") === null) // max of NULL-masked
    assert(p2.getAs[String]("race_eth_recent") === "Unknown")
    assert(p2.getAs[Int]("race_unknown") === 1)
  }

  test("member-month persons with no eligibility rows keep NULL race") {
    val out = demoRow(Seq((9L, "202001", 20, "F")))
    val p = out(9L)
    assert(p.getAs[String]("race_eth_me") === null)
    assert(p.isNullAt(p.fieldIndex("race_aian")))
  }
}
