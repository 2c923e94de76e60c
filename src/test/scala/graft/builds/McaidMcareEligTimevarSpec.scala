package graft.builds

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Intervals

/** Hand-computed fixtures for the dual mcaid+mcare timeline merge
  * (load_stage.mcaid_mcare_elig_timevar.R): sweep-line segmentation,
  * deterministic crosswalk-dupe pick, flag battery incl. the R-precedence
  * full_criteria quirk, and the no-coverage drop. */
class McaidMcareEligTimevarSpec extends SparkSpec {

  private def d(s: String) = Date.valueOf(s)

  test("overlaySegments splits a partial overlap into 3 labeled segments") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, d("2020-01-10"), d("2020-02-20"), "A"))
      .toDF("id", "from_d", "to_d", "la")
    val right = Seq((1L, d("2020-02-01"), d("2020-03-15"), "B"))
      .toDF("id", "from_d", "to_d", "rb")
    val got = Intervals.overlaySegments(left, right, "id", "from_d", "to_d")
      .orderBy("from_d")
      .collect().map(r => (r.getAs[Date]("from_d").toString,
        r.getAs[Date]("to_d").toString, r.getAs[String]("la"),
        r.getAs[String]("rb")))
    assert(got.toSeq == Seq(
      ("2020-01-10", "2020-01-31", "A", null),
      ("2020-02-01", "2020-02-20", "A", "B"),
      ("2020-02-21", "2020-03-15", null, "B")))
  }

  test("overlaySegments drops gap segments covered by neither side") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, d("2020-01-01"), d("2020-01-31"), "A"))
      .toDF("id", "from_d", "to_d", "la")
    val right = Seq((1L, d("2020-03-01"), d("2020-03-31"), "B"))
      .toDF("id", "from_d", "to_d", "rb")
    val got = Intervals.overlaySegments(left, right, "id", "from_d", "to_d")
      .orderBy("from_d")
      .collect().map(r => (r.getAs[Date]("from_d").toString,
        r.getAs[Date]("to_d").toString))
    // February (between the two) must NOT appear
    assert(got.toSeq ==
      Seq(("2020-01-01", "2020-01-31"), ("2020-03-01", "2020-03-31")))
  }

  test("dedupPerInterval keeps one deterministic row per (id, from, to)") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, d("2020-01-01"), d("2020-01-31"), "MC", 1),
      (1L, d("2020-01-01"), d("2020-01-31"), "FFS", 0),
      (1L, d("2020-02-01"), d("2020-02-29"), "MC", 1))
      .toDF("id", "from_d", "to_d", "cov_type", "tpl")
    val got = McaidMcareEligTimevar
      .dedupPerInterval(df, "id", "from_d", "to_d")
      .orderBy("from_d").collect()
      .map(r => (r.getAs[String]("cov_type"), r.getAs[Int]("tpl")))
    // nulls-first ascending over (cov_type, tpl): FFS < MC
    assert(got.toSeq == Seq(("FFS", 0), ("MC", 1)))
  }

  private def fixture = {
    val s = spark
    import s.implicits._
    val xwalk = Seq((1L, "M1", "E1"), (2L, "M2", null), (3L, null, "E3"))
      .toDF("id_apde", "id_mcaid", "id_mcare")
    // person 1: mcaid Jan10-Feb20 + mcare Feb1-Mar15 (dual overlap);
    // person 2: mcaid-only Apr; person 3: mcare-only May, plus a
    // no-parts mcare June row that must be dropped (mcare=0, mcaid=0)
    val mcaidTv = Seq(
      ("M1", d("1994-01-10"), d("1994-02-20"), 0, 0, 1, "FFS", "Z0",
        "033"),
      ("M2", d("1996-04-01"), d("1996-04-30"), 0, 1, 1, "MC", "Z1",
        null: String))
      .toDF("id_mcaid", "from_date", "to_date", "dual", "tpl",
        "full_benefit", "cov_type", "geo_zip", "geo_county_code")
    val mcareTv = Seq(
      ("E1", d("1994-02-01"), d("1994-03-15"), 1, 0, 0, 0, 0, "Z3"),
      ("E3", d("1996-05-01"), d("1996-05-31"), 1, 1, 0, 1, 0, "Z2"),
      ("E3", d("1996-06-01"), d("1996-06-30"), 0, 0, 0, 0, 0, "Z2"))
      .toDF("id_mcare", "from_date", "to_date", "part_a", "part_b",
        "part_c", "partial", "buy_in", "geo_zip_mcare")
    McaidMcareEligTimevar.build(xwalk, mcaidTv, mcareTv,
      kcZips = Seq("Z2"), noPartialFrom = "1994-01-01",
      noPartialTo = "1995-12-31")
  }

  test("dual person splits into mcaid/both/mcare rows with right flags") {
    val rows = fixture.filter(col("id_apde") === 1)
      .orderBy("from_date").collect()
    assert(rows.length == 3)
    val seg = rows.map(r => (r.getAs[Date]("from_date").toString,
      r.getAs[Date]("to_date").toString, r.getAs[Int]("mcaid"),
      r.getAs[Int]("mcare"), r.getAs[Int]("apde_dual")))
    assert(seg.toSeq == Seq(
      ("1994-01-10", "1994-01-31", 1, 0, 0),
      ("1994-02-01", "1994-02-20", 1, 1, 1),
      ("1994-02-21", "1994-03-15", 0, 1, 0)))
    // dual promoted to 1 on the both row; stays 0/null elsewhere
    assert(rows.map(_.getAs[Any]("dual")).toSeq == Seq(0, 1, null))
    // contiguous: rows 2 and 3 continue the previous row
    assert(rows.map(_.getAs[Int]("contiguous")).toSeq == Seq(0, 1, 1))
    // zip: mcaid wins on both-row, mcare fills mcare-only row
    assert(rows.map(_.getAs[String]("geo_zip")).toSeq ==
      Seq("Z0", "Z0", "Z3"))
    // full_criteria: mcaid-only row has full_benefit=1,tpl=0,dual=0 -> 1;
    // both/mcare rows have part_a=1 -> 1 (the unconditional partAb
    // disjunct of the R-precedence quirk)
    assert(rows.map(_.getAs[Int]("full_criteria")).toSeq == Seq(1, 1, 1))
  }

  test("no-parts mcare row drops; solo persons keep their intervals") {
    val f = fixture
    // person 3's June interval (part_a=b=c=0 -> mcare=0, no mcaid) drops
    assert(f.filter(col("id_apde") === 3).count() == 1)
    val p3 = f.filter(col("id_apde") === 3).collect()(0)
    // mcaid fills: full_benefit null -> 0; geo_zip from mcare; kc via zip
    assert(p3.getAs[Int]("full_benefit") == 0)
    assert(p3.getAs[String]("geo_zip") == "Z2")
    assert(p3.getAs[Int]("geo_kc") == 1)
    // partial=1, y1114=0 (1996), part_a|b -> full_criteria=1 via the
    // unconditional partAb disjunct (the quirk keeps partial rows in)
    assert(p3.getAs[Int]("full_criteria") == 1)
    val p2 = f.filter(col("id_apde") === 2).collect()(0)
    // mcaid-only with tpl=1: full_benefit criterion fails
    assert(p2.getAs[Int]("full_criteria") == 0)
    assert(p2.getAs[Int]("cov_time_day") == 30)
    // mcare fills on an mcaid-only person
    assert(p2.getAs[Int]("part_a") == 0 && p2.getAs[Int]("buy_in") == 0)
  }
}
