package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the sp_mcaidcohort / sp_mcaid_claims_* quirks on planted rows
  * (the catalog oracles q192/q193 pin the full composition). */
class McaidCohortSpec extends SparkSpec {
  import McaidCohort._

  test("splitCsv: dbo.Split drops empty and all-blank slices, keeps " +
    "order, duplicates and embedded spaces") {
    assert(splitCsv("a,,b, ,c") === Seq("a", "b", "c"))
    assert(splitCsv(" x,y ,x") === Seq(" x", "y ", "x"))
    assert(splitCsv(",,") === Seq.empty)
    assert(splitCsv("solo") === Seq("solo"))
  }

  test("csvToTable: the CSVToTable sibling's quirks DIFFER from " +
    "dbo.Split — one-pass ',,' fold, empties survive odd comma runs, " +
    "blanks and duplicates kept (hand-walked against the T-SQL loop)") {
    assert(csvToTable("1,2,3") === Seq("1", "2", "3"))
    // 'a,,b' + ',' = 'a,,b,' -> fold 'a,b,' -> [a, b]
    assert(csvToTable("a,,b") === Seq("a", "b"))
    // 'x,,,y' + ',' = 'x,,,y,' -> ONE non-overlapping pass leaves
    // 'x,,y,' -> [x, '', y] — the half-collapsed run
    assert(csvToTable("x,,,y") === Seq("x", "", "y"))
    // '' + ',' = ',' -> one empty value (LEFT(str, 0) inserted)
    assert(csvToTable("") === Seq(""))
    // ',' + ',' = ',,' -> fold ',' -> one empty value
    assert(csvToTable(",") === Seq(""))
    assert(csvToTable("solo") === Seq("solo"))
    // trailing comma does NOT add a value (the appended comma folds)
    assert(csvToTable("t1,t2,") === Seq("t1", "t2"))
    // duplicates and blanks kept (unlike splitCsv's all-blank drop)
    assert(csvToTable("d, ,d") === Seq("d", " ", "d"))
  }

  test("splitItems: the Column twin agrees with splitCsv") {
    import spark.implicits._
    val rows = Seq("a,,b, ,c", ",,", "d,d,").toDF("csv")
      .select(col("csv"), splitItems(col("csv"), ",").as("items"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(rows("a,,b, ,c") === Seq("a", "b", "c"))
    assert(rows(",,") === Seq.empty)
    assert(rows("d,d,") === Seq("d", "d"))
  }

  private def frames = {
    import spark.implicits._
    // p1: covered most of the window, nondual, age 30
    // p2: single mid-window interval (boundary-gap -1 quirk), dual
    // p3: newborn (dob inside the window -> age -1 -> 0 branch)
    // p4: no coverage overlapping the window (never in ##id)
    val elig = Seq(
      ("p1", "1995-01-01", "1995-06-30"),
      ("p1", "1995-08-01", "1995-12-31"),
      ("p2", "1995-03-11", "1995-03-20"),
      ("p3", "1995-01-01", "1995-12-31"),
      ("p4", "1994-01-01", "1994-12-31"))
      .toDF("id", "from_date", "to_date")
      .select(col("id"), col("from_date").cast("date").as("from_date"),
        col("to_date").cast("date").as("to_date"))
    val demo = Seq(
      ("p1", "1965-06-15", "ENGLISH"),
      ("p2", "1950-01-01", "ENGLISH"),
      ("p3", "1996-01-15", "ENGLISH"),
      ("p4", "1980-01-01", "ENGLISH"))
      .toDF("id", "dobnew", "maxlang")
      .select(col("id"), col("dobnew").cast("date").as("dobnew"),
        col("maxlang"),
        lit(1).as("male"), lit(0).as("female"))
    // p1: two zips, equal clipped days -> sum+1 tie, lower zip wins
    val addr = Seq(
      ("p1", 98001, 1, 11, "1995-01-01", "1995-03-01"),
      ("p1", 98002, 1, 11, "1995-05-01", "1995-06-30"),
      ("p2", 98003, 2, 22, "1995-01-01", "1995-12-31"),
      ("p3", 98001, 1, 11, "1995-01-01", "1995-12-31"))
      .toDF("id", "zip_new", "hra_id", "tractce10", "from_date", "to_date")
      .select(col("id"), col("zip_new"), col("hra_id"), col("tractce10"),
        col("from_date").cast("date").as("from_date"),
        col("to_date").cast("date").as("to_date"))
    val covgrp = Seq(
      ("p1", "N", "1995-01-01", "1995-12-31"),
      ("p2", "Y", "1995-03-11", "1995-03-20"),
      ("p3", "N", "1995-01-01", "1995-12-31"))
      .toDF("id", "dual", "from_date", "to_date")
      .select(col("id"), col("dual"),
        col("from_date").cast("date").as("from_date"),
        col("to_date").cast("date").as("to_date"))
    val hra = Seq((1, "HRA 1", 0, "Region 0"), (2, "HRA 2", 1, "Region 1"))
      .toDF("hra_id", "hra", "region_id", "region")
    (elig, demo, addr, covgrp, hra)
  }

  test("cohort: boundary-gap -1 quirk, newborn age 0, equal-dur modal " +
    "tie to the lower zip, dual classification") {
    val (elig, demo, addr, covgrp, hra) = frames
    val out = cohort(elig, demo, addr, covgrp, hra,
      CohortParams("1995-01-01", "1995-12-31"))
      .select("id", "covd", "covgap_max", "age", "zip_new", "dual_flag",
        "cov_cohort")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getInt(2), r.getInt(3), r.getString(4),
          r.getInt(5), r.getString(6))).toMap
    // p1: 181 + 153 days, interior gap Jul 1..31 = 31 days
    assert(out("p1")._1 === 334L)
    assert(out("p1")._2 === 31)
    // equal 60/61-day zips? 98001 clip = Jan1..Mar1 = 60d, 98002
    // May1..Jun30 = 61d -> 98002 wins on dur, no tie here; the tie
    // case is asserted below
    assert(out("p1")._6 === "large gap, nondual")
    // p2: single 10-day island; sproc pregap = datediff(@from, from)-1
    //     = 69-1 = 68; postgap = datediff(to, @to)-1 = 286-1 = 285
    assert(out("p2")._2 === 285)
    assert(out("p2")._5 === 1) // 10 dual days
    assert(out("p2")._6 === "large gap, dual")
    // p3: dob AFTER the window end -> floor((datediff+1)/365.25) = -1
    //     -> the sproc's newborn branch returns 0
    assert(out("p3")._3 === 0)
    assert(!out.contains("p4"))
  }

  test("cohort: modal pick breaks an exact dur tie to the lower zip") {
    import spark.implicits._
    val (elig, demo, _, covgrp, hra) = frames
    val addr = Seq(
      ("p1", 98007, 1, 11, "1995-01-01", "1995-01-10"),
      ("p1", 98004, 1, 11, "1995-02-01", "1995-02-10"))
      .toDF("id", "zip_new", "hra_id", "tractce10", "from_date", "to_date")
      .select(col("id"), col("zip_new"), col("hra_id"), col("tractce10"),
        col("from_date").cast("date").as("from_date"),
        col("to_date").cast("date").as("to_date"))
    val out = cohort(elig, demo, addr, covgrp, hra,
      CohortParams("1995-01-01", "1995-12-31"))
      .select("id", "zip_new").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("p1") === "98004")
  }

  test("cohort: flag and Split-list filters bite") {
    val (elig, demo, addr, covgrp, hra) = frames
    val base = CohortParams("1995-01-01", "1995-12-31")
    assert(cohort(elig, demo, addr, covgrp, hra,
      base.copy(flagFilters = Map("female" -> 1))).count() === 0)
    val zips = cohort(elig, demo, addr, covgrp, hra,
      base.copy(zip = Some("98003,,98009")))
      .select("id").collect().map(_.getString(0)).toSet
    assert(zips === Set("p2"))
    assert(cohort(elig, demo, addr, covgrp, hra,
      base.copy(id = Some("p2, ,"))).select("id")
      .collect().map(_.getString(0)).toSet === Set("p2"))
  }

  test("claimsSummary: (id, from_date) dedup, zero-fill vs no_claims, " +
    "dental from clm_type '4', detail = same kernel on a wider list") {
    import spark.implicits._
    val (elig, demo, addr, covgrp, hra) = frames
    val cohortDf = cohort(elig, demo, addr, covgrp, hra,
      CohortParams("1995-01-01", "1995-12-31"))
    val ids = idsInWindow(elig, CohortParams("1995-01-01", "1995-12-31"))
    val claims = Seq(
      // p1: two ED claims the SAME day (dedup to 1) + one other day
      ("p1", "t1", "1995-02-01", 1, 0, "1"),
      ("p1", "t2", "1995-02-01", 1, 0, "1"),
      ("p1", "t3", "1995-04-01", 1, 1, "4"),
      // p2: one claim, every flag 0 -> counted day, zero cnts
      ("p2", "t4", "1995-03-12", 0, 0, "1"),
      // p3: claim outside the window -> ignored
      ("p3", "t5", "1996-02-01", 1, 1, "1"))
      .toDF("id", "tcn", "from_date", "ed", "inpatient", "clm_type_code")
      .select(col("id"), col("tcn"),
        col("from_date").cast("date").as("from_date"),
        col("ed"), col("inpatient"), col("clm_type_code"))
    val out = claimsSummary(cohortDf, ids, claims, Seq("ed", "inpatient"),
      "1995-01-01", "1995-12-31")
      .select("id", "ed_cnt", "inpatient_cnt", "dental_cnt", "no_claims")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    assert(out("p1") === ((2L, 1L, 1L, 0)))
    assert(out("p2") === ((0L, 0L, 0L, 0)))
    assert(out("p3") === ((0L, 0L, 0L, 1)))
    // detail sproc: the identical kernel with more flag columns
    val detail = claimsSummary(cohortDf, ids,
      claims.withColumn("ipt_bh", lit(0)),
      Seq("ed", "inpatient", "ipt_bh"), "1995-01-01", "1995-12-31")
    assert(detail.columns.contains("ipt_bh_cnt"))
    assert(detail.filter(col("id") === "p1").head.getAs[Long]("ed_cnt")
      === 2L)
  }
}
