package graft.builds

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the mcaid_elig staging semantics: the three duplicate-type
  * repairs, the probe diagnostics, and the merge's post-distinct
  * upper-case artifact. */
class McaidEligStageSpec extends SparkSpec {
  import spark.implicits._

  // minimal column set: the dedup key + the three discriminators + one
  // carried attribute + the vars tail
  private val vars = Seq("CLNDR_YEAR_MNTH", "MBR_H_SID",
    "MEDICAID_RECIPIENT_ID", "RAC_CODE", "RAC_NAME", "RAC_FROM_DATE",
    "RAC_TO_DATE", "END_REASON_NAME", "DUALELIGIBLE_INDICATOR",
    "RSDNTL_ADRS_LINE_1", "RSDNTL_ADRS_LINE_2", "RSDNTL_CITY_NAME",
    "RSDNTL_STATE_CODE", "RSDNTL_POSTAL_CODE", "geo_hash_raw",
    "MBR_ACES_IDNTFR", "etl_batch_id")
  private val varsDedup = vars.filterNot(_ == "geo_hash_raw")

  private val d = (s: String) => java.sql.Date.valueOf(s)

  private def raw(rows: (Int, String, String, String, String, String)*) =
    // (month, id, rac_name, end_reason, hoh, dual)
    rows.map { case (m, id, rac, er, hoh, dual) =>
      (m, "S1", id, 7, rac, d("1995-01-01"), d("1995-01-31"), er, dual,
        hoh, "1 A ST", null.asInstanceOf[String], "SEA", "WA", "98101",
        "A1", 2)
    }.toDF("CLNDR_YEAR_MNTH", "MBR_H_SID", "MEDICAID_RECIPIENT_ID",
      "RAC_CODE", "RAC_NAME", "RAC_FROM_DATE", "RAC_TO_DATE",
      "END_REASON_NAME", "DUALELIGIBLE_INDICATOR", "HOH_ID",
      "RSDNTL_ADRS_LINE_1", "RSDNTL_ADRS_LINE_2", "RSDNTL_CITY_NAME",
      "RSDNTL_STATE_CODE", "RSDNTL_POSTAL_CODE", "MBR_ACES_IDNTFR",
      "etl_batch_id")

  test("dedup fixes all three duplicate families") {
    val rows = raw(
      // type 1: two END_REASONs -> max score wins ('Aged out' = 7 beats
      // 'Other' = 2)
      (199501, "ID1", "RAC A", "Aged out", "H1", "0"),
      (199501, "ID1", "RAC A", "Other", "H1", "0"),
      // type 2: HOH differs only -> vanishes in the projection
      (199502, "ID1", "RAC A", "Aged out", "H1", "0"),
      (199502, "ID1", "RAC A", "Aged out", null, "0"),
      // type 3: misspelled RAC folds onto the correct row
      (199503, "ID1", McaidEligStage.RacCorrect, "Aged out", "H1", "0"),
      (199503, "ID1", McaidEligStage.RacMisspelled, "Aged out", "H1", "0"))
    val out = McaidEligStage.dedup(rows, varsDedup)
    assert(out.count() == 3)
    val byMonth = out.collect().map(r =>
      r.getAs[Int]("CLNDR_YEAR_MNTH") ->
        (r.getAs[String]("RAC_NAME"), r.getAs[String]("END_REASON_NAME")))
      .toMap
    assert(byMonth(199501)._2 == "Aged out")
    assert(byMonth(199503)._1 == McaidEligStage.RacCorrect)
  }

  test("dedup: NULL end reason has LOWEST priority, ties both survive") {
    val rows = raw(
      (199501, "ID1", "RAC A", null, "H1", "0"),
      (199501, "ID1", "RAC A", "Review Not Complete", "H1", "0"),
      // tie at ELSE=7: both rows survive the score filter AND the
      // distinct (different END_REASON values)
      (199502, "ID1", "RAC A", "Moved", "H1", "0"),
      (199502, "ID1", "RAC A", "Aged out", "H1", "0"))
    val out = McaidEligStage.dedup(rows, varsDedup).collect()
    val m1 = out.filter(_.getAs[Int]("CLNDR_YEAR_MNTH") == 199501)
    assert(m1.map(_.getAs[String]("END_REASON_NAME")).toSeq ==
      Seq("Review Not Complete"))
    val m2 = out.filter(_.getAs[Int]("CLNDR_YEAR_MNTH") == 199502)
    assert(m2.map(_.getAs[String]("END_REASON_NAME")).toSet ==
      Set("Moved", "Aged out"))
  }

  test("duplicateProbes flags exactly the present family") {
    val rows = raw(
      (199501, "ID1", "RAC A", "Aged out", "H1", "0"),
      (199501, "ID1", "RAC A", "Other", "H1", "0"))
    val probes = McaidEligStage.duplicateProbes(rows).collect()
      .map(r => r.getAs[String]("probe") -> r.getAs[Int]("dup_present"))
      .toMap
    // an END_REASON dup is visible ONLY to the projection that drops
    // END_REASON (the end_reason probe); the hoh/rac projections keep
    // it and so count both rows as distinct
    assert(probes == Map("end_reason" -> 1, "hoh_id" -> 0,
      "rac_name" -> 0))
  }

  test("stage: archive-before-cut merge + post-distinct uppercase artifact") {
    val incoming = raw(
      (199506, "id1", "RAC A", "Aged out", "H1", "0"),
      (199506, "ID1", "RAC A", "Aged out", "H1", "0"))
      .drop("HOH_ID")
    val archive = raw(
      (199501, "old1", "RAC A", "Aged out", "H1", "0"), // kept: < cut
      (199507, "old2", "RAC A", "Aged out", "H1", "0")) // dropped: >= cut
      .drop("HOH_ID")
      .withColumn("geo_hash_raw", McaidEligStage.geoHashRaw)
      .select(vars.map(col): _*)
    val out = McaidEligStage.stage(incoming, archive, vars,
      "CLNDR_YEAR_MNTH")
    val ids = out.collect().map(r =>
      (r.getAs[Int]("CLNDR_YEAR_MNTH"),
        r.getAs[String]("MEDICAID_RECIPIENT_ID")))
    // 'id1'/'ID1' differ pre-distinct, so BOTH survive the union
    // distinct and only then upper-case into two identical rows —
    // the reference's UPDATE-after-INSERT artifact
    assert(ids.count(_ == (199506, "ID1")) == 2)
    assert(ids.contains((199501, "OLD1")))
    assert(!ids.exists(_._1 == 199507))
  }
}
