package graft.builds

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StudyExtractSpec extends SparkSpec {
  import spark.implicits._

  private val kc = Seq(("98001", 1)).toDF("geo_zip", "geo_kc")
  private def person(rows: (String, String, String)*) =
    rows.toSeq.toDF("provideroneid", "insurance_start_date", "zip")
      .withColumn("insurance_start_date",
        col("insurance_start_date").cast("date"))
  private def index(rows: (String, String, String)*) =
    rows.toSeq.toDF("provideroneid", "patientid", "birthdate")
      .withColumn("birthdate", col("birthdate").cast("date"))
  private val noChr = Seq.empty[(String, String, String, String)]
    .toDF("patient_id", "date_of_birth", "zip", "record_change_date")
    .select(col("patient_id"),
      col("date_of_birth").cast("date").as("date_of_birth"), col("zip"),
      col("record_change_date").cast("date").as("record_change_date"))

  private def cohortIds(p: org.apache.spark.sql.DataFrame,
      i: org.apache.spark.sql.DataFrame,
      c: org.apache.spark.sql.DataFrame = noChr): Set[String] =
    StudyExtract.kcCohort(p, i, c, kc, "1994-06-01", "1997-12-31")
      .select("patientid").collect().map(_.getString(0)).toSet

  test("in-window KC residence includes; never-KC excludes; the " +
    "was-here-and-moved OR branch includes") {
    val p = person(
      ("A", "1995-01-01", "98001"),      // KC in window
      ("B", "1995-01-01", "97000"),      // never KC
      ("C", "1993-01-01", "98001"),      // KC pre-period...
      ("C", "1995-01-01", "97000"),      // ...then moved -> OR branch
      ("D", "1993-01-01", "98001"))      // KC pre-period only -> excluded
    val i = index(("A", "PTA", "1950-01-01"), ("B", "PTB", "1950-01-01"),
      ("C", "PTC", "1950-01-01"), ("D", "PTD", "1950-01-01"))
    assert(cohortIds(p, i) === Set("PTA", "PTC"))
  }

  test("missing index patientid and under-18-at-study-end exclude; " +
    "leap-day dob clamps like dateadd(year, 18)") {
    val p = person(("A", "1995-01-01", "98001"),
      ("B", "1995-01-01", "98001"), ("C", "1995-01-01", "98001"))
    val i = index(
      ("A", null, "1950-01-01"),         // no patientid
      ("B", "PTB", "1980-06-01"),        // 18 on 1998-06-01 > study end
      ("C", "PTC", "1976-02-29"))        // 18 on 1994-02-28 (clamped)
    val out = StudyExtract.kcCohort(p, i, noChr, kc,
      "1994-06-01", "1997-12-31")
      .collect().map(r => r.getString(1) -> r.getDate(3).toString).toMap
    assert(out.keySet === Set("PTC"))
    assert(out("PTC") === "1994-02-28")
  }

  test("EXCEPT backfill admits CHR-only patients with in-window " +
    "record touch, KC zip and the age gate — with NULL P1 id") {
    val p = person(("A", "1995-01-01", "98001"))
    val i = index(("A", "PTA", "1950-01-01"))
    val chr = Seq(
      ("PTA", "1950-01-01", "98001", "1995-01-01"), // in index -> EXCEPT
      ("PTX", "1950-01-01", "98001", "1995-01-01"), // backfilled
      ("PTY", "1950-01-01", "97000", "1995-01-01"), // non-KC zip
      ("PTZ", "1950-01-01", "98001", "1993-01-01")) // stale record
      .toDF("patient_id", "date_of_birth", "zip", "record_change_date")
      .select(col("patient_id"),
        col("date_of_birth").cast("date").as("date_of_birth"),
        col("zip"),
        col("record_change_date").cast("date").as("record_change_date"))
    val out = StudyExtract.kcCohort(p, i, chr, kc,
      "1994-06-01", "1997-12-31")
      .collect().map(r => Option(r.getString(0)) -> r.getString(1))
      .toSet
    assert(out === Set(Some("A") -> "PTA", None -> "PTX"))
  }

  test("exportClinical gates rows at the 18th birthday and collapses " +
    "duplicates") {
    val cohort = Seq(("A", "PTA", 1, "1995-03-15"))
      .toDF("provideroneid", "patientid", "geo_kc", "dob_18")
      .withColumn("dob_18", col("dob_18").cast("date"))
    val enc = Seq(
      ("PTA", "1995-03-14", "X"),  // day before 18th -> dropped
      ("PTA", "1995-03-15", "X"),  // on the birthday -> kept
      ("PTA", "1995-03-15", "X"),  // duplicate -> collapsed
      ("PTQ", "1995-03-15", "X"))  // not in cohort
      .toDF("patient_id", "service_date", "proc_code")
      .withColumn("service_date", col("service_date").cast("date"))
    val out = StudyExtract.exportClinical(cohort, enc, "patient_id",
        "service_date", Seq("service_date", "proc_code"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString))
    assert(out.toSeq === Seq(("PTA", "1995-03-15")))
  }
}
