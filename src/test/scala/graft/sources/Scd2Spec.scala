package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental SCD-2 merge: every decision branch on a hand fixture,
  * including the NULL-safe attribute compare. */
class Scd2Spec extends SparkSpec {

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("all five branches land the right rows") {
    val s = spark
    import s.implicits._
    val dim = Seq(
      // closed history passes through
      (1L, Some("a"), d("1995-01-01"), Option(d("1996-12-31"))),
      // open rows
      (1L, Some("b"), d("1997-01-01"), None),   // delta changes -> version
      (2L, Some("x"), d("1997-01-01"), None),   // delta equal -> keep
      (3L, Some("y"), d("1997-01-01"), None),   // no delta -> keep
      (4L, None, d("1997-01-01"), None))        // NULL attr, delta NULL ->
      .toDF("id", "seg", "from_date", "to_date") // keep (null-safe eq)
    val delta = Seq(
      (1L, Some("c")), (2L, Some("x")), (4L, None),
      (9L, Some("n"))) // unknown id -> insert
      .toDF("id", "seg")
      .withColumn("eff_date", lit(d("1998-06-01")))
    val got = Scd2.merge(dim, delta, "id", Seq("seg"), "eff_date")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getDate(2).toString,
        Option(r.getDate(3)).map(_.toString))).toSet
    assert(got == Set(
      (1L, Some("a"), "1995-01-01", Some("1996-12-31")), // history
      (1L, Some("b"), "1997-01-01", Some("1998-05-31")), // closed at eff-1
      (1L, Some("c"), "1998-06-01", None),               // new version
      (2L, Some("x"), "1997-01-01", None),               // equal: kept
      (3L, Some("y"), "1997-01-01", None),               // absent: kept
      (4L, None, "1997-01-01", None),                    // null==null kept
      (9L, Some("n"), "1998-06-01", None)))              // inserted
  }

  test("multi-version delta collapses to latest-per-id — never two open rows") {
    val s = spark
    import s.implicits._
    val dim = Seq((1L, Some("a"), d("1997-01-01"),
        Option.empty[java.sql.Date]))
      .toDF("id", "seg", "from_date", "to_date")
    // two versions of id 1 in ONE batch: only the latest (eff max)
    // versions; the intermediate state was never open at a boundary
    val delta = Seq(
      (1L, Some("b"), d("1998-03-01")),
      (1L, Some("c"), d("1998-06-01")))
      .toDF("id", "seg", "eff_date")
    val got = Scd2.merge(dim, delta, "id", Seq("seg"), "eff_date")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getDate(2).toString,
        Option(r.getDate(3)).map(_.toString))).toSet
    assert(got == Set(
      (1L, Some("a"), "1997-01-01", Some("1998-05-31")),
      (1L, Some("c"), "1998-06-01", None)))
    // exactly one open row
    assert(Scd2.merge(dim, delta, "id", Seq("seg"), "eff_date")
      .filter(col("to_date").isNull).count() == 1L)
  }

  test("NULL-to-value and value-to-NULL both count as changes") {
    val s = spark
    import s.implicits._
    val dim = Seq(
      (1L, Option.empty[String], d("1997-01-01"), Option.empty[java.sql.Date]),
      (2L, Some("v"), d("1997-01-01"), Option.empty[java.sql.Date]))
      .toDF("id", "seg", "from_date", "to_date")
    val delta = Seq((1L, Some("v")), (2L, Option.empty[String]))
      .toDF("id", "seg")
      .withColumn("eff_date", lit(d("1998-06-01")))
    val got = Scd2.merge(dim, delta, "id", Seq("seg"), "eff_date")
    assert(got.count() == 4) // both ids versioned: close + reopen each
    assert(got.filter(col("to_date").isNotNull).count() == 2)
  }
}
