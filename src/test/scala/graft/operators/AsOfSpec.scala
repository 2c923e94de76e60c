package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Merge-sorted as-of join: inclusivity, tie-breaks, missing-version
  * NULLs, and the no-join plan shape. */
class AsOfSpec extends SparkSpec {

  private def d(s: String) = java.sql.Date.valueOf(s)

  private def fixture = {
    val s = spark
    import s.implicits._
    val quotes = Seq(
      (1L, d("1996-01-01"), 10L, 100.0),
      (1L, d("1996-02-01"), 11L, 110.0),
      (1L, d("1996-02-01"), 12L, 120.0), // same-day tie: higher key wins
      (2L, d("1996-06-01"), 20L, 200.0))
      .toDF("key", "qdate", "qkey", "qprice")
    val lookups = Seq(
      (101L, 1L, d("1996-01-15")), // between versions -> Jan 1 quote
      (102L, 1L, d("1996-02-01")), // AT a version date -> inclusive, tie
      (103L, 1L, d("1999-01-01")), // far future -> latest
      (104L, 2L, d("1996-01-01")), // before any version -> NULLs
      (105L, 3L, d("1996-01-01"))) // unseen key -> NULLs
      .toDF("lookup_id", "key", "ldate")
    (lookups, quotes)
  }

  test("latest-at-or-before semantics with tie-break and NULL misses") {
    val (lookups, quotes) = fixture
    val got = AsOf.joinLatest(lookups, quotes, "key", "ldate", "qdate",
        "qkey", Seq("qkey", "qprice"))
      .select("lookup_id", "qkey", "qprice")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
      .toSet
    assert(got == Set(
      (101L, Some(10L), Some(100.0)),
      (102L, Some(12L), Some(120.0)), // inclusive + same-day tie to 12
      (103L, Some(12L), Some(120.0)),
      (104L, None, None),
      (105L, None, None)))
  }

  test("NULL field in the latest version stays NULL — no cross-version mixing") {
    val s = spark
    import s.implicits._
    val quotes = Seq(
      (1L, d("1996-01-01"), Option(10L), Option(100.0)),
      // latest version has a NULL qprice: the event must carry
      // (11, NULL), NOT (11, 100.0) inherited from the older version
      (1L, d("1996-02-01"), Option(11L), Option.empty[Double]))
      .toDF("key", "qdate", "qkey", "qprice")
    val lookups = Seq((201L, 1L, d("1996-03-01")))
      .toDF("lookup_id", "key", "ldate")
    val got = AsOf.joinLatest(lookups, quotes, "key", "ldate", "qdate",
        "qkey", Seq("qkey", "qprice"))
      .select("lookup_id", "qkey", "qprice")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
      .toSet
    assert(got == Set((201L, Some(11L), None)))
  }

  test("the plan contains no join at all — one shuffle, one sort") {
    val (lookups, quotes) = fixture
    val plan = AsOf.joinLatest(lookups, quotes, "key", "ldate", "qdate",
        "qkey", Seq("qprice"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in as-of plan:\n$plan")
    assert(plan.contains("Window"))
  }
}
