package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Event-stream analytics kernels (q273 transitions, q274 funnel):
  * ordering semantics and the strictly-after funnel chain on hand
  * fixtures. */
class EventAnalyticsSpec extends SparkSpec {

  private def ev(rows: Seq[(Long, String, Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("user_id", "event_type", "tsu", "event_id")
  }

  test("funnel: strictly-after chain — a click before the first view " +
      "does not convert; equal timestamps do not convert") {
    val rows = Seq(
      // user 1: clean view -> click -> purchase
      (1L, "view", 10L, 1L), (1L, "click", 20L, 2L),
      (1L, "purchase", 30L, 3L),
      // user 2: click BEFORE its first view — no click conversion
      (2L, "click", 5L, 4L), (2L, "view", 10L, 5L),
      // user 3: click at the SAME micros as the view — strict > fails
      (3L, "view", 10L, 6L), (3L, "click", 10L, 7L),
      // user 4: view+click but purchase precedes the click
      (4L, "view", 1L, 8L), (4L, "purchase", 2L, 9L),
      (4L, "click", 3L, 10L))
    val e = ev(rows)
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("tsu")).as("t1"))
    val c = e.filter(col("event_type") === "click")
      .join(v, Seq("user_id")).filter(col("tsu") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("tsu")).as("t2"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id")).filter(col("tsu") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("tsu")).as("t3"))
    assert(v.count() == 4)
    assert(c.collect().map(_.getLong(0)).toSet == Set(1L, 4L))
    assert(p.collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("transitions: lag ordered by (tsu, event_id), per-source " +
      "fixed-point rows sum to <= 1e6") {
    val rows = Seq(
      (1L, "view", 10L, 1L), (1L, "click", 10L, 2L), // tie -> event_id
      (1L, "view", 30L, 3L),
      (2L, "view", 1L, 4L), (2L, "view", 2L, 5L))
    val e = ev(rows)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("tsu"), col("event_id"))
    val tr = e.withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev").as("from_type"),
        col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val got = tr.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // user1: view->click (ts tie, ordered by event_id), click->view;
    // user2: view->view
    assert(got == Map(("view", "click") -> 1L, ("click", "view") -> 1L,
      ("view", "view") -> 1L), s"got $got")
    val tot = tr.groupBy(col("from_type")).agg(sum(col("n")).as("tot"))
    val probs = tr.join(tot, Seq("from_type"))
      .select(col("from_type"), expr("n * 1000000 div tot").as("p"))
      .collect().groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(1)).sum }
    probs.values.foreach(s => assert(s <= 1000000L && s >= 999998L))
  }
}
