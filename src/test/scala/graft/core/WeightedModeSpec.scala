package graft.core

import graft.SparkSpec

/** Hand-computed oracles for the signature weighted-mode aggregate
  * (claims_elig.R timevar_gen_sql semantics: max summed weight, ties broken
  * by ascending value). */
class WeightedModeSpec extends SparkSpec {

  test("weightedMode picks max total weight, ties by ascending value") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a", 10.0), (1L, "b", 30.0), (1L, "a", 15.0), // a=25 < b=30 -> b
      (2L, "x", 5.0), (2L, "y", 5.0),                    // tie -> x
      (3L, "q", 1.0)
    ).toDF("id", "v", "w")
    val out = WeightedMode.weightedMode(df, Seq("id"), "v", "w", "modal")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "b"), (2L, "x"), (3L, "q")))
  }

  test("weightedModes (one-pass melt) matches per-column weightedMode") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a", "hi", 10.0), (1L, "b", "lo", 30.0), (1L, "a", "hi", 15.0),
      (2L, "x", "lo", 5.0), (2L, "y", "lo", 5.0), (2L, "y", "hi", 1.0)
    ).toDF("id", "v1", "v2", "w")
    val onePass = WeightedMode.weightedModes(df, Seq("id"), Seq("v1", "v2"), "w")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val perCol = {
      val m1 = WeightedMode.weightedMode(df, Seq("id"), "v1", "w", "v1")
      val m2 = WeightedMode.weightedMode(df, Seq("id"), "v2", "w", "v2")
      m1.join(m2, "id").orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    }
    assert(onePass.toSeq == perCol.toSeq)
    // id 1: v1 a=25<b=30 -> b; v2 hi=25<lo=30 -> lo
    // id 2: v1 x=5<y=6 -> y; v2 lo=10>hi=1 -> lo
    assert(onePass.toSeq == Seq((1L, "b", "lo"), (2L, "y", "lo")))
  }

  test("single-shuffle Aggregator agrees with the two-step weightedMode") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a", 10.0), (1L, "b", 30.0), (1L, "a", 15.0),
      (2L, "x", 5.0), (2L, "y", 5.0),
      (3L, "q", 1.0)
    ).toDF("id", "v", "w")
    val agg = WeightedModeAgg.weightedMode(df, Seq("id"), "v", "w", "modal")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(agg.toSeq == Seq((1L, "b"), (2L, "x"), (3L, "q")))
    // and on the real events table, row for row
    val events = graft.queries.Q.t(spark, sf, "events")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("value"))
    val two = WeightedMode.weightedMode(events, Seq("user_id"),
      "event_type", "value", "m").orderBy("user_id").collect().toSeq
    val one = WeightedModeAgg.weightedMode(events, Seq("user_id"),
      "event_type", "value", "m").orderBy("user_id").collect().toSeq
    assert(one == two)
  }

  test("multi-attribute Aggregator agrees with the melt on real data") {
    import org.apache.spark.sql.functions.col
    val events = graft.queries.Q.t(spark, sf, "events")
      .select(col("user_id"), col("event_type"), col("props"), col("value"))
    val melt = WeightedMode.weightedModes(events, Seq("user_id"),
      Seq("event_type", "props"), "value").orderBy("user_id").collect().toSeq
    val agg = WeightedModeAgg.weightedModes(events, Seq("user_id"),
      Seq("event_type", "props"), "value").orderBy("user_id").collect().toSeq
    assert(agg == melt)
  }

  test("mode with tieBreakDesc prefers higher tie-break, then ascending value") {
    val s = spark
    import s.implicits._
    // counts tie at 2-2 for (a,b); a seen latest at month 6, b at month 4
    val df = Seq(
      (1L, "a", 1), (1L, "a", 6), (1L, "b", 4), (1L, "b", 2),
      (2L, "z", 1), (2L, "z", 2), (2L, "y", 3)
    ).toDF("id", "v", "month")
    val out = WeightedMode.mode(df, Seq("id"), "v", "recent", tieBreakDesc = Seq("month"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "a"), (2L, "z")))
  }
}
