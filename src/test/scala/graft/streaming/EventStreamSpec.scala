package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.Q

/** Streaming vs batch equivalence: the append-mode hourly rollup must equal
  * the batch aggregation restricted to watermark-finalized windows — the
  * same cutoff the q48 oracle SQL applies. */
class EventStreamSpec extends SparkSpec {

  test("append-mode hourly rollup equals batch agg on finalized windows") {
    val events = Q.t(spark, sf, "events")
    val cutoff = EventStream.emittedBefore(events)
    val batch = events
      .groupBy(date_trunc("hour", col("ts")).as("hour_ts"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("val"))
      .filter(col("hour_ts") + expr("interval 1 hour") <= lit(cutoff))
      .select(col("event_type"), col("hour_ts").cast("timestamp"),
        col("n"), col("val"))
      .orderBy("event_type", "hour_ts")
      .collect().map(_.toString)
    val streamed = EventStream.hourlyRollup(spark, sf, "spec_stream")
      .orderBy("event_type", "hour_ts")
      .collect().map(_.toString)
    assert(streamed.length == batch.length,
      s"streamed ${streamed.length} vs batch ${batch.length} windows")
    assert(streamed.toSeq == batch.toSeq)
  }
}
