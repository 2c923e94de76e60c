package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming surface: the reference's closest analog is the
  * monthly incremental refresh (SURVEY §1.5) — here generalized to a real
  * stream pipeline: file source -> event-time windowed aggregation ->
  * sink. Locally driven to completion with Trigger.AvailableNow semantics
  * via processAllAvailable on a memory sink. */
object EventStream {

  /** Tumbling 1-hour event-time aggregation of the events table, executed
    * through the streaming engine (readStream -> window agg -> memory
    * sink), returned as the final batch result. */
  def hourlyRollup(s: SparkSession, dir: String, name: String): DataFrame = {
    // events carries TIMESTAMP(NANOS): read as long, truncate to micros
    // (same convention as graft.queries.Q.t).
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batchSchema = s.read.parquet(s"$dir/events.parquet").schema
    val raw = s.readStream.schema(batchSchema)
      .parquet(s"$dir/events.parquet")
    val stream =
      if (batchSchema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("val"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    s.table(name)
      .select(col("event_type"), col("window.start").as("hour_ts"),
        col("n"), round(col("val"), 2).as("val"))
      .orderBy(col("event_type"), col("hour_ts"))
  }
}
