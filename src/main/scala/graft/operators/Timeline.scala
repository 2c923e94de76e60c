package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Greedy sequential timeline admission — the one genuinely iterative
  * construct in the reference (pregnancy-episode WHILE loop,
  * load_stage.mcaid_claim_preg_episode.R:227-243): the next event is
  * admitted only if it clears a gap threshold from the previously *accepted*
  * event, which no single window expression can state.
  *
  * Spark-first shape per SURVEY §2.9: `groupByKey(id).flatMapGroups` with a
  * sorted in-memory per-entity scan. Per-entity row counts are small and the
  * keys distribute, so this is one shuffle and embarrassingly parallel.
  */
object Timeline {

  case class Ev(user_id: Long, ts: Timestamp, event_id: Long)
  case class Episode(user_id: Long, episode_seq: Int,
      start_event_id: Long, start_ts: Timestamp)

  /** Admit events at least `minGapDays` after the last admitted event. */
  def greedyEpisodes(events: DataFrame, minGapDays: Int): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val ds: Dataset[Ev] = events
      .select(col("user_id").cast("long"), col("ts"), col("event_id").cast("long"))
      .as[Ev]
    val gapMicros = minGapDays.toLong * 24 * 3600 * 1000000L
    // microsecond precision: comparing at Timestamp.getTime (ms) would
    // disagree with a full-precision SQL oracle on sub-ms boundaries
    def micros(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    ds.groupByKey(_.user_id)
      .flatMapGroups { (uid, it) =>
        val sorted = it.toArray.sortBy(e => (micros(e.ts), e.event_id))
        var lastAccepted = Long.MinValue
        var seq = 0
        val out = scala.collection.mutable.ArrayBuffer.empty[Episode]
        sorted.foreach { e =>
          if (lastAccepted == Long.MinValue || micros(e.ts) - lastAccepted >= gapMicros) {
            seq += 1
            lastAccepted = micros(e.ts)
            out += Episode(uid, seq, e.event_id, e.ts)
          }
        }
        out.iterator
      }
      .toDF()
  }
}
