package graft.operators

import java.sql.Timestamp
import graft.SparkSpec

/** Hand-computed oracle for the greedy iterative timeline (q44 has no SQL
  * oracle — the admission rule depends on previously *accepted* rows). */
class TimelineSpec extends SparkSpec {

  private def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-${day + 1}%02d $hour%02d:00:00")

  test("greedy admission matches the hand-computed episode sequence") {
    val s = spark
    import s.implicits._
    // user 1: days 0,1,2,5,6,10 with minGap=2 -> admit d0, d2, d5, d10
    // user 2: single event -> one episode
    // user 3: same-day burst -> only the first admitted
    val events = Seq(
      (1L, ts(0), 100L), (1L, ts(1), 101L), (1L, ts(2), 102L),
      (1L, ts(5), 103L), (1L, ts(6), 104L), (1L, ts(10), 105L),
      (2L, ts(3), 200L),
      (3L, ts(4, 1), 300L), (3L, ts(4, 2), 301L), (3L, ts(4, 3), 302L)
    ).toDF("user_id", "ts", "event_id")
    val out = Timeline.greedyEpisodes(events, minGapDays = 2)
      .orderBy("user_id", "episode_seq")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, 1, 100L), (1L, 2, 102L), (1L, 3, 103L), (1L, 4, 105L),
      (2L, 1, 200L),
      (3L, 1, 300L)))
  }

  test("tie-break within identical timestamps is by event_id") {
    val s = spark
    import s.implicits._
    val events = Seq((9L, ts(0), 7L), (9L, ts(0), 3L), (9L, ts(0), 5L))
      .toDF("user_id", "ts", "event_id")
    val out = Timeline.greedyEpisodes(events, minGapDays = 1).collect()
    assert(out.length == 1)
    assert(out.head.getLong(2) == 3L) // lowest event_id admitted first
  }
}
