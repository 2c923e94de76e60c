package graft.builds

import java.sql.Date
import graft.SparkSpec

/** Hand-computed fixtures for the hierarchical pregnancy-episode build:
  * greedy cumulative-gap admission, cross-class conflict windows (strict —
  * a same-day higher-class endpoint does NOT block), per-class episode
  * ranks. */
class PregEpisodeSpec extends SparkSpec {

  private def d(s: String) = Date.valueOf(s)

  test("conflict filter + greedy admission + per-class episode ids") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      // lb: 2020-03-01 is 60d after the seed (skipped, cum=60);
      // 2020-08-01 is +153d, cum 213 > 182 -> admitted
      (1L, d("2020-01-01"), "lb"),
      (1L, d("2020-03-01"), "lb"),
      (1L, d("2020-08-01"), "lb"),
      // sb: 2020-02-01 is 31d after placed lb 2020-01-01 -> blocked;
      // 2021-06-01 is 304d after lb 2020-08-01 -> survives, admitted
      (1L, d("2020-02-01"), "sb"),
      (1L, d("2021-06-01"), "sb"),
      // deliv: 2021-06-01 is SAME DAY as the placed sb (strict window ->
      // not blocked) and 304d from the last lb -> admitted;
      // 2021-06-20 is 19d after placed sb -> blocked;
      // 2022-01-01 is 214d after sb -> survives, gap 214 > 168 -> admitted
      (1L, d("2021-06-01"), "deliv"),
      (1L, d("2021-06-20"), "deliv"),
      (1L, d("2022-01-01"), "deliv"),
      // second person: single sb, no lb anywhere -> admitted as episode 1
      (2L, d("2020-05-05"), "sb")
    ).toDF("id_person", "endpoint_date", "cls")

    val out = PregEpisode.build(rows, "id_person", "endpoint_date", "cls")
      .select("id_person", "preg_endpoint", "endpoint_date", "preg_episode_id")
      .as[(Long, String, Date, Int)].collect().toSet

    assert(out === Set(
      (1L, "lb", d("2020-01-01"), 1),
      (1L, "lb", d("2020-08-01"), 2),
      (1L, "sb", d("2021-06-01"), 1),
      (1L, "deliv", d("2021-06-01"), 1),
      (1L, "deliv", d("2022-01-01"), 2),
      (2L, "sb", d("2020-05-05"), 1)))
  }

  test("conflict windows are a matrix: lb blocks tro at 168, not its own 182") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, d("2020-01-01"), "lb"),
      (1L, d("2020-06-09"), "tro"), // 160d after lb <= 168 -> blocked
      (1L, d("2020-06-19"), "tro")  // 170d after lb > 168 -> survives
      // (a one-window-per-placed-class model would block both at lb's 182)
    ).toDF("id_person", "endpoint_date", "cls")
    val out = PregEpisode.build(rows, "id_person", "endpoint_date", "cls")
      .select("preg_endpoint", "endpoint_date", "preg_episode_id")
      .as[(String, Date, Int)].collect().toSet
    assert(out === Set(
      ("lb", d("2020-01-01"), 1),
      ("tro", d("2020-06-19"), 1)))
  }

  test("prenatal windows: default gestation, clip to prior + buffer, bounds") {
    val s = spark
    import s.implicits._
    val placed = Seq(
      (1L, d("2020-01-01"), "lb"),  // no prior -> start = end - 301
      (1L, d("2020-03-01"), "sa"),  // prior lb 60d ago < 133 -> prior + 28
      (1L, d("2021-01-01"), "tro")  // prior sa 306d ago >= 112 -> end - 112
    ).toDF("id_person", "endpoint_date", "preg_endpoint")
    val out = PregEpisode.withPrenatalWindows(placed)
      .select("preg_endpoint", "preg_episode_seq", "preg_start_date",
        "preg_end_date", "preg_start_date_max", "preg_start_date_min")
      .as[(String, Int, Date, Date, Date, Date)].collect()
      .sortBy(_._2).toSeq
    assert(out === Seq(
      ("lb", 1, d("2019-03-06"), d("2020-01-01"),
        d("2019-03-06"), d("2019-07-31")),
      ("sa", 2, d("2020-01-29"), d("2020-03-01"),
        d("2019-10-20"), d("2020-02-02")),
      ("tro", 3, d("2020-09-11"), d("2021-01-01"),
        d("2020-09-11"), d("2020-11-20"))))
  }

  test("ga correction: closest anchor wins, flags, uncorrected pass through") {
    val s = spark
    import s.implicits._
    val episodes = Seq(
      // lb episode: window 2019-03-06 .. 2020-01-01; two anchors inside,
      // later one wins: start = 2019-04-01 - 13 = 2019-03-19 ->
      // ga_days = 289, ga_weeks 41.3 -> valid lb, ftb
      (1L, "lb", 1, d("2019-03-06"), d("2020-01-01"),
        d("2019-03-06"), d("2019-07-31")),
      // sb episode with an anchor making ga_weeks = (28+1)/7 = 4.1 < 20
      // -> valid_ga 0; corrected start after start_date_min -> flag 0
      (1L, "sb", 2, d("2020-06-01"), d("2021-01-01"),
        d("2020-03-06"), d("2020-08-15")),
      // no anchor in window -> correction columns NULL
      (2L, "lb", 1, d("2019-01-01"), d("2019-10-01"),
        d("2019-01-01"), d("2019-04-30"))
    ).toDF("id_person", "preg_endpoint", "preg_episode_seq",
      "preg_start_date", "preg_end_date",
      "preg_start_date_max", "preg_start_date_min")
    val procs = Seq(
      (1L, d("2019-03-20"), "58321"),
      (1L, d("2019-04-01"), "S4035"),  // later -> wins for episode 1
      (1L, d("2019-04-02"), "OTHER"),  // non-anchor code ignored
      (1L, d("2020-12-17"), "58974"),  // sb episode: start = 2020-12-04
      (2L, d("2020-05-05"), "58321")   // outside person 2's window
    ).toDF("id_person", "procedure_date", "procedure_code")
    val out = PregEpisode.gaCorrection(episodes, procs,
        Seq("58321", "58322", "S4035", "58974", "58976", "S4037"))
      .select("id_person", "preg_episode_seq", "preg_start_date_correct",
        "ga_weeks", "valid_start_date", "valid_ga", "lb_type")
      .collect().map(r => (r.getLong(0), r.getInt(1),
        Option(r.getDate(2)).map(_.toString).orNull,
        Option(r.getDecimal(3)).map(_.toString).orNull,
        if (r.isNullAt(4)) -1 else r.getInt(4),
        if (r.isNullAt(5)) -1 else r.getInt(5),
        r.getString(6))).toSet
    assert(out === Set(
      (1L, 1, "2019-03-19", "41.3", 1, 1, "ftb"),
      (1L, 2, "2020-12-04", "4.1", 0, 0, null),
      (2L, 1, null, null, -1, -1, null)))
  }

  test("ga correction: shuffle-join fallback path equals the broadcast path") {
    val s = spark
    import s.implicits._
    val episodes = Seq(
      (1L, "lb", 1, d("2019-03-06"), d("2020-01-01"),
        d("2019-03-06"), d("2019-07-31")),
      (2L, "lb", 1, d("2019-01-01"), d("2019-10-01"),
        d("2019-01-01"), d("2019-04-30"))
    ).toDF("id_person", "preg_endpoint", "preg_episode_seq",
      "preg_start_date", "preg_end_date",
      "preg_start_date_max", "preg_start_date_min")
    val procs = Seq(
      (1L, d("2019-03-20"), "58321"),
      (1L, d("2019-04-01"), "S4035"),
      (2L, d("2020-05-05"), "58321")
    ).toDF("id_person", "procedure_date", "procedure_code")
    val codes = Seq("58321", "58322", "S4035", "58974", "58976", "S4037")
    def rows(maxBroadcastAnchors: Long) =
      PregEpisode.gaCorrection(episodes, procs, codes,
          maxBroadcastAnchors = maxBroadcastAnchors)
        .orderBy("id_person", "preg_episode_seq")
        .collect().map(_.toString).toSeq
    // threshold 0 forces the non-broadcast plan; Long.MaxValue exercises
    // the probe-cap clamp and forces the broadcast plan
    assert(rows(0L) === rows(Long.MaxValue))
    // with auto-broadcast off, only the explicit hint can broadcast: the
    // fallback path must plan a shuffle join, the hinted path a BHJ
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = s.conf.get(key)
    try {
      s.conf.set(key, "-1")
      def plan(th: Long) = PregEpisode.gaCorrection(episodes, procs, codes,
        maxBroadcastAnchors = th).queryExecution.executedPlan.toString
      assert(!plan(0L).contains("BroadcastHashJoin"))
      assert(plan(Long.MaxValue).contains("BroadcastHashJoin"))
    } finally s.conf.set(key, prev)
  }

  test("duplicate endpoint rows collapse; empty input yields empty output") {
    val s = spark
    import s.implicits._
    val dup = Seq((1L, d("2020-01-01"), "lb"), (1L, d("2020-01-01"), "lb"))
      .toDF("id_person", "endpoint_date", "cls")
    assert(PregEpisode.build(dup, "id_person", "endpoint_date", "cls")
      .count() === 1L)
    val empty = Seq.empty[(Long, Date, String)]
      .toDF("id_person", "endpoint_date", "cls")
    assert(PregEpisode.build(empty, "id_person", "endpoint_date", "cls")
      .count() === 0L)
  }
}
