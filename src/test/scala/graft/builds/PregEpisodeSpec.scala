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
