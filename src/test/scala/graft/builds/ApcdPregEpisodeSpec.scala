package graft.builds

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** APCD pregnancy endpoints: the vocabulary prefix expansion, the
  * endpoint_dcount gate + DELIV recode, and the STEP-9 age CASE
  * (ninety_only cap, newborn branch, 12-55 gate) on hand fixtures. */
class ApcdPregEpisodeSpec extends SparkSpec {

  private def d(s: String) = java.sql.Date.valueOf(s)

  private def refDf = {
    val s = spark
    import s.implicits._
    def row(p: String, f: String) = {
      def b(n: String): Option[Int] = if (n == f) Some(1) else None
      (p, b("lb"), b("ect"), b("ab"), b("sa"), b("sb"), b("tro"),
        b("deliv"))
    }
    Seq(row("O80%", "lb"), row("O00%", "ect"), row("O82%", "deliv"))
      .toDF("code_like", "lb", "ect", "ab", "sa", "sb", "tro", "deliv")
  }

  test("codeEndpoints: prefix LIKE expansion, exact fact join, date gate") {
    val s = spark
    import s.implicits._
    val claims = Seq(
      (1L, 10L, d("1996-05-01"), "O801"),  // prefix match O80%
      (1L, 11L, d("1996-05-02"), "O81"),   // NOT a match (O81 != O80...)
      (2L, 12L, d("1990-01-01"), "O801"),  // before minDate -> dropped
      (2L, 13L, d("1996-06-01"), "O001"))  // ect
      .toDF("id_person", "claim_header_id", "last_service_date",
        "icdcm_norm")
    val got = ApcdPregEpisode.codeEndpoints(claims, "icdcm_norm", refDf,
        "1994-01-01")
      .select("id_person", "claim_header_id", "lb", "ect")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)), Option(r.get(3)))).toSet
    assert(got == Set(
      (1L, 10L, Some(1), None),
      (2L, 13L, None, Some(1))))
  }

  test("endpointDays: dcount>1 days drop, DELIV recodes to 0 next to a " +
    "real endpoint, clean days classify") {
    val s = spark
    import s.implicits._
    def row(id: Long, day: String, f: String) = {
      def b(n: String) = if (n == f) Some(1) else None
      (id, id * 100, d(day), b("lb"), b("ect"), b("ab"), b("sa"), b("sb"),
        b("tro"), b("deliv"))
    }
    val dx = Seq(
      row(1L, "1996-01-01", "lb"),   // same day as ect -> dcount 2, drop
      row(1L, "1996-01-01", "ect"),
      row(1L, "1996-03-01", "lb"),   // same day as deliv -> deliv recode
      row(1L, "1996-03-01", "deliv"),
      row(2L, "1996-05-01", "deliv")) // deliv alone survives
      .toDF("id_person", "claim_header_id", "last_service_date",
        "lb", "ect", "ab", "sa", "sb", "tro", "deliv")
    val px = dx.limit(0)
    val got = ApcdPregEpisode.endpointDays(dx, px)
      .collect().map(r => (r.getLong(0), r.getDate(1).toString,
        r.getString(2))).toSet
    assert(got == Set(
      (1L, "1996-03-01", "lb"),
      (2L, "1996-05-01", "deliv")))
  }

  test("withAgeAtOutcome: T-SQL age, ninety_only cap, newborn branch, " +
    "12-55 gate, missing demo drops") {
    val s = spark
    import s.implicits._
    val episodes = Seq(
      (1L, d("1996-06-01")),  // age 30 -> kept, 30-34
      (2L, d("1996-06-01")),  // ninety_only -> 90 -> gated out
      (3L, d("1996-06-01")),  // dob after end -> floor = -1 -> 0 -> gated
      (4L, d("1996-06-01")))  // no demo row -> NULL age -> gated
      .toDF("id_person", "preg_end_date")
    val demo = Seq(
      (1L, d("1966-03-01"), 0),
      (2L, d("1966-03-01"), 1),
      (3L, d("1996-12-01"), 0))
      .toDF("id_person", "dob", "ninety_only")
    val got = ApcdPregEpisode.withAgeAtOutcome(episodes, demo)
      .select("id_person", "age_at_outcome", "age_at_outcome_cat6")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .toSet
    assert(got == Set((1L, 30, "30-34")))
  }
}
