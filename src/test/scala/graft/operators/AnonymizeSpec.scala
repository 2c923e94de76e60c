package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** k-anonymity ladder: budget arithmetic, minimal-level choice, and the
  * degenerate tiny-corpus case where even full suppression fails. */
class AnonymizeSpec extends SparkSpec {

  test("minimal satisfying level wins; finer levels marked unsatisfied") {
    val s = spark
    import s.implicits._
    // 40 records: 20 distinct zips (all L0 groups of 2 < k) but only
    // two zip3 prefixes of 20 each (>= k) -> L1 chosen
    val recs = (0 until 40).map(i => (s"98${100 + i % 20}", 1960))
      .toDF("zip", "yob")
    val got = Anonymize.ladderStats(recs, Seq(
        ("l0", Seq(col("zip"), col("yob"))),
        ("l1", Seq(substring(col("zip"), 1, 3), col("yob"))),
        ("l2", Seq(lit("*"), lit("*")))), k = 5)
      .orderBy("level_idx")
      .select("level_name", "satisfies", "chosen")
      .as[(String, Boolean, Boolean)].collect().toSeq
    assert(got == Seq(("l0", false, false), ("l1", true, true),
      ("l2", true, false)))
  }

  test("suppression budget: exactly floor(n/20) violating records pass") {
    val s = spark
    import s.implicits._
    // 40 records: 38 in one big group, 2 in a singleton-pair group
    // (violating mass 2 = floor(40/20) -> satisfies at the budget edge)
    val recs = ((0 until 38).map(_ => "AAA") ++ Seq("BBB", "BBB"))
      .map((_, 1)).toDF("g", "one")
    val got = Anonymize.ladderStats(recs,
        Seq(("only", Seq(col("g")))), k = 5)
      .select("n_violating", "satisfies")
      .as[(Long, Boolean)].collect().head
    assert(got == ((2L, true)))
    // one more violating record breaks the budget
    val recs2 = ((0 until 37).map(_ => "AAA") ++ Seq("BBB", "BBB", "CCC"))
      .map((_, 1)).toDF("g", "one")
    val got2 = Anonymize.ladderStats(recs2,
        Seq(("only", Seq(col("g")))), k = 5)
      .select("n_violating", "satisfies")
      .as[(Long, Boolean)].collect().head
    assert(got2 == ((3L, false)))
  }

  test("NULL vs '' and delimiter-bearing values stay distinct groups") {
    val s = spark
    import s.implicits._
    // four records whose naive '|'-joined keys would COLLIDE into two
    // groups of 2 ("a|b" from ("a|b",NULL-skipped?) etc.), overstating
    // k-anonymity; length-prefixed encoding keeps all four distinct
    val recs = Seq(
      (Option("a|b"), Option("c")),    // "a|b" + "c"
      (Option("a"), Option("b|c")),    // would also join to "a|b|c"
      (Option.empty[String], Option("x")), // NULL first col
      (Option(""), Option("x")))       // empty-string first col
      .toDF("q1", "q2")
    val got = Anonymize.ladderStats(recs,
        Seq(("l0", Seq(col("q1"), col("q2")))), k = 2)
      .select("n_groups", "n_violating")
      .as[(Long, Long)].collect().head
    assert(got == ((4L, 4L)))
  }

  test("tiny corpus: even full suppression can fail; nothing is chosen") {
    val s = spark
    import s.implicits._
    val recs = (0 until 4).map(i => (s"z$i", 1)).toDF("zip", "one")
    val got = Anonymize.ladderStats(recs,
        Seq(("l0", Seq(col("zip"))), ("sup", Seq(lit("*")))), k = 5)
      .select("chosen").as[Boolean].collect().toSeq
    assert(got == Seq(false, false))
  }
}
