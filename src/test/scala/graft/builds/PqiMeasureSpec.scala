package graft.builds

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** PQI classifier kernels: the anti-join exclusion chain and the
  * episode-level pivot + composite. */
class PqiMeasureSpec extends SparkSpec {

  test("excludeClaims chains anti joins and keeps column order") {
    val s = spark
    import s.implicits._
    val include = Seq(("PQI 01", 1L, 10L, 1), ("PQI 01", 2L, 11L, 1),
        ("PQI 01", 3L, 12L, 1))
      .toDF("value_set_group", "claim_id", "ed_pophealth_id", "flag")
    val ex1 = Seq(Tuple1(2L)).toDF("claim_id")
    val ex2 = Seq(Tuple1(3L), Tuple1(3L)).toDF("claim_id") // dup ids fine
    val out = PqiMeasure.excludeClaims(include, Seq(ex1, ex2))
    assert(out.columns.toSeq ==
      Seq("value_set_group", "claim_id", "ed_pophealth_id", "flag"))
    assert(out.select("claim_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("pqiPivot: per-episode flags, zero fill, composite") {
    val s = spark
    import s.implicits._
    val rules = Seq(
      ("PQI 01", 1L, 100L, 1),
      ("PQI 01", 2L, 100L, 1),  // same episode twice -> one flag
      ("PQI 03", 3L, 100L, 1),  // second indicator, same episode
      ("PQI 03", 4L, 200L, 1))  // different episode
      .toDF("value_set_group", "claim_id", "ed_pophealth_id", "flag")
    val got = PqiMeasure.pqiPivot(rules, Seq("PQI 01", "PQI 03", "PQI 05"))
      .orderBy("ed_pophealth_id")
      .as[(Long, Int, Int, Int, Int)].collect().toSeq
    assert(got == Seq(
      (100L, 1, 1, 0, 1),
      (200L, 0, 1, 0, 1)))
  }
}
