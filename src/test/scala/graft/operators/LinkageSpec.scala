package graft.operators

import java.sql.Date
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fellegi-Sunter linkage: hand-computed agreement vectors, scores, and
  * the blocking behavior. */
class LinkageSpec extends SparkSpec {

  private val w = Linkage.FieldWeights(
    nameAgree = 3.5, nameDisagree = -1.5,
    dobExact = 4.0, dobNear = 2.0, dobDisagree = -3.0,
    zipAgree = 2.5, zipDisagree = -1.0)

  private def df(rows: Seq[(String, String, String, Int, Int)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("pid", "name", "_d", "zip", "yob")
      .withColumn("dob", to_date(col("_d"))).drop("_d")
  }

  test("hand-computed scores per agreement pattern") {
    val a = df(Seq(("a1", "jane doe", "1950-03-01", 98001, 1950)))
    val b = df(Seq(
      ("exact", "jane doe", "1950-03-01", 98001, 1950),   // 3.5+4+2.5=10
      ("drift", "jane doe", "1950-03-25", 98001, 1950),   // 3.5+2+2.5=8
      ("ziptypo", "jane doe", "1950-03-01", 98002, 1950), // 3.5+4-1=6.5
      ("suffix", "jane doe jr", "1950-03-01", 98001, 1950), // -1.5+4+2.5=5
      ("nothing", "zz bob", "1950-12-30", 98111, 1950)))  // -1.5-3-1=-5.5
    val got = Linkage.scorePairs(a, b, "pid", "pid", "yob", w)
      .select(col("id_b"), col("score"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got == Map("exact" -> 10.0, "drift" -> 8.0, "ziptypo" -> 6.5,
      "suffix" -> 5.0, "nothing" -> -5.5))
  }

  test("blocking: cross-year pairs are never compared") {
    val a = df(Seq(("a1", "jane doe", "1950-12-31", 98001, 1950)))
    val b = df(Seq(("b1", "jane doe", "1951-01-01", 98001, 1951)))
    // 1-day dob drift across the year boundary: a true match the block
    // misses — the documented blocking trade
    assert(Linkage.scorePairs(a, b, "pid", "pid", "yob", w).count() == 0)
  }

  test("band cuts at the configured thresholds") {
    val s = spark
    import s.implicits._
    val got = Seq(10.0, 7.0, 6.9, 2.0, 1.9).toDF("score")
      .select(Linkage.bandCol(col("score"), 7.0, 2.0).as("b"))
      .as[String].collect().toSeq
    assert(got == Seq("match", "match", "possible", "possible",
      "non_match"))
  }
}
