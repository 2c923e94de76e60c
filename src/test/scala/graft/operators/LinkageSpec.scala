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

  test("sorted neighborhood: every rank-window pair exactly once") {
    val s = spark
    import s.implicits._
    val df = ('a' to 'j').map(c => (c.toString, c.toString))
      .toDF("pid", "name")
    val got = Linkage.sortedNeighborhoodPairs(df, "pid", Seq("name"), 3)
      .select("id_a", "id_b").as[(String, String)].collect().toSeq
    val want = (for {
      i <- 0 until 10; j <- i + 1 until 10 if j - i < 3
    } yield (('a' + i).toChar.toString, ('a' + j).toChar.toString))
    assert(got.sorted == want.sorted)
    assert(got.size == got.toSet.size) // exactly once
  }

  test("sorted neighborhood catches the cross-year drift blocking missed") {
    val a = df(Seq(("A1", "jane doe", "1950-12-31", 98001, 1950)))
    val b = df(Seq(("B1", "jane doe", "1951-01-01", 98001, 1951)))
    val s = spark
    val u = a.unionByName(b)
    val cand = Linkage.sortedNeighborhoodPairs(u, "pid", Seq("name"), 5)
    val scoredP = Linkage.scoreCandidatePairs(cand, u, "pid", w)
      .collect()
    assert(scoredP.length == 1)
    assert(scoredP.head.getAs[Double]("score") == 8.0) // name+near+zip
  }

  test("frequency bonus: rare-name agreement outscores the same " +
    "pattern on a common name") {
    val s = spark
    import s.implicits._
    // 12 attrs share "common name"; "zyx q" appears twice (A+B = rare)
    val common = (1 to 10).map(i =>
      (s"F$i", "common name", "1950-01-01", 98001, 1950))
    val attrs = df(common ++ Seq(
      ("A1", "zyx q", "1950-03-01", 98001, 1950),
      ("B1", "zyx q", "1950-03-01", 98001, 1950),
      ("A2", "common name", "1950-01-01", 98001, 1950),
      ("B2", "common name", "1950-01-01", 98001, 1950)))
    val pairs = Seq(("A1", "B1"), ("A2", "B2")).toDF("id_a", "id_b")
    val fw = Linkage.FieldWeights(1.0, -1.5, 4.0, 2.0, -3.0, 2.5, -1.0)
    val got = Linkage.scoreCandidatePairsFreqWeighted(pairs, attrs,
        "pid", fw)
      .select("id_a", "freq_bucket", "score")
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getDouble(2))))
      .toMap
    assert(got("A1") == (("rare", 10.5)))   // 1 + 4 + 2.5 + 3
    assert(got("A2") == (("common", 7.5)))  // same pattern, no bonus
  }

  test("NULL A-side name: freq-weighted path keeps the pair (common " +
    "bucket), consistent with the plain scorer") {
    val s = spark
    import s.implicits._
    val attrs = df(Seq(
      ("B1", "some name", "1950-03-01", 98001, 1950)))
      .unionByName(Seq(("A1", Option.empty[String], "1950-03-01", 98001,
        1950)).toDF("pid", "name", "dob", "zip", "yob")
        .withColumn("dob", to_date(col("dob"))))
    val pairs = Seq(("A1", "B1")).toDF("id_a", "id_b")
    val fw = Linkage.FieldWeights(1.0, -1.5, 4.0, 2.0, -3.0, 2.5, -1.0)
    val plain = Linkage.scoreCandidatePairs(pairs, attrs, "pid", fw)
      .select("id_a", "score").collect()
    val freq = Linkage.scoreCandidatePairsFreqWeighted(pairs, attrs,
        "pid", fw)
      .select("id_a", "score", "freq_bucket").collect()
    assert(plain.length == 1 && freq.length == 1)
    assert(freq.head.getDouble(1) == plain.head.getDouble(1))
    assert(freq.head.getString(2) == "common")
  }

  test("two-key blocking: candidates require BOTH keys to agree") {
    val a = df(Seq(
      ("A1", "jane doe", "1950-06-01", 98011, 1950),
      ("A2", "john roe", "1950-06-01", 98021, 1950)))
      .withColumn("zd", expr("zip div 10"))
    val b = df(Seq(
      ("B1", "jane doe", "1950-06-01", 98012, 1950),  // same decade
      ("B2", "john roe", "1950-06-01", 98029, 1950))) // same decade
      .withColumn("zd", expr("zip div 10"))
    val got = Linkage.scorePairs(a, b, "pid", "pid", Seq("yob", "zd"),
        w, 2, 90)
      .select("id_a", "id_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // same yob everywhere, but cross-decade pairs (A1,B2)/(A2,B1) are
    // never compared
    assert(got == Set(("A1", "B1"), ("A2", "B2")))
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
