package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Unit oracle for the text-analysis Column kernels. */
class TextAnalysisSpec extends SparkSpec {

  private def one(text: String): org.apache.spark.sql.DataFrame = {
    val s = spark
    import s.implicits._
    Seq((1L, text)).toDF("doc_id", "text")
  }

  test("langId picks the marker-majority language; und when no markers") {
    val cases = Seq(
      "the cat and the dog is in that house" -> "en",
      "el perro de la casa y en los campos del sur" -> "es",
      "xyzzy plugh qwerty" -> "und",
      "" -> "und")
    cases.foreach { case (txt, want) =>
      val got = one(txt).select(TextAnalysis.langId(col("text"))).head().getString(0)
      assert(got == want, s"'$txt' -> $got, want $want")
    }
  }

  test("tie between languages resolves to lexicographically first") {
    // 'la de' scores 2 for both es and fr -> fr loses to es? No: es < fr,
    // and both match exactly the same two tokens -> es wins.
    val got = one("la de").select(TextAnalysis.langId(col("text"))).head().getString(0)
    assert(got == "es")
  }

  test("withLangId agrees with langId on the documents corpus") {
    val docs = graft.queries.Q.t(spark, sf, "documents")
    val a = docs.select(col("doc_id"), TextAnalysis.langId(col("text")).as("p"))
      .orderBy("doc_id").collect().map(_.getString(1))
    val b = TextAnalysis.withLangId(docs, "text", "p")
      .select("doc_id", "p").orderBy("doc_id").collect().map(_.getString(1))
    assert(a.toSeq == b.toSeq)
  }

  test("token counts, punct ratio, fingerprint basics") {
    val df = one("Hello,  world! This is   a test.")
    val r = df.select(
      TextAnalysis.tokenCount(col("text")),
      TextAnalysis.punctRatio(col("text")),
      TextAnalysis.fingerprint(col("text")),
      TextAnalysis.fingerprint(lit("hello,  world! this is a test.  "))).head()
    assert(r.getInt(0) == 6)
    assert(math.abs(r.getDouble(1) - 3.0 / 32.0) < 1e-9) // , ! . of 32 chars
    assert(r.getString(2) == r.getString(3)) // normalization-invariant
  }

  test("vocabCoverage: corpus threshold, per-doc rare counts") {
    val s = spark
    import s.implicits._
    // corpus counts: aa=3 (in vocab at minCount=3), bb=2, cc=1 (rare)
    val docs = Seq(
      (1L, "aa aa bb"),
      (2L, "aa bb cc"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(docs, minCount = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 2L, 1L, 0.3333),  // bb below threshold
      (2L, 3L, 3L, 2L, 0.6667))) // bb + cc below threshold
  }
}
