package graft.operators

import graft.SparkSpec

/** Fellegi-Sunter EM on separable pattern counts: the fit must find
  * the planted structure. */
class LinkageEmSpec extends SparkSpec {

  test("separable mixture: m -> high, u -> low, lambda -> planted " +
    "prevalence; deterministic across runs") {
    val s = spark
    import s.implicits._
    // 1000 true matches agreeing on both fields; 9000 non-matches
    // agreeing on (almost) nothing; a little noise either way.
    val patterns = Seq(
      (1, 1, 950L), (1, 0, 30L), (0, 1, 20L),   // matches-ish
      (0, 0, 8800L), (1, 0, 120L), (0, 1, 80L)) // non-matches-ish
      .toDF("g_a", "g_b", "cnt")
      .groupBy("g_a", "g_b")
      .agg(org.apache.spark.sql.functions.sum("cnt").as("cnt"))
    def fit() = Linkage.emFieldProbs(patterns, Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val w = fit()
    assert(w("m_a") > 800000L && w("m_b") > 800000L)
    assert(w("u_a") < 100000L && w("u_b") < 100000L)
    assert(w("lambda") > 50000L && w("lambda") < 250000L)
    assert(fit() == w) // bit-reproducible
  }
}
