package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stratified exact-quota sampling: Hamilton apportionment arithmetic,
  * exact-N totals, and row-level determinism. */
class SamplingSpec extends SparkSpec {

  private def fixture = {
    val s = spark
    import s.implicits._
    // strata sizes a:5, b:3, c:2 (total 10)
    ((1 to 5).map(i => (i.toLong, "a")) ++
      (6 to 8).map(i => (i.toLong, "b")) ++
      (9 to 10).map(i => (i.toLong, "c"))).toDF("id", "st")
  }

  test("largest remainder: floors + tie-broken extras (hand-computed)") {
    val s = spark
    import s.implicits._
    // N = 10*1/2 = 5 -> shares 2.5/1.5/1.0, floors 2/1/1, one leftover
    // seat; remainders (5*5)%10=5, (5*3)%10=5, (5*2)%10=0 — a and b tie,
    // key order gives it to a -> quotas 3/1/1
    val got = Sampling.stratifiedSample(fixture, Seq("st"), "id", (1, 2))
      .groupBy("st").agg(min("quota").as("q"), count(lit(1)).as("n"))
      .orderBy("st").as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 3L, 3L), ("b", 1L, 1L), ("c", 1L, 1L)))
  }

  test("quotas sum exactly to N and never exceed the stratum size") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sel = Sampling.stratifiedSample(docs, Seq("lang", "source"),
      "doc_id", (1, 3))
    val total = docs.count()
    val n = total * 1 / 3
    val quotas = sel.groupBy("lang", "source")
      .agg(min("quota").as("q"), min("n_h").as("nh"))
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    // zero-quota strata emit no rows, so the visible quotas must sum to N
    assert(quotas.map(_._1).sum == n)
    assert(quotas.forall { case (q, nh) => q <= nh })
    assert(sel.count() == n)
  }

  test("selection is deterministic row-for-row") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def ids = Sampling.stratifiedSample(docs, Seq("lang"), "doc_id",
        (1, 4)).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == ids)
    assert(ids.nonEmpty)
  }
}
