package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hard-negative mining + DoReMi reweighting: contract properties on
  * hand fixtures. */
class MixtureOpsSpec extends SparkSpec {

  test("hardNegatives: positives excluded, ranks dense from 1, " +
    "subset of the mined top-k") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "spark shuffle join"), (2L, "spark shuffle sort"),
      (3L, "spark broadcast join"), (4L, "cats and dogs"),
      (5L, "spark shuffle join plan"))
      .toDF("doc_id", "text")
    val queries = Seq(("q1", "spark shuffle join"))
      .toDF("query_id", "query_text")
    val positives = Seq(("q1", 1L)).toDF("query_id", "pos_doc_id")
    val got = TextAnalysis.hardNegatives(docs, queries, positives,
        k = 4, negK = 3)
      .orderBy("neg_rank").collect()
    val ids = got.map(_.getLong(1)).toSeq
    assert(!ids.contains(1L))            // positive excluded
    assert(got.map(_.getInt(3)).toSeq == (1 to got.length)) // dense
    // doc 4 shares no query token: never mined
    assert(!ids.contains(4L))
    // the closest non-positive (doc 5 repeats all three tokens) first
    assert(ids.head == 5L)
    val mined = TextAnalysis.bm25TopK(docs, queries, 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.toSet.subsetOf(mined))
  }

  test("doremiWeights: mass conserved, monotone in loss, smoothing " +
    "floor holds, uniform losses stay uniform") {
    val s = spark
    import s.implicits._
    val domLoss = Seq(("a", 10L), ("b", 10L), ("c", 20L), ("d", 30L))
      .toDF("domain", "loss")
    val w = TextAnalysis.doremiWeights(domLoss)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val weights = w.values.map(_._2)
    // integer renormalization loses at most n per round + smoothing
    assert(math.abs(weights.sum - 1000000L) <= 40L)
    // higher loss -> at least as much weight
    assert(w("d")._2 > w("c")._2 && w("c")._2 > w("a")._2)
    assert(w("a")._2 == w("b")._2)
    // smoothing floor: every domain keeps >= SCALE/(smooth*n)
    assert(weights.forall(_ >= 1000000L / (5 * 4)))
    // all-equal losses: exactly uniform (excess 0 everywhere)
    val u = TextAnalysis.doremiWeights(
        Seq(("x", 7L), ("y", 7L)).toDF("domain", "loss"))
      .collect().map(_.getLong(2)).toSeq
    assert(u.distinct.size == 1)
  }
}
