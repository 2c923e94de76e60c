package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Contracts for the batch-perceptron trainer (LinearTrain). */
class LinearTrainSpec extends SparkSpec {

  import spark.implicits._

  private def metric(df: org.apache.spark.sql.DataFrame,
      item: String): Long =
    df.filter(col("item") === item).head().getLong(1)

  test("converges to a perfect separator on planted two-token data") {
    val docs = (1 to 40).map { i =>
      val y = i % 2
      val marker = if (y == 1) "markergoodqual" else "markerbadqual"
      (i.toLong, s"alpha beta gamma $marker $marker $marker", y)
    }.toDF("doc_id", "text", "y")
    val out = LinearTrain.perceptronTrain(docs, col("y"))
    assert(metric(out, "train_accuracy_ppm") == 1000000L)
    assert(metric(out, "round_05_misclassified") == 0L)
    // round 1 starts from w = 0: every margin is 0, all misclassified
    assert(metric(out, "round_01_misclassified") == 40L)
  }

  test("the q315 class tokens hash to distinct buckets (good 28, bad 31)") {
    // the fixture's learnability depends on this; a bucket-count or
    // hash-convention change that collides them must fail loudly here
    val b = Seq("markergoodqual", "markerbadqual").toDF("t")
      .selectExpr("pmod(conv(substring(md5(t), 1, 8), 16, 10), 32)")
      .as[String].collect()
    assert(b.toSeq == Seq("28", "31"))
  }

  test("weight trajectory is a pure function of the data (re-run " +
      "bit-equal) and updates stop once separated") {
    val docs = (1 to 20).map { i =>
      (i.toLong, if (i % 2 == 1) "aa aa zz" else "bb bb zz", i % 2)
    }.toDF("doc_id", "text", "y")
    val a = LinearTrain.perceptronTrain(docs, col("y")).collect()
    val b = LinearTrain.perceptronTrain(docs, col("y")).collect()
    assert(a.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      b.map(r => (r.getString(0), r.getLong(1))).toSeq)
    val out = LinearTrain.perceptronTrain(docs, col("y"))
    val l1r2 = metric(out, "round_02_weight_l1")
    val l1r5 = metric(out, "round_05_weight_l1")
    assert(metric(out, "round_02_misclassified") == 0L)
    assert(l1r2 == l1r5) // zero misclassified -> zero update
  }

  test("bias-only degenerate input (empty text) trains the bias " +
      "toward the majority class without throwing") {
    val docs = Seq((1L, "", 1), (2L, "", 1), (3L, "", 0))
      .toDF("doc_id", "text", "y")
    val out = LinearTrain.perceptronTrain(docs, col("y"))
    // identical features, 2:1 labels: the separator cannot split them;
    // determinism is the contract
    assert(out.filter(col("item") === "train_accuracy_ppm").count() == 1)
  }
}
