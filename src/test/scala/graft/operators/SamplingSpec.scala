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

  test("A-Res weighted sample matches a scala replica of the key " +
      "formula; w<=0 excluded; k >= population returns all") {
    val s = spark
    import s.implicits._
    val rows = (1L to 30L).map(i => (i, (i % 9).toLong)) // some w = 0
    val df = rows.toDF("id", "w")
    // scala replica: u from md5("ares:id") first 8 hex chars, centered
    def key(id: Long, w: Long): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ares:$id".getBytes("UTF-8"))
      val hex = d.take(4).map("%02x".format(_)).mkString
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) /
        4294967296.0
      // integer-rounded numerator, one IEEE division (the large-weight
      // key-collapse fix: distinct u stay distinct at any w)
      BigDecimal(math.log(u) * 1000000.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / w.toDouble
    }
    val expect = rows.filter(_._2 > 0)
      .map { case (i, w) => (i, key(i, w)) }
      .sortBy { case (i, kk) => (-kk, i) }.take(5).map(_._1)
    val got = Sampling.weightedSample(df, "id", col("w"), k = 5)
      .orderBy(col("rnk")).collect().map(_.getAs[Long]("id")).toSeq
    assert(got == expect, s"got $got want $expect")
    val all = Sampling.weightedSample(df, "id", col("w"), k = 100)
    assert(all.count() == rows.count(_._2 > 0))
    // partition layout cannot change the draw
    val re = Sampling.weightedSample(df.repartition(7), "id", col("w"),
      k = 5).orderBy(col("rnk")).collect().map(_.getAs[Long]("id")).toSeq
    assert(re == got)
  }

  test("A-Res keys stay distinct at large weights (the 6-dp-quotient " +
      "collapse fix): 500 rows at w = 10000 draw 500 distinct keys") {
    val s = spark
    import s.implicits._
    val df = (1L to 500L).map(i => (i, 10000L)).toDF("id", "w")
    val keys = Sampling.weightedSample(df, "id", col("w"), k = 500)
      .select(col("ares_key")).distinct().count()
    assert(keys == 500L, s"expected 500 distinct keys, got $keys")
  }

  test("shard manifest: total row aggregates the shard rows, and a " +
      "single-doc edit moves exactly one shard fingerprint") {
    val s = spark
    import s.implicits._
    val docs = (0L until 25L).map(i => (i, s"doc $i body " + ("w " * 40)))
      .toDF("doc_id", "text")
    val m = TextAnalysis.shardManifest(docs, shardTokens = 100L)
      .collect()
    val (tot, per) = m.partition(_.getAs[Int]("is_total") == 1)
    assert(tot.length == 1 && per.nonEmpty)
    assert(tot.head.getAs[Long]("n_docs") ==
      per.map(_.getAs[Long]("n_docs")).sum)
    assert(tot.head.getAs[Long]("n_tokens") ==
      per.map(_.getAs[Long]("n_tokens")).sum)
    assert(tot.head.getAs[Long]("content_fp") ==
      per.map(_.getAs[Long]("content_fp")).reduce(_ ^ _))
    // same-length edit to one doc: same shard layout, one fp changes
    val edited = docs.withColumn("text",
      when(col("doc_id") === 7L,
        concat(lit("DOC 7 body "), lit("w " * 40))).otherwise(col("text")))
    val m2 = TextAnalysis.shardManifest(edited, shardTokens = 100L)
      .filter(col("is_total") === 0).collect()
      .map(r => r.getAs[Long]("shard") -> r.getAs[Long]("content_fp"))
      .toMap
    val m1 = per.map(r => r.getAs[Long]("shard") ->
      r.getAs[Long]("content_fp")).toMap
    val changed = m1.keySet.filter(k => m1(k) != m2(k))
    assert(changed.size == 1, s"exactly one shard must drift: $changed")
  }
}
