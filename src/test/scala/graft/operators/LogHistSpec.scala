package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Log-histogram quantile sketch: merge law, error bound, exact-small
  * behavior. */
class LogHistSpec extends SparkSpec {

  test("shard-merge law: histogram counts add — merged quantiles " +
    "equal union-built quantiles") {
    val s = spark
    import s.implicits._
    val all = (1L to 4000L).map(v => ("k", v * 37 % 100000))
      .toDF("k", "v")
    val a = all.filter(col("v") % 2 === 0)
    val b = all.filter(col("v") % 2 =!= 0)
    val ha = Sketches.logHistogram(a, Seq("k"), col("v"))
    val hb = Sketches.logHistogram(b, Seq("k"), col("v"))
    val merged = ha.unionByName(hb)
      .groupBy(col("k"), col("_bucket"))
      .agg(sum(col("_cnt")).as("_cnt"))
    val qs = Seq(5000, 9000, 9900)
    def res(h: org.apache.spark.sql.DataFrame) =
      Sketches.histQuantiles(h, Seq("k"), qs)
        .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(res(merged) == res(Sketches.logHistogram(all, Seq("k"),
      col("v"))))
  }

  test("estimates within 2^-(subBits-1) relative of the exact " +
    "discrete quantile; small values are EXACT") {
    val s = spark
    import s.implicits._
    val vals = (1L to 5000L).map(v => ("k", (v * v) % 999983))
    val df = vals.toDF("k", "v")
    val est = Sketches.histQuantiles(
        Sketches.logHistogram(df, Seq("k"), col("v")), Seq("k"),
        Seq(5000, 9900))
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    val sorted = vals.map(_._2).sorted
    def exact(q: Int) = sorted(((q.toLong * sorted.size + 9999) /
      10000).toInt - 1)
    for (q <- Seq(5000, 9900)) {
      val e = exact(q)
      assert(est(q) <= e && e - est(q) <= e / 16,
        s"q=$q est=${est(q)} exact=$e")
    }
    // values below 2^subBits land in exact singleton buckets
    val small = Seq(("k", 3L), ("k", 7L), ("k", 9L)).toDF("k", "v")
    val sq = Sketches.histQuantiles(
        Sketches.logHistogram(small, Seq("k"), col("v")), Seq("k"),
        Seq(5000))
      .collect().head.getLong(2)
    assert(sq == 7L)
  }
}
