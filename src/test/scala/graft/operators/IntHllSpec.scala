package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integer-HLL contracts: duplicate-insensitivity, partition
  * invariance, monotonicity under union, and error bounds. */
class IntHllSpec extends SparkSpec {

  private def est(values: Seq[Long]): Long = {
    val s = spark
    import s.implicits._
    Sketches.intHllEstimate(
        values.map(v => ("k", v)).toDF("k", "v"), Seq("k"), col("v"))
      .collect().head.getAs[Long]("hll_est")
  }

  test("duplicate-insensitive: the multiset's estimate equals the " +
    "set's") {
    val base = (1L to 500L)
    assert(est(base) == est(base ++ base ++ base.take(100)))
  }

  test("partition-invariant: repartitioning does not move a single " +
    "register") {
    val s = spark
    import s.implicits._
    val df = (1L to 2000L).map(v => (v % 7, v)).toDF("k", "v")
    val a = Sketches.intHllEstimate(df, Seq("k"), col("v"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("hll_est")).toMap
    val b = Sketches.intHllEstimate(df.repartition(17), Seq("k"),
        col("v"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("hll_est")).toMap
    assert(a == b)
  }

  test("monotone under union: more distincts never lowers the raw " +
    "estimate; error within 4 standard errors at n >> 5m/2") {
    val a = est(1L to 3000L)
    val b = est(1L to 6000L)
    assert(b >= a)
    // sigma = 1.04/sqrt(256) = 6.5%; allow 4 sigma
    assert(math.abs(a - 3000L) <= 3000L * 26 / 100)
    assert(math.abs(b - 6000L) <= 6000L * 26 / 100)
  }
}
