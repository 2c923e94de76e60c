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

  test("alpha derives from p: 7183 at the p=8 default (the value the " +
    "q255/q256/q272 oracles pin), published constants at small m, and " +
    "a p=12 estimate uses the p=12 alpha, not p=8's") {
    assert(Sketches.hllAlphaE4(8) == 7183L)
    assert(Sketches.hllAlphaE4(4) == 6730L)
    assert(Sketches.hllAlphaE4(5) == 6970L)
    assert(Sketches.hllAlphaE4(6) == 7090L)
    assert(Sketches.hllAlphaE4(12) ==
      math.round(0.7213 / (1.0 + 1.079 / 4096.0) * 10000.0))
    val s = spark
    import s.implicits._
    // n = 50000 >> 2.5m = 10240 keeps us out of the LinearCounting
    // small range the estimator deliberately leaves uncorrected
    val df = (1L to 50000L).map(v => ("k", v)).toDF("k", "v")
    val derived = Sketches.intHllEstimate(df, Seq("k"), col("v"), p = 12)
      .collect().head.getAs[Long]("hll_est")
    val explicit = Sketches.intHllEstimate(df, Seq("k"), col("v"), p = 12,
        alphaE4 = Sketches.hllAlphaE4(12))
      .collect().head.getAs[Long]("hll_est")
    assert(derived == explicit)
    // the p=12 alpha keeps the raw estimate within ~4 sigma
    // (1.04/sqrt(4096) = 1.6%) — the fixed p=8 constant would sit
    // ~1.7% low SYSTEMATICALLY on top of noise
    assert(math.abs(derived - 50000L) <= 50000L * 8 / 100)
  }
}
