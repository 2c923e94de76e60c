package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** LshPlanner: the generated power chains equal math.pow, and the
  * audit reproduces a brute-force scala computation of the S-curve
  * masses on a hand pair set. */
class LshPlannerSpec extends SparkSpec {

  test("powS chains equal math.pow for every exponent in the grid") {
    val s = spark
    import s.implicits._
    val bases = Seq(0.0, 0.1, 0.37, 0.5, 0.99, 1.0)
    val exps = LshPlanner.configs.flatMap { case (b, r) => Seq(b, r) }
      .distinct
    bases.foreach { v =>
      exps.foreach { n =>
        val got = Seq(v).toDF("x")
          .select(expr(LshPlanner.powS("x", n)).as("p"))
          .head().getDouble(0)
        // repeated multiplication vs pow: equal to within 1 ulp
        assert(math.abs(got - math.pow(v, n)) <= math.ulp(got) * n,
          s"powS($v, $n) = $got vs ${math.pow(v, n)}")
      }
    }
  }

  test("audit equals a brute-force scala replica of the ppm sums") {
    val s = spark
    import s.implicits._
    val sims = Seq(0.31, 0.44, 0.5, 0.62, 0.8, 0.97)
    val pairs = sims.zipWithIndex
      .map { case (j, i) => (i.toLong, i + 100L, j) }
      .toDF("id_a", "id_b", "jaccard")
    // the EXACT association powS generates, so floor boundaries agree
    def chainPow(base: Double, n: Int): Double =
      if (n == 1) base
      else if (n % 2 == 0) { val h = chainPow(base, n / 2); h * h }
      else base * chainPow(base, n - 1)
    def ppm(sim: Double, b: Int, r: Int): Long =
      math.floor((1.0 - chainPow(1.0 - chainPow(sim, r), b))
        * 1000000.0).toLong
    val got = LshPlanner.audit(pairs).collect().map { row =>
      (row.getInt(0), row.getInt(1)) ->
        (row.getAs[Long]("n_hi"), row.getAs[Long]("exp_hi_ppm"),
          row.getAs[Long]("n_lo"), row.getAs[Long]("exp_lo_ppm"))
    }.toMap
    LshPlanner.configs.foreach { case (b, r) =>
      val hi = sims.filter(_ >= 0.5)
      val lo = sims.filter(_ < 0.5)
      val want = (hi.size.toLong, hi.map(ppm(_, b, r)).sum,
        lo.size.toLong, lo.map(ppm(_, b, r)).sum)
      assert(got((b, r)) == want, s"config ($b,$r): ${got((b, r))} vs $want")
    }
    // sanity: more bands (shorter rows) catches more at every sim
    val rec = got.map { case ((b, _), v) => b -> v._2 }
    assert(rec(16) > rec(8) && rec(8) > rec(4) && rec(4) > rec(2))
  }
}
