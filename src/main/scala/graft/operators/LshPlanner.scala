package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LSH parameter audit — capacity planning for the banded-minhash
  * dedup family: given the corpus's OBSERVED pair-similarity
  * distribution (exact Jaccard over the prefix-filtered candidate
  * pairs), compute for each candidate (bands, rows) configuration the
  * expected caught-pair mass above and below the duplicate threshold —
  * i.e. where each S-curve `P(collide | s) = 1 - (1 - s^r)^b` actually
  * lands on THIS corpus, not on a textbook sketch. The shipped (8, 2)
  * config is one row; the audit says what (16, 1) or (4, 4) would have
  * caught or leaked before anyone re-runs a 100-TB dedup to find out.
  *
  * Determinism: per-pair collision probability converts to ppm by
  * `floor(p * 1e6)` ROW-LOCALLY, and only the resulting INTEGERS are
  * summed — a distributed float sum would depend on accumulation
  * order; integer sums do not. The power terms expand to literal
  * multiplication chains ([[powS]]) shared verbatim with the generated
  * oracle SQL, so both engines parse the identical expression tree.
  *
  * Scale: one aggregation over the pair set (already candidate-sized,
  * not corpus-sized), stacked to one row per configuration. */
object LshPlanner {

  /** (bands, rows) grid sharing the shipped signature budget b*r = 16. */
  val configs: Seq[(Int, Int)] = Seq((2, 8), (4, 4), (8, 2), (16, 1))

  /** Literal multiplication chain for base^n — binary exponentiation
    * as a STRING so Spark `expr` and the DuckDB oracle parse the same
    * tree (no pow(), whose rounding is not pinned cross-engine). */
  def powS(base: String, n: Int): String =
    if (n == 1) s"($base)"
    else if (n % 2 == 0) { val h = powS(base, n / 2); s"($h * $h)" }
    else s"(($base) * ${powS(base, n - 1)})"

  /** `floor((1 - (1 - s^r)^b) * 1e6)` as a shared expression string. */
  def pCollidePpm(s: String, b: Int, r: Int): String = {
    val sr = powS(s, r)
    val miss = powS(s"1.0 - $sr", b)
    s"cast(floor((1.0 - $miss) * 1000000.0) as bigint)"
  }

  /** @param pairs (id_a, id_b, jaccard) — exact-recall pairs at the
    *              audit floor (e.g. [[Dedup.ngramJaccardDups]] at 0.3)
    * @param dupThreshold the similarity the pipeline calls "duplicate"
    * @return one row per config: bands, rows, n_hi, exp_hi_ppm (sum of
    *         per-pair collision ppm over pairs >= threshold — divide
    *         by n_hi for expected recall), n_lo, exp_lo_ppm (the
    *         false-candidate mass below it) */
  def audit(pairs: DataFrame, dupThreshold: Double = 0.5): DataFrame = {
    val aggs = configs.flatMap { case (b, r) =>
      val p = expr(pCollidePpm("jaccard", b, r))
      Seq(
        sum(when(col("jaccard") >= dupThreshold, lit(1L))).as(s"nhi_$b"),
        sum(when(col("jaccard") >= dupThreshold, p)).as(s"hi_$b"),
        sum(when(col("jaccard") < dupThreshold, lit(1L))).as(s"nlo_$b"),
        sum(when(col("jaccard") < dupThreshold, p)).as(s"lo_$b"))
    }
    val stackArgs = configs.map { case (b, r) =>
      s"$b, $r, coalesce(nhi_$b, 0L), coalesce(hi_$b, 0L), " +
        s"coalesce(nlo_$b, 0L), coalesce(lo_$b, 0L)"
    }.mkString(", ")
    pairs.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${configs.size}, $stackArgs) as " +
        "(bands, rows_per_band, n_hi, exp_hi_ppm, n_lo, exp_lo_ppm)"))
  }
}
