package graft.api

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.api.ClaimsElig.EligParams
import graft.queries.Q

/** Cohort-API param semantics: each optional param must only narrow the
  * cohort, and the narrowing must match hand-applied filters — the
  * fragment-assembly contract of claims_elig.R. */
class ClaimsEligSpec extends SparkSpec {

  private val base = EligParams("2024-01-05", "2024-01-25")

  private def run(p: EligParams) =
    ClaimsElig.cohort(Q.t(spark, sf, "events"), p).collect()

  test("absent params = unconstrained cohort; present params only narrow") {
    val all = run(base)
    assert(all.nonEmpty)
    // sf0.001 cohort: covgap_max in {0,1,2}, cov_days 16-21 — these
    // thresholds provably exclude some users and keep others
    val narrowed = run(base.copy(covMinPct = Some(50.0),
      covgapMaxDays = Some(1), minCovDays = Some(18)))
    assert(narrowed.length < all.length && narrowed.nonEmpty)
    narrowed.foreach { r =>
      assert(r.getAs[Double]("cov_pct") >= 50.0)
      assert(r.getAs[Int]("covgap_max") <= 1)
      assert(r.getAs[Long]("cov_days") >= 18L)
    }
  }

  test("value filters match hand-applied predicates on the full cohort") {
    val all = run(base).map(r => (r.getLong(0), r.getAs[String]("modal_type"),
      r.getAs[String]("recent_type"))).toSeq
    val byParam = run(base.copy(modalTypes = Some(Seq("PURCHASE")),
      recentTypes = Some(Seq("click", "view"))))
      .map(_.getLong(0)).toSeq
    val byHand = all.filter { case (_, m, r) =>
      m != null && m.equalsIgnoreCase("purchase") &&
        r != null && Seq("click", "view").contains(r.toLowerCase)
    }.map(_._1)
    assert(byParam == byHand && byParam.nonEmpty)
  }

  test("props rlike pattern narrows on the modal props value") {
    val out = run(base.copy(propsPattern = Some("\"k\": 1\\d\\}")))
    assert(out.nonEmpty)
    out.foreach(r =>
      assert(r.getAs[String]("modal_props").matches(""".*"k": 1\d\}""")))
  }
}
