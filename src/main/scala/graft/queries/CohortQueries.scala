package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.api.ClaimsElig
import graft.api.ClaimsElig.EligParams
import graft.queries.Q.t

/** The composed end-to-end reference pipelines (SURVEY §7.3): the cohort
  * API exercised on the driver testdata. */
object CohortQueries {

  /** §3.1 claims_elig end-to-end: activity-interval coverage in a 21-day
    * ask window, cov_pct/covgap_max totals, one-pass weighted modes of the
    * time-varying attributes, most-recent pick, param predicates.
    * Exercises SURVEY §2 rows 33 (one-pass multi-variable weighted mode),
    * 34 (covgap aggregates), 51 (most-recent pick) in one composed query. */
  def q49ClaimsElig(s: SparkSession, dir: String): DataFrame =
    ClaimsElig.cohort(t(s, dir, "events"), EligParams(
      fromDate = "2024-01-05", toDate = "2024-01-25",
      covMinPct = Some(20.0), covgapMaxDays = Some(10)))
      .orderBy("user_id")
}
