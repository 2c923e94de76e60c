package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's top-causes tabulation consumer (R/top_causes.R): within
  * a date window, per "cause" category count claims and DISTINCT persons,
  * keep the top-N causes by claim count (top_n tie semantics,
  * top_causes.R:337-343), and small-cell-suppress the person counts.
  *
  * Scale: one aggregation shuffle on the cause key; the top-N prune is a
  * TakeOrderedAndProject (per-partition top-n, no global sort) and the
  * rank window runs over <= n surviving rows. */
object TopCauses {

  def topCauses(claims: DataFrame, causeCol: String, personCol: String,
      n: Int, suppressLower: Int = 1, suppressUpper: Int = 5): DataFrame = {
    val agg = claims
      .groupBy(col(causeCol).as("cause"))
      .agg(count(lit(1)).as("claim_cnt"),
        countDistinct(col(personCol)).as("person_cnt"))
    val ranked = graft.core.TopN.topNByRank(agg, "claim_cnt", "cause", n)
    Tabloop.suppress(ranked, Seq("person_cnt"), suppressLower, suppressUpper)
      .select(col("rnk"), col("cause"), col("claim_cnt"), col("person_cnt"))
      .orderBy(col("rnk"))
  }
}
