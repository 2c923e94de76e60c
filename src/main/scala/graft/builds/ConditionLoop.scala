package graft.builds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Config-driven chronic-condition identification — the reference's CCW
  * build (load_ccw.R:598-738): ~31 condition configs, each with a code
  * predicate and a 1-claim or 2-claims-within-N-days qualification rule,
  * looped over shared claim tables; per qualifying member the condition
  * span is GREATEST/LEAST-merged (load_ccw.R:620-629).
  *
  * The loop is driver-side Scala over configs (SURVEY §2.9) — each
  * iteration is pure DataFrame ops on the same staged claims; results
  * union. The 2-claim rule uses a per-member LEAD window
  * (load_ccw.R:605-610), never a self-join.
  */
object ConditionLoop {

  /** @param minClaims  1 -> any matching claim qualifies; 2 -> needs two
    *                   claims within `withinDays` of each other
    */
  case class ConditionDef(name: String, codePred: Column,
      minClaims: Int, withinDays: Int)

  def defaultConditions: Seq[ConditionDef] = Seq(
    ConditionDef("big_spender", col("o_totalprice") > 150000.0, 1, 0),
    ConditionDef("open_frequent", col("o_orderstatus") === "O", 2, 90),
    ConditionDef("filled_frequent", col("o_orderstatus") === "F", 2, 180))

  /** Per (condition, member): first/last matching-claim dates + claim
    * count, for members satisfying the condition's rule. */
  def build(orders: DataFrame,
      conditions: Seq[ConditionDef] = defaultConditions): DataFrame =
    conditions.map { c =>
      val claims = orders.filter(c.codePred)
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"))
      val qualified =
        if (c.minClaims <= 1) claims.select(col("o_custkey")).distinct()
        else {
          val w = Window.partitionBy(col("o_custkey")).orderBy(col("d"))
          claims
            .withColumn("pair_ok",
              (datediff(lead(col("d"), 1).over(w), col("d")) <= c.withinDays)
                .cast("int"))
            .groupBy(col("o_custkey"))
            .agg(max(col("pair_ok")).as("any_pair"))
            .filter(col("any_pair") === 1)
            .select(col("o_custkey"))
        }
      claims.join(qualified, Seq("o_custkey"), "left_semi")
        .groupBy(col("o_custkey"))
        .agg(min(col("d")).as("first_date"), max(col("d")).as("last_date"),
          count(lit(1)).as("n_claims"))
        .select(lit(c.name).as("condition"), col("o_custkey"),
          col("first_date"), col("last_date"), col("n_claims"))
    }.reduce(_ unionByName _)
}
