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
  * The configs drive expression construction on the driver (SURVEY §2.9),
  * but execution is ONE scan and ONE shuffle for the whole config set:
  * each claim is tagged with the array of conditions it matches, exploded
  * (row growth = matches, not conditions), and every per-(condition,
  * member) rule — the 2-claim LEAD window (load_ccw.R:605-610), the span
  * and the claim count — runs on the single (condition, member)
  * partitioning. The per-condition-loop alternative scans the claim table
  * ~2x per condition (~62 scans of 100 TB for the CCW set); this shape
  * scans it once regardless of config count.
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
      conditions: Seq[ConditionDef] = defaultConditions): DataFrame = {
    val tags = conditions.map(c => when(c.codePred, lit(c.name)))
    // non-matches are pruned from the array BEFORE the explode, so the
    // exploded row count really is matches, not rows x conditions
    val matched = orders
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"),
        filter(array(tags: _*), _.isNotNull).as("_tags"))
      .withColumn("condition", explode(col("_tags")))
      .select(col("condition"), col("o_custkey"), col("d"))
    // config lookup as expressions (no join — the config set is tiny)
    val minClaims = coalesce(conditions.map(c =>
      when(col("condition") === c.name, lit(c.minClaims))): _*)
    val withinDays = coalesce(conditions.map(c =>
      when(col("condition") === c.name, lit(c.withinDays))): _*)
    val w = Window.partitionBy(col("condition"), col("o_custkey")).orderBy(col("d"))
    matched
      .withColumn("pair_ok",
        (datediff(lead(col("d"), 1).over(w), col("d")) <= withinDays).cast("int"))
      .groupBy(col("condition"), col("o_custkey"))
      .agg(min(col("d")).as("first_date"), max(col("d")).as("last_date"),
        count(lit(1)).as("n_claims"), max(col("pair_ok")).as("_any_pair"),
        max(minClaims).as("_min_claims"))
      .filter(col("_min_claims") <= 1 || col("_any_pair") === 1)
      .select(col("condition"), col("o_custkey"),
        col("first_date"), col("last_date"), col("n_claims"))
  }
}
