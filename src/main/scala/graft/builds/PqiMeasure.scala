package graft.builds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** AHRQ Prevention Quality Indicator (PQI) classifiers — the reference's
  * ED / inpatient PQI views (create_stage.v_mcaid_pqi_ed.sql,
  * create_stage.v_mcaid_pqi_inpatient.sql): a stack of indicator rules,
  * each "primary diagnosis in an AHRQ value set, minus claims in
  * exclusion value sets", aggregated to the ED-episode level and pivoted
  * to one wide row per episode with a composite flag.
  *
  * Shapes vs the T-SQL: every `claim_header_id NOT IN (subquery)` is a
  * LEFT ANTI hash join on the claim id (claim ids are non-null here, so
  * NOT IN's three-valued-logic trap does not bite); the rule stack is a
  * UNION of independently-filtered scans; the PIVOT gets its explicit
  * group list so no distinct-discovery job runs. All the anti joins key
  * on claim_id, so AQE plans them as consecutive shuffle-hash joins on
  * one key — at statewide scale the exclusion sets are small fractions
  * of the claim table and arrive pre-aggregated (DISTINCT claim ids).
  */
object PqiMeasure {

  /** The `NOT IN (SELECT DISTINCT claim_header_id ...)` chain: one LEFT
    * ANTI join per exclusion frame (each carrying claim_id). */
  def excludeClaims(include: DataFrame,
      exclusions: Seq[DataFrame]): DataFrame =
    exclusions.foldLeft(include)((acc, ex) =>
      acc.join(ex.select(col("claim_id")).distinct(), Seq("claim_id"),
          "left_anti")
        // key-joins move claim_id first; restore the caller's column
        // order so rule frames stay positionally union-able
        .select(acc.columns.map(col): _*))

  /** One-scan claim set-membership flags: ONE broadcast join of a claim
    * frame against ALL its relevant value sets at once, collapsed to one
    * row per claim with a 0/1 column per set — the input the rule
    * algebra needs, at one scan per source table instead of one scan per
    * (rule x value set). Same argument as the FUH membership-flag path:
    * every set here is a projection of the same claim key space, so
    * `IN set` ≡ flag = 1, `NOT IN set` ≡ flag ≠ 1, INTERSECT ≡ AND. */
  def claimSetFlags(claims: DataFrame, codeCol: String, dim: DataFrame,
      sets: Seq[(String, String)]): DataFrame = {
    val d = dim.filter(col("value_set_name").isin(sets.map(_._1): _*))
      .select(col("code"), col("value_set_name").as("_vs"))
    claims.join(broadcast(d), col(codeCol) === col("code"))
      .groupBy(col("claim_id"))
      .agg(max(when(col("_vs") === sets.head._1, 1).otherwise(0))
          .as(sets.head._2),
        sets.tail.map { case (n, out) =>
          max(when(col("_vs") === n, 1).otherwise(0)).as(out)
        }: _*)
  }

  /** NULL-tolerant flag test over a left-joined [[claimSetFlags]]
    * column: an unmatched claim (NULL after the left join) reads as
    * not-in-set, mirroring the T-SQL's `IN (subquery)`. */
  def flag(c: String): Column = coalesce(col(c), lit(0)) === 1

  /** The shared episode scaffold behind the ED and inpatient
    * classifiers: left-join each per-source [[claimSetFlags]] frame onto
    * the episode base (on claim_id), evaluate every rule's flag algebra
    * per claim, MAX-roll up per episode, keep only episodes carrying
    * >= 1 indicator (the reference views never materialize
    * indicator-free episodes), and append `pqi_composite` — constant 1
    * after that filter, kept because the reference pivot emits it. */
  def classifyEpisodes(base: DataFrame, episodeCol: String,
      flagFrames: Seq[DataFrame],
      rules: Seq[(String, Column)]): DataFrame = {
    val joined = flagFrames.foldLeft(base)((d, fr) =>
      d.join(fr, Seq("claim_id"), "left"))
    val aggs = rules.map { case (n, c) =>
      max(when(c, 1).otherwise(0)).as(n)
    }
    joined.groupBy(col(episodeCol))
      .agg(aggs.head, aggs.tail: _*)
      .filter(rules.map { case (n, _) => col(n) }.reduce(_ + _) >= 1)
      .select(col(episodeCol) +: rules.map { case (n, _) => col(n) } :+
        lit(1).as("pqi_composite"): _*)
      .orderBy(col(episodeCol))
  }

  /** Episode-level wide pivot (v_mcaid_pqi_ed.sql:269-311): MAX(flag) per
    * (group, episode), explicit-list pivot to pqi_NN columns, plus the
    * any-indicator composite. `rules` carries (value_set_group, claim_id,
    * ed_pophealth_id, flag); `groups` are e.g. "PQI 01". */
  def pqiPivot(rules: DataFrame, groups: Seq[String]): DataFrame = {
    val agg = rules.groupBy(col("value_set_group"),
        col("ed_pophealth_id"))
      .agg(max(col("flag")).as("flag"))
    val wide = agg.groupBy(col("ed_pophealth_id"))
      .pivot(col("value_set_group"), groups)
      .agg(max(col("flag")))
    val outCols = groups.map { g =>
      coalesce(wide(g), lit(0)).as("pqi_" + g.split(" ").last)
    }
    val composite = when(
      groups.map(g => coalesce(wide(g), lit(0))).reduce(_ + _) >= 1, 1)
      .otherwise(0).as("pqi_composite")
    wide.select(col("ed_pophealth_id") +: outCols :+ composite: _*)
  }
}
