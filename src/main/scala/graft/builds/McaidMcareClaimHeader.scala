package graft.builds

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Intervals

/** Combined mcaid + mcare claim_header — the reference's cross-source
  * analytic union (load_stage.mcaid_mcare_claim_header.R):
  *
  *  step 1  each source maps to the shared person id through its
  *          crosswalk (left join — claims of un-crosswalked persons keep
  *          a NULL id_apde, exactly like the reference), source columns
  *          NULL-pad across the drift, UNION distinct;
  *  step 2  Yale ED carrier/outpatient/inpatient flags re-derived from
  *          the claim type (:172-175);
  *  step 3  the Yale ED population-health episode ids are RE-CLUSTERED
  *          over the COMBINED per-person timeline (:227-330) — a mcaid
  *          and a mcare ED visit within 1 day of each other merge into
  *          one episode, which per-source ids cannot express. The
  *          reference's LAG(first_service_date)/increment/running-sum
  *          is [[Intervals.islandIds]] on the first-service date; its
  *          global DENSE_RANK surrogate is deliberately the
  *          (id_apde, episode_seq) composite (SURVEY §7.5.1).
  *
  * Scale: two broadcast crosswalk joins, one union DISTINCT shuffle, one
  * person-keyed island pass over the ED sliver, one (source, claim) join
  * back. Nothing shuffles the full union twice.
  *
  * mcaid carries (id_mcaid, claim_id, first/last_service_date,
  * claim_type_id, ed_pophealth_flag, ...drift cols); mcare the same with
  * id_mcare; crosswalks carry (source id, id_apde).
  */
object McaidMcareClaimHeader {

  def build(mcaid: DataFrame, mcare: DataFrame, xwalkMcaid: DataFrame,
      xwalkMcare: DataFrame): DataFrame = {
    val unioned = McaidMcareClaimDetail.xwalkUnion(
      mcaid, mcare, xwalkMcaid, xwalkMcare)
    val typed = unioned.withColumn("ed_type",
      when(col("ed_pophealth_flag") === 1 && col("claim_type_id") === 5,
        "Carrier")
        .when(col("ed_pophealth_flag") === 1 && col("claim_type_id") === 4,
          "Outpatient")
        .when(col("ed_pophealth_flag") === 1 && col("claim_type_id") === 1,
          "Inpatient"))
    // un-crosswalked claims (NULL id_apde) are EXCLUDED from clustering:
    // a NULL partition would chain unrelated people's visits into shared
    // episodes AND form the one giant hot partition GlobalWindowGuard
    // exists to reject — the T-SQL reference shares both defects (its
    // PARTITION BY groups NULLs too); those claims keep a NULL episode
    // seq instead, losing nothing linkable
    val ed = typed.filter(col("ed_type").isNotNull && col("id_apde").isNotNull)
      .select(col("id_apde"), col("source_desc"), col("claim_id"),
        col("first_service_date"))
    // the reference measures the 1-day match window between consecutive
    // FIRST service dates (:238-246), so the island runs on that column
    val epi = Intervals.islandIds(ed, Seq("id_apde"),
        "first_service_date", "first_service_date", maxGapDays = 1,
        tieBreak = Seq("claim_id"))
      .withColumnRenamed("island_id", "ed_pophealth_seq")
      .select(col("source_desc"), col("claim_id"), col("ed_pophealth_seq"))
    typed.join(epi, Seq("source_desc", "claim_id"), "left")
  }
}
