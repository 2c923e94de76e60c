package graft.builds

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Medicare identity-crosswalk staging — the bene↔SSN pick and the EDB
  * user-view name dedup (load_stage.mcare_xwalk_bene_ssn.R,
  * load_stage.mcare_xwalk_edb_user_view.R).
  */
object McareXwalk {

  /** bene_ssn (:49-57): DISTINCT, then the first (source, ssn) row per
    * bene_id — the reference's setorder + counter==1, i.e. the q25
    * dedup-to-row-1 kernel with a two-column tie-break. */
  def ssnPick(ssn: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("bene_id"))
      .orderBy(col("source"), col("ssn"))
    ssn.distinct()
      .withColumn("counter", row_number().over(w))
      .filter(col("counter") === 1)
      .select(col("bene_id"), col("ssn"))
  }

  /** edb_user_view (:52-77): collapse the per-year name history to ONE
    * row per bene_id in the reference's three branches:
    *
    *  - singleton ids pass through;
    *  - ids whose rows are identical except (crnt_rec_ind, source) —
    *    `id.dup == exact.dup`, a per-row test that is provably per-id —
    *    keep the max-source row (crnt_rec_ind only flips Y→N, so the
    *    most recent is the one of interest);
    *  - all other duplicated ids: forward-fill the middle initial from
    *    older years (the data.table cumsum-group fill ≡ last non-null
    *    over source ascending), then keep the max-source row.
    *
    * Scale: one DISTINCT exchange, then every window partitions on
    * bene_id (or bene_id + names), so the branch split, fill and pick
    * all ride the same person-keyed clustering.
    */
  def edbDedup(edb: DataFrame): DataFrame = {
    val names = Seq("bene_srnm_name", "bene_gvn_name", "bene_mdl_name")
    val d = edb.distinct()
    val wId = Window.partitionBy(col("bene_id"))
    val wExact = Window.partitionBy(
      (col("bene_id") +: names.map(col)): _*)
    val flagged = d
      .withColumn("id_dup", count(lit(1)).over(wId))
      .withColumn("exact_dup", count(lit(1)).over(wExact))
    val out = (df: DataFrame) => df.select(col("bene_srnm_name"),
      col("bene_gvn_name"), col("bene_mdl_name"), col("crnt_rec_ind"),
      col("bene_id"))

    val nodup = out(flagged.filter(col("id_dup") === 1))

    // source DESC alone leaves same-source duplicates order-unstable
    // (R's which.max keeps physical order, which data.table inherits
    // from load order — unspecified); the full-column tie-break is the
    // evident deterministic intent, same discipline as the q171 modal
    // geocode pick
    val wPick = Window.partitionBy(col("bene_id"))
      .orderBy(col("source").desc, col("bene_srnm_name"),
        col("bene_gvn_name"), col("bene_mdl_name"), col("crnt_rec_ind"))
    val exact = out(flagged
      .filter(col("id_dup") > 1 && col("id_dup") === col("exact_dup"))
      .withColumn("rk", row_number().over(wPick))
      .filter(col("rk") === 1))

    val wFill = Window.partitionBy(col("bene_id")).orderBy(col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val others = out(flagged
      .filter(col("id_dup") > 1 && col("id_dup") =!= col("exact_dup"))
      .withColumn("bene_mdl_name",
        last(col("bene_mdl_name"), ignoreNulls = true).over(wFill))
      .withColumn("rk", row_number().over(wPick))
      .filter(col("rk") === 1))

    nodup.unionByName(exact).unionByName(others)
  }
}
