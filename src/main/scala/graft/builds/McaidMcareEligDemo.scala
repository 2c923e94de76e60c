package graft.builds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Combined mcaid+mcare elig_demo — the reference's cross-source
  * demographic reconciliation (load_stage.mcaid_mcare_elig_demo.R):
  *
  *   1. crosswalk each source's person-level demo row to the common id
  *      (:39-44) and keep one row per person — deterministic total-order
  *      pick replacing the reference's seeded-random sorter (:47-62);
  *   2. full-outer merge of the two sides (:75-96 + rbindlist :99-101 —
  *      the dual inner join plus both solo appends IS one full outer
  *      join) with per-column precedence: dob prefers mcare when present
  *      (:81-83), gender/race prefer mcaid with mcare filling nulls
  *      (:86-91), single-source columns (death_dt / race_asian_pi from
  *      mcare, lang_* from mcaid) pass through;
  *   3. apde_dual flag (:94, :101) and the race_unk recompute (:110-112)
  *      replicated EXACTLY AS THE R EXECUTES: data.table's
  *      `race_aian==0 & ... & race_asian_pi==0` skips NA rows, so a
  *      person missing any race flag (e.g. every mcaid-solo person,
  *      whose race_asian_pi is NA) can never be marked race_unk — the
  *      NULL-blocking semantics carry over verbatim to Spark/SQL
  *      three-valued logic.
  *
  * Scale: two crosswalk joins + one full-outer join, all equi on the
  * person id; the dedup window shares the same hash partitioning. Person-
  * level frames, one row each side — no skew, no fan-out.
  */
object McaidMcareEligDemo {

  /** One deterministic row per id: total-order the attribute columns
    * (nulls first) and keep row 1. */
  def dedupPerId(df: DataFrame, idCol: String): DataFrame =
    dedupPerKey(df, Seq(idCol))

  /** One deterministic row per key tuple: total-order every non-key
    * column (nulls first) and keep row 1. The shared kernel behind
    * [[dedupPerId]] and [[McaidMcareEligTimevar.dedupPerInterval]] —
    * replaces the reference's seeded random sorters with a pick an
    * oracle can reproduce. */
  def dedupPerKey(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val attrs = df.columns.filterNot(keyCols.contains).toSeq
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(attrs.map(c => col(c).asc_nulls_first): _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Shared demographic columns merged with mcaid-wins precedence. */
  val sharedCols: Seq[String] = Seq("gender_me", "gender_female",
    "gender_male", "race_aian", "race_asian", "race_black", "race_latino",
    "race_nhpi", "race_white", "race_eth_recent")

  /** @param xwalk `id_apde, id_mcaid, id_mcare`
    * @param mcaidDemo `id_mcaid, dob,` [[sharedCols]]`, lang_max`
    * @param mcareDemo `id_mcare, dob,` [[sharedCols]]`, death_dt,
    *   race_asian_pi` */
  def build(xwalk: DataFrame, mcaidDemo: DataFrame,
      mcareDemo: DataFrame): DataFrame = {
    val ma = dedupPerId(
      mcaidDemo.join(xwalk.select(col("id_mcaid"), col("id_apde")),
        "id_mcaid").drop("id_mcaid"),
      "id_apde")
      .withColumn("_has_mcaid", lit(1))
    val mc = dedupPerId(
      mcareDemo.join(xwalk.select(col("id_mcare"), col("id_apde")),
        "id_mcare").drop("id_mcare"),
      "id_apde")
    val mcS = mc.columns.foldLeft(mc) { (d, c) =>
      if (c == "id_apde") d else d.withColumnRenamed(c, s"${c}_mcare")
    }.withColumn("_has_mcare", lit(1))
    val merged = ma.join(mcS, Seq("id_apde"), "full_outer")
    val withShared = sharedCols.foldLeft(merged) { (d, c) =>
      d.withColumn(c, coalesce(col(c), col(s"${c}_mcare")))
        .drop(s"${c}_mcare")
    }
    val zero = (c: String) => col(c) === 0
    withShared
      .withColumn("dob", coalesce(col("dob_mcare"), col("dob")))
      .drop("dob_mcare")
      .withColumnRenamed("death_dt_mcare", "death_dt")
      .withColumnRenamed("race_asian_pi_mcare", "race_asian_pi")
      .withColumn("apde_dual",
        when(col("_has_mcaid") === 1 && col("_has_mcare") === 1, 1)
          .otherwise(0))
      // NULL anywhere blocks the recompute (the R data.table semantics)
      .withColumn("race_unk",
        when(Seq("race_aian", "race_asian", "race_asian_pi", "race_black",
            "race_latino", "race_nhpi", "race_white").map(zero)
            .reduce(_ && _), 1)
          .otherwise(0))
      .drop("_has_mcaid", "_has_mcare")
      .select(col("id_apde"), col("dob"), col("death_dt"),
        col("gender_me"), col("gender_female"), col("gender_male"),
        col("race_aian"), col("race_asian"), col("race_asian_pi"),
        col("race_black"), col("race_latino"), col("race_nhpi"),
        col("race_white"), col("race_unk"), col("race_eth_recent"),
        col("lang_max"), col("apde_dual"))
  }
}
