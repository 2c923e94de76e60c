package graft.builds

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Comorbidity reference tables and scores — the reference's
  * ref.comorb_cond_lookup / ref.comorb_dx_lookup family
  * (ref/tables/load_ref.comorb_ref_tables.sql:1-1134): a curated
  * condition dimension carrying the Elixhauser, Charlson, and Gagne
  * index weights (Quan et al. 2005 / Gagne et al. 2011 — public
  * coding algorithms), a dx-prefix mapping per (condition, ICD
  * version), and the scores a claims cohort derives from them:
  * per-person condition flags via the prefix match, then the three
  * weighted sums over DISTINCT conditions.
  *
  * The condition list here is a representative slice of the
  * reference's 40-row dimension (weights verbatim from the published
  * indices); the full list is data, not logic — every kernel below is
  * width-independent.
  *
  * Scale shape: the dx-prefix dimension is dozens of rows — a
  * broadcast theta join (startsWith, the §2.3 LIKE-prefix kernel)
  * against the diagnosis fact; flags reduce map-side to (person,
  * cond) grain before the weighted rollup, so the only exchange is
  * the person hash at the output grain.
  */
object Comorbidity {

  /** (cond_id, short_name, elixhauser_wgt, charlson_wgt, gagne_wgt,
    * icd9 prefixes, icd10 prefixes). Weights NULL where the index does
    * not include the condition — exactly the reference's NULLs. */
  case class CondDef(condId: Int, shortName: String,
      elix: Option[Int], charlson: Option[Int], gagne: Option[Int],
      icd9: Seq[String], icd10: Seq[String])

  /** Slice of load_ref.comorb_ref_tables.sql:17-60 with the Quan 2005
    * ICD prefix families (:70-1100) and the published weights. */
  val Conditions: Seq[CondDef] = Seq(
    CondDef(1, "CHF", Some(1), Some(1), Some(2),
      Seq("39891", "428"), Seq("I50", "I099")),
    CondDef(2, "Arrhythmia", Some(1), None, Some(1),
      Seq("4273"), Seq("I48", "I49")),
    CondDef(5, "PVD", Some(1), Some(1), Some(1),
      Seq("440", "441"), Seq("I70", "I71")),
    CondDef(10, "COPD", Some(1), Some(1), Some(1),
      Seq("491", "492", "496"), Seq("J44")),
    CondDef(11, "DiabU_El", Some(1), None, Some(0),
      Seq("2500"), Seq("E119")),
    CondDef(12, "DiabC_El", Some(1), None, Some(1),
      Seq("2504", "2505"), Seq("E112")),
    CondDef(17, "RenalFail", Some(1), Some(2), Some(2),
      Seq("585"), Seq("N18")),
    CondDef(19, "Mets", Some(1), Some(6), Some(5),
      Seq("196", "197"), Seq("C77", "C78")),
    CondDef(23, "Depression", Some(1), None, Some(1),
      Seq("2962", "311"), Seq("F32", "F33")),
    CondDef(25, "HIV", Some(1), Some(6), Some(1),
      Seq("042"), Seq("B20")))

  /** ref.comorb_cond_lookup: the condition dimension with weights. */
  def condLookup(s: SparkSession): DataFrame = {
    import s.implicits._
    Conditions.map(c => (c.condId, c.shortName,
        c.elix.map(_.toString).orNull,
        c.charlson.map(_.toString).orNull,
        c.gagne.map(_.toString).orNull))
      .toDF("cond_id", "short_name", "elix_s", "charl_s", "gagne_s")
      .select(col("cond_id"), col("short_name"),
        col("elix_s").cast("int").as("elixhauser_wgt"),
        col("charl_s").cast("int").as("charlson_wgt"),
        col("gagne_s").cast("int").as("gagne_wgt"))
  }

  /** ref.comorb_dx_lookup: one row per (cond, icdcm version, prefix). */
  def dxLookup(s: SparkSession): DataFrame = {
    import s.implicits._
    Conditions.flatMap { c =>
      c.icd9.map(p => (c.condId, 9, p)) ++
        c.icd10.map(p => (c.condId, 10, p))
    }.toDF("cond_id", "icdcm_version", "dx_prefix")
  }

  /** Person-level condition flags: diagnosis rows prefix-matched
    * against the broadcast dx dimension, reduced to DISTINCT
    * (person, cond). */
  def flags(dx: DataFrame, idCol: String): DataFrame = {
    val s = dx.sparkSession
    val ref = broadcast(dxLookup(s))
    dx.join(ref,
        dx("icdcm_version") === ref("icdcm_version") &&
          dx("icdcm_norm").startsWith(ref("dx_prefix")))
      .select(col(idCol), col("cond_id"))
      .distinct()
  }

  /** The three index scores per person: weights summed over the
    * person's distinct conditions (absent conditions contribute 0; a
    * NULL weight means the index excludes the condition). */
  def scores(dx: DataFrame, idCol: String): DataFrame = {
    val s = dx.sparkSession
    flags(dx, idCol)
      .join(broadcast(condLookup(s)), Seq("cond_id"))
      .groupBy(col(idCol))
      .agg(
        coalesce(sum(col("elixhauser_wgt")), lit(0L))
          .as("elixhauser_score"),
        coalesce(sum(col("charlson_wgt")), lit(0L)).as("charlson_score"),
        coalesce(sum(col("gagne_wgt")), lit(0L)).as("gagne_score"),
        count(lit(1)).as("n_conditions"))
  }
}
