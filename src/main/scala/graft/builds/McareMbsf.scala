package graft.builds

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** stage.mcare_mbsf — the combined MBSF AB/ABCD staging load
  * (load_stage.mcare_mbsf.r:38-142):
  *
  *  step 2 (:38-49)  year-level incremental gate: per-source raw
  *         (year, count) pairs are matched against the staged table's
  *         (year, count) pairs; a year re-loads when EITHER it is absent
  *         from stage OR its count drifted (the reference's
  *         merge-on-both-columns + `is.na(stage)` filter);
  *  step 3 (:52-88)  AB years: SELECT DISTINCT, rename drifted columns
  *         to the ABCD names (config rename_ab_abcd), ZIP fix —
  *         '999999999' → NULL, then first 5 chars;
  *  step 4 (:91-122) ABCD years: SELECT DISTINCT, drop the redundant
  *         data_year, ZIP fix — '99999' → NULL, then zero-pad the
  *         numeric ZIP to 5 digits;
  *  step 5 (:125-127) drift union (rbindlist fill=TRUE ≡ unionByName
  *         allowMissingColumns — NULL-pad either side);
  *  step 6 (:130-142) case-insensitive duplicate detection: Medicare
  *         ids are case sensitive, so a row duplicated on EVERY column
  *         except the original-case bene_id (i.e. keyed on
  *         lower(bene_id) + payload) is a suspected duplicate; the
  *         reference halts the load — here the flag is emitted as a
  *         `dup` column so the gate is data, not a crash.
  *
  * Divergence noted: R's `formatC(as.numeric(zip))` renders NA as the
  * literal string "NA"; the evident intent (NULL stays NULL) is
  * implemented instead, as with [[ClaimNaloxone]]'s dead 'G2216 '
  * branch.
  *
  * Scale: the year gates are tiny aggregates (one partial-agg scan per
  * source, dozens of rows out) broadcast back as semi-join filters; the
  * per-source DISTINCT is the one wide exchange each; the dup window
  * partitions on (lower(bene_id), payload) — the same key the DISTINCT
  * already clustered.
  */
object McareMbsf {

  /** Year-level incremental gate: raw years whose (year, count) pair is
    * not matched in stage (absent OR count drift). */
  def newYears(raw: DataFrame, stage: DataFrame,
      yearCol: String = "bene_enrollmt_ref_yr"): DataFrame = {
    val rawC = raw.groupBy(col(yearCol)).count()
    val stgC = stage.groupBy(col(yearCol)).count()
    rawC.join(stgC, Seq(yearCol, "count"), "left_anti")
      .select(col(yearCol))
  }

  /** @param ab       load_raw.mcare_mbsf_ab rows (AB-era column names)
    * @param abcd     load_raw.mcare_mbsf_abcd rows (may carry
    *                 data_year, dropped)
    * @param stage    current stage.mcare_mbsf (year counts only are
    *                 read)
    * @param renameAb AB → ABCD column renames (config rename_ab_abcd)
    */
  def build(ab: DataFrame, abcd: DataFrame, stage: DataFrame,
      renameAb: Map[String, String]): DataFrame = {
    val yc = "bene_enrollmt_ref_yr"

    val abNew = ab
      .join(broadcast(newYears(ab, stage)), Seq(yc), "left_semi")
      .distinct()
    val abRenamed = renameAb.foldLeft(abNew) { case (df, (from, to)) =>
      df.withColumnRenamed(from, to) }
    val abFixed = abRenamed.withColumn("zip_cd",
      substring(when(col("zip_cd") === "999999999", null)
        .otherwise(col("zip_cd")), 1, 5))

    val abcdNew = abcd
      .join(broadcast(newYears(abcd, stage)), Seq(yc), "left_semi")
      .distinct()
      .drop("data_year")
      .withColumn("zip_cd",
        lpad(when(col("zip_cd") === "99999", null)
          .otherwise(col("zip_cd")).cast("int").cast("string"), 5, "0"))

    val combined = abcdNew.unionByName(abFixed,
      allowMissingColumns = true)

    // case-insensitive duplicate detection: partition on every column
    // except the original-case bene_id, with lower(bene_id) standing in
    val payload = combined.columns.filter(_ != "bene_id").map(col)
    val w = Window.partitionBy(lower(col("bene_id")) +: payload: _*)
    combined.withColumn("dup", count(lit(1)).over(w) > 1)
  }
}
