package graft.builds

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** claim_icdcm_header normalization — the reference's wide→long diagnosis
  * build (load_stage.mcaid_claim_icdcm_header.R): one raw claim row carries
  * 13 dx slot columns; the build unpivots them to one row per (claim, dx
  * slot), drops empty slots, normalizes the code (ICD-9 numeric codes
  * zero-padded to 5 — :76-88; E/V-prefixed ICD-9 e-codes padded after the
  * letter), infers the ICD version from the code shape (:89-97), and
  * DISTINCTs the exploded rows (:67).
  *
  * Scale: `stack()` is a per-row Generate inside WholeStageCodegen — the
  * explode itself never shuffles; the only exchange is the final DISTINCT,
  * which partial-aggregates map-side so shuffle volume is distinct
  * (claim, slot, code) rows, not slots × claims.
  */
object ClaimIcdcm {

  private val numeric = "^[0-9]+$"
  private val eCode = "^[EV][0-9]+$"

  /** @param wide      one row per claim, one column per dx slot
    * @param claimCols identity columns carried through the unpivot
    * @param slots     (slot label, wide column name) pairs, e.g.
    *                  ("01", "dx01") … ("admit", "dx_admit")
    */
  def build(wide: DataFrame, claimCols: Seq[String],
      slots: Seq[(String, String)]): DataFrame = {
    val stackExpr = s"stack(${slots.size}, " +
      slots.map { case (label, c) => s"'$label', $c" }.mkString(", ") +
      ") as (icdcm_number, icdcm_raw)"
    wide
      .select(claimCols.map(col) :+ expr(stackExpr): _*)
      .filter(col("icdcm_raw").isNotNull && trim(col("icdcm_raw")) =!= "")
      .withColumn("icdcm_raw", upper(trim(col("icdcm_raw"))))
      .withColumn("icdcm_version",
        when(col("icdcm_raw").rlike(numeric) ||
          col("icdcm_raw").rlike(eCode), lit(9)).otherwise(lit(10)))
      .withColumn("icdcm_norm",
        when(col("icdcm_raw").rlike(numeric), lpad(col("icdcm_raw"), 5, "0"))
          .when(col("icdcm_raw").rlike(eCode),
            concat(substring(col("icdcm_raw"), 1, 1),
              lpad(substring(col("icdcm_raw"), 2, 10), 3, "0")))
          .otherwise(col("icdcm_raw")))
      .distinct()
  }
}
