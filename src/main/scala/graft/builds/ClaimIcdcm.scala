package graft.builds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** claim_icdcm_header normalization — the reference's wide→long diagnosis
  * build (load_stage.mcaid_claim_icdcm_header.R): one raw claim row carries
  * 13 dx slot columns; the build unpivots them to one row per (claim, dx
  * slot), drops empty slots, normalizes the code, infers the ICD version,
  * and DISTINCTs the exploded rows (:67).
  *
  * Normalization follows the reference's T-SQL exactly (:76-97):
  *   - codes starting with a digit are ICD-9 and are RIGHT-zero-padded to 5
  *     when (and only when) they are 3 or 4 chars ('250'→'25000',
  *     '2500'→'25000'); 1-2 and 5+ char codes pass through unchanged;
  *   - 'E'/'V'-prefixed codes are ambiguous between ICD-9 e/v-codes and
  *     ICD-10 chapters; the reference disambiguates on service date —
  *     ICD-9 (and right-padded) only when last_service_date < 2015-10-01,
  *     the US ICD-10-CM cutover; on/after that date they are ICD-10 and
  *     pass through untouched;
  *   - everything else is ICD-10, untouched.
  *
  * Scale: `stack()` is a per-row Generate inside WholeStageCodegen — the
  * explode itself never shuffles; the only exchange is the final DISTINCT,
  * which partial-aggregates map-side so shuffle volume is distinct
  * (claim, slot, code) rows, not slots × claims.
  */
object ClaimIcdcm {

  /** US ICD-10-CM cutover: E/V-prefixed codes dated before this are ICD-9. */
  val Icd10Cutover = "2015-10-01"

  private def isIcd9(raw: Column, serviceDate: Column): Column =
    raw.rlike("^[0-9]") ||
      (raw.rlike("^[EV]") && serviceDate < to_date(lit(Icd10Cutover)))

  /** @param wide      one row per claim, one column per dx slot
    * @param claimCols identity columns carried through the unpivot
    * @param slots     (slot label, wide column name) pairs, e.g.
    *                  ("01", "dx01") … ("admit", "dx_admit")
    * @param dateCol   service-date column gating the E/V ICD-9 window
    *                  (reference uses last_service_date)
    */
  def build(wide: DataFrame, claimCols: Seq[String],
      slots: Seq[(String, String)],
      dateCol: String = "last_service_date"): DataFrame = {
    val stackExpr = s"stack(${slots.size}, " +
      slots.map { case (label, c) => s"'$label', $c" }.mkString(", ") +
      ") as (icdcm_number, icdcm_raw)"
    val carried = (claimCols :+ dateCol).distinct.map(col)
    val raw = col("icdcm_raw")
    val icd9 = isIcd9(raw, col(dateCol))
    wide
      .select(carried :+ expr(stackExpr): _*)
      .filter(raw.isNotNull && trim(raw) =!= "")
      .withColumn("icdcm_raw", upper(trim(raw)))
      .withColumn("icdcm_version", when(icd9, lit(9)).otherwise(lit(10)))
      .withColumn("icdcm_norm",
        when(icd9 && length(raw).between(3, 4), rpad(raw, 5, "0"))
          .otherwise(raw))
      .distinct()
  }
}
