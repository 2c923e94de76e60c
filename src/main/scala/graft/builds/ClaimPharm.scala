package graft.builds

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** claim_pharm normalization (load_stage.mcaid_claim_pharm.R:59-69): the
  * raw pharmacy feed carries NDC codes and day-supply counts as free-text
  * strings; the build validates the NDC shape (11-digit numeric), guards
  * every numeric cast with an ISNUMERIC-style try_cast, and clamps the
  * day-supply to its documented domain — invalid values become NULL, rows
  * are never silently dropped (the QA layer counts them).
  *
  * Scale: pure row-local Column expressions — no shuffle at all; the
  * try_cast path stays inside WholeStageCodegen (no UDF).
  */
object ClaimPharm {

  /** @param raw frame with `ndc_raw` and `supply_days_raw` string columns;
    *            all other columns pass through untouched. */
  def build(raw: DataFrame, supplyDomain: (Int, Int) = (0, 365)): DataFrame =
    raw
      .withColumn("ndc",
        when(col("ndc_raw").rlike("^[0-9]{11}$"), col("ndc_raw")))
      .withColumn("ndc_valid", col("ndc").isNotNull)
      .withColumn("supply_days_cast", expr("try_cast(supply_days_raw AS INT)"))
      .withColumn("supply_days",
        when(col("supply_days_cast").between(supplyDomain._1, supplyDomain._2),
          col("supply_days_cast")))
      .drop("ndc_raw", "supply_days_raw", "supply_days_cast")
}
