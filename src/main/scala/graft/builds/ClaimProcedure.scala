package graft.builds

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** claim_procedure normalization (load_stage.mcaid_claim_procedure.R:60-130):
  * a raw claim row carries 12 procedure-code slots plus 4 modifier slots;
  * both families unpivot to one row per (claim, slot), labeled '01'..'12'
  * for procedures and 'M1'..'M4' for modifiers, with blank slots dropped,
  * codes upper-cased/trimmed, and the exploded rows DISTINCTed.
  *
  * Scale: two shuffle-free `stack()` generates unioned; one partial-agg
  * DISTINCT exchange at the end.
  */
object ClaimProcedure {

  def build(wide: DataFrame, claimCols: Seq[String],
      procSlots: Seq[(String, String)],
      modSlots: Seq[(String, String)]): DataFrame = {
    def unpivot(slots: Seq[(String, String)]): DataFrame = {
      val stackExpr = s"stack(${slots.size}, " +
        slots.map { case (label, c) => s"'$label', $c" }.mkString(", ") +
        ") as (pcode_number, pcode_raw)"
      wide.select(claimCols.map(col) :+ expr(stackExpr): _*)
    }
    unpivot(procSlots).unionByName(unpivot(modSlots))
      .filter(col("pcode_raw").isNotNull && trim(col("pcode_raw")) =!= "")
      .withColumn("pcode", upper(trim(col("pcode_raw"))))
      .drop("pcode_raw")
      .distinct()
  }
}
