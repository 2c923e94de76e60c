package graft.builds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** mcare claim_procedure — procedure codes reshaped to long
  * (load_stage.mcare_claim_procedure.R:20-1254). Nine arms, each a
  * claims↔lines join with a per-filetype feature matrix:
  *
  * | filetype     | mods | blank-fold | BETOS | ICD-PCS | denial   |
  * |--------------|------|------------|-------|---------|----------|
  * | carrier      | 2    | no         | yes   | no      | carrier  |
  * | dme          | 4    | no         | yes   | no      | carrier  |
  * | hha          | 3    | YES        | no    | no      | facility |
  * | hospice      | 3    | YES        | no    | no      | facility |
  * | inpatient    | 3    | no         | no    | yes     | facility |
  * | inpatient_j  | 0    | —          | no    | yes     | facility |
  * | outpatient   | 4    | no         | no    | yes     | facility |
  * | outpatient_j | 2    | no         | no    | yes     | facility |
  * | snf          | 3    | no         | no    | yes     | facility |
  *
  * Per arm the reference reads its base CTE 2-4 times (modifier UNPIVOT,
  * no-modifier residual, BETOS pull, ICD-PCS UNPIVOT) and UNION-distincts
  * the branches. Here each arm is ONE pass: every row generates an array
  * of (procedure_code, modifier_code) pairs —
  *  - HCPCS non-null: one pair per NON-NULL modifier (T-SQL UNPIVOT
  *    drops NULLs; a literal `' '` modifier SURVIVES except in the
  *    hha/hospice arms, which fold `' '` to NULL in the base CTE —
  *    reference :284-286, kept per-arm);
  *  - HCPCS non-null and ALL modifiers NULL: the (hcpcs, NULL) residual;
  *  - BETOS non-null: (betos, NULL), independent of HCPCS;
  *  - each ICD-PCS slot that is non-NULL and not `' '`: (pc, NULL) —
  * then explodes it. The final UNION distinct collapses exactly what the
  * reference's per-branch DISTINCTs did; the enrollment gate (applied
  * LAST in the reference, :1243-1254) is a LEFT SEMI that commutes with
  * the distinct and so runs before it to shrink the only wide shuffle.
  *
  * Scale: per arm one claim-keyed join; the explode is a codegen'd
  * Generate (no shuffle); one bene-keyed semi; one distinct exchange.
  */
object McareClaimProcedure {

  /** Per-arm feature matrix row. `mods`/`betos`/`pcs` name columns of
    * the gated frame; blankFold replicates the hha/hospice `' '`→NULL
    * CASE. */
  case class ArmSpec(filetype: String, mods: Seq[String],
      blankFold: Boolean, betos: Option[String], pcs: Seq[String])

  private val nullStr = lit(null).cast("string")
  private val pairType = "array<struct<procedure_code:string,modifier_code:string>>"

  /** One arm, one scan: gated = claims⟕lines with the arm's denial rule
    * already applied; needs bene_id, clm_id, clm_from_dt, clm_thru_dt,
    * pchcpcs, and the spec's modifier/betos/pc columns. */
  def arm(gated: DataFrame, spec: ArmSpec): DataFrame = {
    val hc = col("pchcpcs")
    val empty = array().cast(pairType)
    def pair(p: Column, m: Column) =
      struct(p.as("procedure_code"), m.as("modifier_code"))
    val mods = spec.mods.map { c =>
      if (spec.blankFold) when(col(c) === " ", nullStr).otherwise(col(c))
      else col(c)
    }
    val hcArr =
      if (mods.isEmpty)
        when(hc.isNotNull, array(pair(hc, nullStr))).otherwise(empty)
      else {
        val withMods = filter(array(mods.map(m => pair(hc, m)): _*),
          s => s.getField("modifier_code").isNotNull)
        when(hc.isNull, empty)
          .when(mods.map(_.isNull).reduce(_ && _),
            array(pair(hc, nullStr)))
          .otherwise(withMods)
      }
    val betosArr = spec.betos.map { b =>
      when(col(b).isNotNull, array(pair(col(b), nullStr))).otherwise(empty)
    }.getOrElse(empty)
    val pcArr =
      if (spec.pcs.isEmpty) empty
      else filter(array(spec.pcs.map(c => pair(col(c), nullStr)): _*),
        s => s.getField("procedure_code").isNotNull &&
          s.getField("procedure_code") =!= " ")
    gated
      .select(
        trim(col("bene_id")).as("id_mcare"),
        trim(col("clm_id")).as("claim_header_id"),
        col("clm_from_dt").cast("date").as("first_service_date"),
        col("clm_thru_dt").cast("date").as("last_service_date"),
        lit(spec.filetype).as("filetype_mcare"),
        explode(concat(hcArr, betosArr, pcArr)).as("pair"))
      .select(col("id_mcare"), col("claim_header_id"),
        col("first_service_date"), col("last_service_date"),
        col("pair.procedure_code").as("procedure_code"),
        col("pair.modifier_code").as("modifier_code"),
        col("filetype_mcare"))
  }

  /** Union the exploded arms, enrollment semi, distinct. */
  def build(arms: Seq[DataFrame], enroll: DataFrame): DataFrame =
    arms.reduce(_ unionByName _)
      .join(enroll.select(trim(col("bene_id")).as("id_mcare")).distinct(),
        Seq("id_mcare"), "left_semi")
      .distinct()
}
