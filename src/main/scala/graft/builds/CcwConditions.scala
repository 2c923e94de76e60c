package graft.builds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CCW chronic-condition identification — the reference's revised
  * source-generic load_ccw build (scripts_general/load_ccw.R, the
  * first/last-encounter formulation), instantiated for the combined
  * mcaid+mcare source at id_apde grain
  * (load_stage.mcaid_mcare_claim_ccw.yaml).
  *
  * Per condition and ICD version (load_ccw.R:346-505 header_load):
  * diagnosis rows restricted to the arm's `dx_fields` ('1' = primary
  * only, '1-2', 'any') join the wide icdcm reference on (code, version)
  * where the condition's `ccw_<abbrev>` flag is 1; claims carrying any
  * exclusion-flagged dx (its own per-arm fields restriction, over dx
  * rows of EVERY version — the reference's exclusion subquery has no
  * version filter) are dropped; surviving claims classify as
  * condition-1 (claim types that qualify alone) and/or condition-2
  * (claim types that need a second within the lookback), each carrying
  * first_service_date.
  *
  * ccw_load (:560-640): arms UNION-distinct; per person ordered by
  * condition_2_from_date (T-SQL NULLs first) the lead/lag day AND
  * month diffs are computed — datediff(month) is BOUNDARY counting,
  * `(y2*12+m2)-(y1*12+m1)`, not months_between; claim-count rule 1
  * keeps condition-1 rows, rule 2 additionally keeps condition-2 rows
  * with a neighbor inside `lookback_months` (the VERSION-10 config's
  * value drives the filter, load_ccw.R:585-590) and at least 1 day
  * away; collapse to per-person min/max; LEAST/GREATEST across the two
  * condition types.
  *
  * Scale shape vs the reference's per-condition loop (~2 scans of the
  * dx table per condition): the condition AND exclusion evidence for
  * EVERY condition is reduced in ONE icdcm-scan claim-level aggregation
  * (the wide ref broadcasts; flags are per-arm masked inside the agg),
  * and every per-condition pipeline hangs off that one frame — Spark's
  * ReusedExchange serves the shared rollup to all conditions, so the
  * fact scan count stays 1 regardless of config size. The only other
  * exchanges are the header join (claim-keyed) and the per-(person)
  * window + collapse, person-keyed.
  */
object CcwConditions {

  /** One ICD-version arm of a condition config. */
  case class CcwArm(run: Boolean, dxFields: String,
    exclude1Fields: String = "any", exclude2Fields: String = "any")

  /** A condition config (the cond_* YAML blocks). `lookbackMonths` is
    * the version-10 value — the one the claim-count filter uses. */
  case class CcwDef(code: Int, desc: String, abbrev: String,
      claimCount: Int, lookbackMonths: Int,
      dxClaim1: Seq[Int], dxClaim2: Seq[Int],
      exclude1: Option[String], exclude2: Option[String],
      icd9: CcwArm, icd10: CcwArm) {
    def flagCol: String = s"ccw_$abbrev"
  }

  private def fieldsPred(fields: String): Column = fields match {
    case "1" => col("icdcm_number") === "01"
    case "1-2" | "1;2" => col("icdcm_number").isin("01", "02")
    case _ => lit(true)
  }

  /** One-scan claim-level rollup: for every condition, per-arm matched
    * flags (m9/m10) and per-arm exclusion flags (x9/x10, claim-wide
    * over all versions). */
  def claimFlags(icdcm: DataFrame, icdcmRef: DataFrame,
      conds: Seq[CcwDef], idCol: String): DataFrame = {
    val joined = icdcm.join(broadcast(icdcmRef),
      icdcm("icdcm_norm") === icdcmRef("icdcm") &&
        icdcm("icdcm_version") === icdcmRef("icdcm_version"))
    def armFlag(c: CcwDef, v: Int, arm: CcwArm): Column =
      max(when(col(c.flagCol) === 1 && icdcm("icdcm_version") === v &&
        lit(arm.run) && fieldsPred(arm.dxFields), 1).otherwise(0))
        .as(s"m${v}_${c.abbrev}")
    def exclFlag(c: CcwDef, v: Int, flag: String, fields: String,
        n: Int): Column =
      max(when(col(flag) === 1 && fieldsPred(fields), 1).otherwise(0))
        .as(s"x$n${v}_${c.abbrev}")
    val aggs: Seq[Column] = conds.flatMap { c =>
      Seq(armFlag(c, 9, c.icd9), armFlag(c, 10, c.icd10)) ++
        c.exclude1.toSeq.flatMap(f => Seq(
          exclFlag(c, 9, f, c.icd9.exclude1Fields, 1),
          exclFlag(c, 10, f, c.icd10.exclude1Fields, 1))) ++
        c.exclude2.toSeq.flatMap(f => Seq(
          exclFlag(c, 9, f, c.icd9.exclude2Fields, 2),
          exclFlag(c, 10, f, c.icd10.exclude2Fields, 2)))
    }
    joined.groupBy(icdcm(idCol).as(idCol), col("claim_header_id"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** T-SQL datediff(month): month-boundary count. */
  private def monthDiff(a: Column, b: Column): Column =
    (year(b) * 12 + month(b)) - (year(a) * 12 + month(a))

  /** Full build. `header`: (idCol, claim_header_id, claim_type_id,
    * first_service_date); `icdcm`: (idCol, claim_header_id, icdcm_norm,
    * icdcm_version, icdcm_number); `icdcmRef`: wide flag table (icdcm,
    * icdcm_version, ccw_* ...). Output: (idCol, first_encounter_date,
    * last_encounter_date, ccw_code, ccw_desc). */
  def build(header: DataFrame, icdcm: DataFrame, icdcmRef: DataFrame,
      conds: Seq[CcwDef], idCol: String = "id_apde"): DataFrame = {
    val id = col(idCol)
    val flags = claimFlags(icdcm, icdcmRef, conds, idCol)
    // header payload joins the claim-level flag frame once (claim-keyed);
    // the flag frame's id is authoritative on the diag side, matching the
    // reference's right join (header attributes looked up per claim)
    val withHeader = flags.join(
      header.select(col("claim_header_id"), col("claim_type_id"),
        col("first_service_date")),
      Seq("claim_header_id"), "left")

    val perCond = conds.map { c =>
      def armRows(v: Int): DataFrame = {
        val excl1Ok = c.exclude1.map(_ =>
          col(s"x1${v}_${c.abbrev}") === 0).getOrElse(lit(true))
        val excl2Ok = c.exclude2.map(_ =>
          col(s"x2${v}_${c.abbrev}") === 0).getOrElse(lit(true))
        withHeader
          .filter(col(s"m${v}_${c.abbrev}") === 1 && excl1Ok && excl2Ok &&
            (col("claim_type_id").isin(c.dxClaim1: _*) ||
              col("claim_type_id").isin(c.dxClaim2: _*)))
          .select(id,
            col("first_service_date"),
            when(col("claim_type_id").isin(c.dxClaim1: _*), 1)
              .otherwise(0).as("condition1"),
            when(col("claim_type_id").isin(c.dxClaim2: _*), 1)
              .otherwise(0).as("condition2"),
            when(col("claim_type_id").isin(c.dxClaim1: _*),
              col("first_service_date")).as("condition_1_from_date"),
            when(col("claim_type_id").isin(c.dxClaim2: _*),
              col("first_service_date")).as("condition_2_from_date"))
      }
      val arms = (if (c.icd9.run) Seq(armRows(9)) else Nil) ++
        (if (c.icd10.run) Seq(armRows(10)) else Nil)
      val unioned = arms.reduce(_ union _).distinct()
      val w = Window.partitionBy(id)
        .orderBy(col("condition_2_from_date").asc_nulls_first)
      val c2 = col("condition_2_from_date")
      val calc = unioned
        .withColumn("days_forward_diff", datediff(lead(c2, 1).over(w), c2))
        .withColumn("months_forward_diff", monthDiff(c2, lead(c2, 1).over(w)))
        .withColumn("days_back_diff", datediff(c2, lag(c2, 1).over(w)))
        .withColumn("months_back_diff", monthDiff(lag(c2, 1).over(w), c2))
      val kept =
        if (c.claimCount == 1) calc.filter(col("condition_1_from_date").isNotNull)
        else calc.filter(
          col("condition_1_from_date").isNotNull ||
            (c2.isNotNull && col("months_forward_diff") <= c.lookbackMonths &&
              col("days_forward_diff") >= 1) ||
            (c2.isNotNull && col("months_back_diff") <= c.lookbackMonths &&
              col("days_back_diff") >= 1))
      kept.groupBy(id)
        .agg(min(col("condition_1_from_date")).as("c1min"),
          max(col("condition_1_from_date")).as("c1max"),
          min(col("condition_2_from_date")).as("c2min"),
          max(col("condition_2_from_date")).as("c2max"))
        .select(id,
          least(col("c1min"), col("c2min")).as("first_encounter_date"),
          greatest(col("c1max"), col("c2max")).as("last_encounter_date"),
          lit(c.code).as("ccw_code"),
          lit(s"ccw_${c.abbrev}").as("ccw_desc"))
    }
    perCond.reduce(_ unionAll _)
  }
}
