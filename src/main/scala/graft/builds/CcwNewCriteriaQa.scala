package graft.builds

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CCW new-criteria line-level cross-check — the reference's
  * qa_stage.mcaid_claim_ccw_new_criteria.sql: for each of the four
  * named phenotypes (mi: 1-year/1-claim; hip_fracture: 2-year/
  * condition-type-1; anemia, depression: 2-year/condition-type-2) the
  * analyst compares the NEW-criteria stage table (the load_ccw
  * lookback-window rule, [[CcwConditions]]) against a LINE-LEVEL
  * evidence pull — every claim whose dx carries the phenotype flag,
  * restricted to the phenotype's claim types but NOT to dx position
  * (the QA's second query selects icdcm_number without filtering it).
  *
  * The manual eyeball becomes a per-phenotype verdict row: the OLD
  * count-based qualification (>=1 condition-1-type claim, or >=2
  * DISTINCT service dates on condition-2-type claims) is strictly
  * implied by the new rule, so `new_not_old` MUST be 0 (PASS/FAIL
  * pins it); `old_not_new` counts the people the new lookback-window
  * adjacency rule rejects — the number the reference QA exists to
  * surface.
  *
  * Scale shape: ONE dx-scan evidence rollup (wide ref broadcast,
  * conditional aggs per phenotype masked inside the person-grain agg),
  * one person-grain pivot of the new-criteria spans, one person-keyed
  * full-outer join, and a single global aggregation — the 4 verdict
  * rows unpivot from that one row via stack. No per-phenotype rescan.
  */
object CcwNewCriteriaQa {

  /** One phenotype config (the QA header's years/condition_type). */
  case class Pheno(code: Int, desc: String, abbrev: String,
      claimCount: Int, lookbackMonths: Int,
      types1: Seq[Int], types2: Seq[Int], dxFields: String = "any")

  /** The reference QA's four phenotypes (reference ccw codes). */
  val Phenos: Seq[Pheno] = Seq(
    Pheno(10, "Acute myocardial infarction", "mi",
      claimCount = 1, lookbackMonths = 12,
      types1 = Seq(1), types2 = Seq()),
    Pheno(19, "Hip fracture", "hip_fracture",
      claimCount = 1, lookbackMonths = 24,
      types1 = Seq(1, 2, 4, 5), types2 = Seq(), dxFields = "1-2"),
    Pheno(5, "Anemia", "anemia",
      claimCount = 2, lookbackMonths = 24,
      types1 = Seq(1), types2 = Seq(2, 3, 4, 5)),
    Pheno(13, "Depression", "depression",
      claimCount = 2, lookbackMonths = 24,
      types1 = Seq(1), types2 = Seq(2, 3, 4, 5)))

  import CcwConditions.{CcwArm, CcwDef}

  private def toDef(p: Pheno): CcwDef =
    CcwDef(p.code, p.desc, p.abbrev, p.claimCount, p.lookbackMonths,
      p.types1, p.types2, exclude1 = None, exclude2 = None,
      icd9 = CcwArm(run = true, dxFields = p.dxFields),
      icd10 = CcwArm(run = true, dxFields = p.dxFields))

  /** Full cross-check. Frames as in [[CcwConditions.build]]; `ref` is
    * the wide flag table carrying `ccw_<abbrev>` columns for every
    * phenotype. Output: one verdict row per phenotype. */
  def build(header: DataFrame, dx: DataFrame, ref: DataFrame,
      phenos: Seq[Pheno] = Phenos,
      idCol: String = "id_mcaid"): DataFrame = {
    val id = col(idCol)

    // NEW criteria: the load_ccw kernel, pivoted to per-person flags
    val spans = CcwConditions.build(header, dx, ref, phenos.map(toDef),
      idCol)
    val newPer = spans.groupBy(id).agg(
      phenos.map(p => max(when(col("ccw_desc") === s"ccw_${p.abbrev}",
        1).otherwise(0)).as(s"new_${p.abbrev}")).head,
      phenos.map(p => max(when(col("ccw_desc") === s"ccw_${p.abbrev}",
        1).otherwise(0)).as(s"new_${p.abbrev}")).tail: _*)

    // OLD criteria: line-level evidence, one scan, per-phenotype
    // conditional aggs at person grain (no dx-position restriction)
    val ev = dx.join(broadcast(ref),
        dx("icdcm_norm") === ref("icdcm") &&
          dx("icdcm_version") === ref("icdcm_version"))
      .join(header.select(col("claim_header_id"), col("claim_type_id"),
        col("first_service_date")), Seq("claim_header_id"))
    val oldAggs = phenos.flatMap { p =>
      val f = col(s"ccw_${p.abbrev}") === 1
      val allTypes = p.types1 ++ p.types2
      Seq(
        countDistinct(when(f && col("claim_type_id").isin(allTypes: _*),
          col("claim_header_id"))).as(s"evc_${p.abbrev}"),
        countDistinct(when(f && col("claim_type_id").isin(p.types1: _*),
          col("claim_header_id"))).as(s"cnt1_${p.abbrev}"),
        countDistinct(when(f && col("claim_type_id").isin(p.types2: _*),
          col("first_service_date"))).as(s"d2_${p.abbrev}"))
    }
    val oldPer = ev.groupBy(dx(idCol).as(idCol))
      .agg(oldAggs.head, oldAggs.tail: _*)

    // person-keyed full outer: every person seen by either side
    val joined = newPer.join(oldPer, Seq(idCol), "full")
    val tots = phenos.flatMap { p =>
      val nw = coalesce(col(s"new_${p.abbrev}"), lit(0)) === 1
      val ec = coalesce(col(s"evc_${p.abbrev}"), lit(0L))
      val oldq = coalesce(col(s"cnt1_${p.abbrev}"), lit(0L)) >= 1 ||
        coalesce(col(s"d2_${p.abbrev}"), lit(0L)) >= 2
      Seq(
        sum(when(nw, 1L).otherwise(0L)).as(s"sp_${p.abbrev}"),
        sum(ec).as(s"ec_${p.abbrev}"),
        sum(when(ec > 0, 1L).otherwise(0L)).as(s"ep_${p.abbrev}"),
        sum(when(oldq, 1L).otherwise(0L)).as(s"oq_${p.abbrev}"),
        sum(when(nw && !oldq, 1L).otherwise(0L)).as(s"nno_${p.abbrev}"),
        sum(when(oldq && !nw, 1L).otherwise(0L)).as(s"onn_${p.abbrev}"))
    }
    val one = joined.agg(tots.head, tots.tail: _*)

    // 1-row unpivot: stack the per-phenotype columns into verdict rows
    val stackArgs = phenos.map(p =>
      s"'ccw_${p.abbrev}', sp_${p.abbrev}, ec_${p.abbrev}, " +
        s"ep_${p.abbrev}, oq_${p.abbrev}, nno_${p.abbrev}, " +
        s"onn_${p.abbrev}").mkString(", ")
    one.select(expr(s"stack(${phenos.size}, $stackArgs) AS " +
        "(ccw_desc, span_persons, evidence_claims, evidence_persons, " +
        "oldq_persons, new_not_old, old_not_new)"))
      .withColumn("verdict",
        when(col("new_not_old") === 0, "PASS").otherwise("FAIL"))
  }
}
