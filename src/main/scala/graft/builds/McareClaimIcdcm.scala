package graft.builds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** mcare claim_icdcm_header — diagnosis codes reshaped to long
  * (load_stage.mcare_claim_icdcm_header.R:26-608): nine source arms with
  * per-filetype dx slot matrices UNIONed wide, then ONE unpivot over the
  * 38-slot superset (dxadmit, dx01-25, dxecode_1-12):
  *
  *  - carrier/dme: dx01-12 only; ResDAC carrier denial rule (code IN
  *    '1'..'9' on the claims row itself);
  *  - hha/hospice/outpatient(x2): dx01-25 + ecodes 1-12, no admit dx;
  *    facility denial rule (non-pmt code empty/NULL);
  *  - inpatient(x2)/snf: admit dx + dx01-25 + ecodes 1-12; facility rule.
  *
  * After the unpivot (reference :560-604): drop NULL and the literal
  * `' '` single-space slot (NOT a trim — `'  '` would survive, so the
  * filter here is the same exact comparison); normalize ICD-9 codes by
  * RIGHT-zero-padding 3/4-char codes (digit-led always; V/E-led only
  * when first_service_date < 2015-10-01, the ICD-10-CM cutover — the
  * mcaid sibling [[ClaimIcdcm]] gates on last_service_date, mcare on
  * FIRST, faithfully kept); icdcm_version 9/10 by the same test;
  * icdcm_number = the slot suffix ('admit', '01'..'25', 'ecode_1'..);
  * DISTINCT.
  *
  * The reference's per-arm enrollment LEFT JOIN + IS NOT NULL commutes
  * with the union, so it runs ONCE as a LEFT SEMI over the unioned wide
  * frame — same rows, one join instead of nine.
  *
  * Scale: the stack() explode is a per-row Generate inside codegen (no
  * shuffle); one bene-keyed semi join; the single wide exchange is the
  * final DISTINCT, which partial-aggregates map-side.
  */
object McareClaimIcdcm {

  /** Slot labels in reference unpivot order: admit, 01-25, ecode_1-12. */
  val SlotLabels: Seq[String] =
    "admit" +: (1 to 25).map(i => f"$i%02d") ++: (1 to 12).map(i => s"ecode_$i")

  private def slotCol(label: String) = s"slot_$label"

  /** ResDAC carrier/dme denial rule: keep codes '1'..'9' (a NULL code —
    * e.g. a missing base row — fails the IN and is excluded). */
  def carrierDenial(df: DataFrame, dnlCol: String): DataFrame =
    df.filter(col(dnlCol).isin("1", "2", "3", "4", "5", "6", "7", "8", "9"))

  /** Facility denial rule: keep empty or NULL non-payment codes. */
  def facilityDenial(df: DataFrame, nonPmtCol: String): DataFrame =
    df.filter(col(nonPmtCol) === "" || col(nonPmtCol).isNull)

  /** One arm standardized to the 38-slot superset.
    * @param gated   arm frame, denial rule already applied; needs
    *                bene_id, clm_id, clm_from_dt, clm_thru_dt
    * @param admit   admitting-dx column, if the filetype carries one
    * @param dx      ordered dx slot columns (12 or 25)
    * @param ecodes  ordered e-code slot columns (0 or 12)
    */
  def arm(gated: DataFrame, filetype: String, admit: Option[String],
      dx: Seq[String], ecodes: Seq[String]): DataFrame = {
    require(dx.size <= 25 && ecodes.size <= 12, "slot overflow")
    val nullStr = lit(null).cast("string")
    def at(xs: Seq[String], i: Int): Column =
      if (i < xs.size) col(xs(i)) else nullStr
    val slots =
      admit.map(col).getOrElse(nullStr).as(slotCol("admit")) +:
        (0 until 25).map(i => at(dx, i).as(slotCol(f"${i + 1}%02d"))) ++:
        (0 until 12).map(i => at(ecodes, i).as(slotCol(s"ecode_${i + 1}")))
    gated.select(Seq(
      trim(col("bene_id")).as("id_mcare"),
      trim(col("clm_id")).as("claim_header_id"),
      col("clm_from_dt").cast("date").as("first_service_date"),
      col("clm_thru_dt").cast("date").as("last_service_date"),
      lit(filetype).as("filetype_mcare")) ++ slots: _*)
  }

  /** Union the standardized arms, apply the enrollment semi, unpivot,
    * normalize. */
  def build(arms: Seq[DataFrame], enroll: DataFrame): DataFrame = {
    val wide = arms.reduce(_ unionByName _)
      .join(enroll.select(trim(col("bene_id")).as("id_mcare")),
        Seq("id_mcare"), "left_semi")
    val stackExpr = s"stack(${SlotLabels.size}, " +
      SlotLabels.map(l => s"'$l', ${slotCol(l)}").mkString(", ") +
      ") as (icdcm_number, icdcm_raw)"
    val raw = col("icdcm_raw")
    val pre = col("first_service_date") < to_date(lit(ClaimIcdcm.Icd10Cutover))
    val icd9 = raw.rlike("^[0-9]") || (raw.rlike("^[EV]") && pre)
    wide
      .select(col("id_mcare"), col("claim_header_id"),
        col("first_service_date"), col("last_service_date"),
        col("filetype_mcare"), expr(stackExpr))
      .filter(raw.isNotNull && raw =!= " ")
      .withColumn("icdcm_norm",
        when(icd9 && length(raw) === 3, concat(raw, lit("00")))
          .when(icd9 && length(raw) === 4, concat(raw, lit("0")))
          .otherwise(raw))
      .withColumn("icdcm_version", when(icd9, 9).otherwise(10))
      .distinct()
  }
}
