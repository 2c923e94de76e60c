package graft.builds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** mcare claim_line — distinct line-level claim variables
  * (load_stage.mcare_claim_line.R:26-268): nine source arms UNIONed
  * distinct, two shapes:
  *
  *  - carrier/dme (professional): line table joined to base claims for
  *    the service dates and the denial code; ResDAC carrier denial rule
  *    `carr_clm_pmt_dnl_cd IN ('1'..'9')` — the code lives on the BASE
  *    row, so a line with no base claim is EXCLUDED (NULL fails the IN;
  *    the facility rule below passes it — asymmetric, faithfully kept);
  *    place-of-service left-padded to 2 only when the TRIMMED value is
  *    short, otherwise the raw untrimmed value survives (:37-40 quirk);
  *    revenue_code NULL.
  *  - hha/hospice/inpatient(x2 vintages)/outpatient(x2)/snf (facility):
  *    revenue-center table joined to base claims; facility denial rule
  *    `clm_mdcr_non_pmt_rsn_cd = '' OR IS NULL` — a rev line with NO
  *    base claim row passes (NULL satisfies IS NULL); revenue code
  *    left-padded to 4 under the same trimmed-length-gate quirk;
  *    POS/TOS NULL.
  *
  * Both shapes drop members absent from bene_enrollment (reference
  * LEFT JOIN + IS NOT NULL -> LEFT SEMI; the fan-out the reference's
  * per-year enrollment join introduces is re-collapsed by its UNION
  * distinct, so the semi join is the fan-out-free identical plan).
  *
  * Scale shape: per arm one claim-keyed join (base claims are ~1/line,
  * AQE picks broadcast vs shuffle) + one bene-keyed semi; the single
  * wide exchange is the final UNION distinct. One scan per source.
  */
object McareClaimLine {

  /** `right('0'+trim(x), 2) when len(trim(x)) < 2 else x` — the
    * reference pads the trimmed value but passes the raw one through
    * when already long enough. */
  private def padGate(c: Column, width: Int): Column =
    when(length(trim(c)) < width,
      substring(concat(lit("0" * (width - 1)), trim(c)), -width, width))
      .otherwise(c)

  private val nullStr = lit(null).cast("string")

  /** Carrier/dme professional arm: `line` needs bene_id, clm_id,
    * line_num, line_place_of_srvc_cd, line_cms_type_srvc_cd; `base`
    * needs clm_id, clm_from_dt, clm_thru_dt, carr_clm_pmt_dnl_cd. */
  def carrierArm(line: DataFrame, base: DataFrame, enroll: DataFrame,
      filetype: String): DataFrame =
    line
      .join(base.select(col("clm_id"), col("clm_from_dt"),
        col("clm_thru_dt"), col("carr_clm_pmt_dnl_cd")), Seq("clm_id"),
        "left")
      .filter(col("carr_clm_pmt_dnl_cd")
        .isin("1", "2", "3", "4", "5", "6", "7", "8", "9"))
      .join(enroll.select(col("bene_id")), Seq("bene_id"), "left_semi")
      .select(
        trim(col("bene_id")).as("id_mcare"),
        trim(col("clm_id")).as("claim_header_id"),
        trim(col("line_num")).as("claim_line_id"),
        col("clm_from_dt").cast("date").as("first_service_date"),
        col("clm_thru_dt").cast("date").as("last_service_date"),
        nullStr.as("revenue_code"),
        padGate(col("line_place_of_srvc_cd"), 2)
          .as("place_of_service_code"),
        col("line_cms_type_srvc_cd").as("type_of_service"),
        lit(filetype).as("filetype_mcare"))

  /** Facility revenue-center arm: `rev` needs bene_id, clm_id,
    * clm_line_num, rev_cntr; `base` needs clm_id, clm_from_dt,
    * clm_thru_dt, clm_mdcr_non_pmt_rsn_cd. */
  def facilityArm(rev: DataFrame, base: DataFrame, enroll: DataFrame,
      filetype: String): DataFrame =
    rev
      .join(base.select(col("clm_id"), col("clm_from_dt"),
        col("clm_thru_dt"), col("clm_mdcr_non_pmt_rsn_cd")), Seq("clm_id"),
        "left")
      .filter(col("clm_mdcr_non_pmt_rsn_cd") === "" ||
        col("clm_mdcr_non_pmt_rsn_cd").isNull)
      .join(enroll.select(col("bene_id")), Seq("bene_id"), "left_semi")
      .select(
        trim(col("bene_id")).as("id_mcare"),
        trim(col("clm_id")).as("claim_header_id"),
        trim(col("clm_line_num")).as("claim_line_id"),
        col("clm_from_dt").cast("date").as("first_service_date"),
        col("clm_thru_dt").cast("date").as("last_service_date"),
        padGate(col("rev_cntr"), 4).as("revenue_code"),
        nullStr.as("place_of_service_code"),
        nullStr.as("type_of_service"),
        lit(filetype).as("filetype_mcare"))

  /** Full nine-arm union.
    * @param carrier  (filetype, line frame, base frame) professional arms
    * @param facility (filetype, revenue-center frame, base frame) arms —
    *                 both inpatient/outpatient vintages tag the same
    *                 filetype, like the reference's `_j` arms
    */
  def build(carrier: Seq[(String, DataFrame, DataFrame)],
      facility: Seq[(String, DataFrame, DataFrame)],
      enroll: DataFrame): DataFrame = {
    val arms =
      carrier.map { case (ft, l, b) => carrierArm(l, b, enroll, ft) } ++
        facility.map { case (ft, r, b) => facilityArm(r, b, enroll, ft) }
    arms.reduce(_ union _).distinct()
  }
}
