package graft.builds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** APCD claim detail staging family — the line/dx/procedure/provider
  * extracts that sit under [[ApcdClaimHeader]]:
  *
  *  - claim_line (load_stage.apcd_claim_line.R:22-51): DISTINCT
  *    line-grain projection with the 2023-07-28 nonsensical-discharge
  *    correction — `discharge_dt < admission_dt` or (NULL admission and
  *    `discharge_dt < first_service_dt`) fall back to last_service_dt —
  *    excluding denied/orphaned claims;
  *  - claim_icdcm_header (load_stage.apcd_claim_icdcm_header.R:15-31):
  *    dx-grain projection of raw/norm/version/number under the same
  *    exclusion;
  *  - claim_procedure (load_stage.apcd_claim_procedure.R:17-31):
  *    procedure + consolidated modifier, same exclusion;
  *  - claim_provider (load_stage.apcd_claim_provider.R:15-24): a pure
  *    header-level provider reshape, no exclusion join.
  *
  * The reference writes each as `LEFT JOIN apcd_medical_claim_header b
  * ... WHERE b.denied_header_flag = 'N' AND b.orphaned_header_flag =
  * 'N'` — the WHERE on the right side collapses the left join to an
  * inner gate, which we express as a LEFT SEMI join against the
  * filtered header-id set: no header payload is carried, so Spark
  * shuffles only (claim_header_id) on the probe side and the detail
  * rows stream through one hash join keyed on the natural
  * high-cardinality key (no skew, no fan-out — semi join can't
  * duplicate detail rows the way a plain inner join against an
  * accidentally-duplicated header extract could).
  *
  * Scale shape: one shuffle per extract (the semi join); the line
  * build adds the DISTINCT's partial-agg exchange on the full detail
  * grain, exactly the reference's `select distinct`. Nothing is
  * collected; nothing loops.
  */
object ApcdClaimDetail {

  /** Header ids passing the denied/orphaned gate. */
  def allowedHeaders(medHeader: DataFrame): DataFrame =
    medHeader
      .filter(col("denied_header_flag") === "N" &&
        col("orphaned_header_flag") === "N")
      .select(col("claim_header_id"))

  /** The 2023-07-28 discharge correction (apcd_claim_line.R:36-41). */
  def correctedDischarge(admission: Column, discharge: Column,
      firstService: Column, lastService: Column): Column =
    when(discharge < admission, lastService)
      .when(admission.isNull && discharge < firstService, lastService)
      .otherwise(discharge)

  /** Line-grain build: exclusion gate, discharge correction, DISTINCT. */
  def line(lineRaw: DataFrame, medHeader: DataFrame): DataFrame =
    lineRaw
      .join(allowedHeaders(medHeader), Seq("claim_header_id"), "left_semi")
      .select(col("id_apcd"), col("claim_header_id"), col("claim_line_id"),
        col("line_counter"),
        col("first_service_dt").as("first_service_date"),
        col("last_service_dt").as("last_service_date"),
        col("charge_amt"), col("revenue_code"),
        col("place_of_service_code"),
        col("admission_dt").as("admission_date"),
        correctedDischarge(col("admission_dt"), col("discharge_dt"),
          col("first_service_dt"), col("last_service_dt"))
          .as("discharge_date"),
        col("discharge_status_code"),
        col("admission_point_of_origin_code"), col("admission_type"))
      .distinct()

  /** Dx-grain build (apcd_claim_icdcm_header.R:21-31). */
  def icdcm(dxRaw: DataFrame, medHeader: DataFrame): DataFrame =
    dxRaw
      .join(allowedHeaders(medHeader), Seq("claim_header_id"), "left_semi")
      .select(col("id_apcd"), col("claim_header_id"),
        col("first_service_dt").as("first_service_date"),
        col("last_service_dt").as("last_service_date"),
        col("icdcm_raw"), col("icdcm_norm"), col("icdcm_version"),
        col("icdcm_number"))

  /** Procedure-grain build (apcd_claim_procedure.R:17-31). */
  def procedure(procRaw: DataFrame, medHeader: DataFrame): DataFrame =
    procRaw
      .join(allowedHeaders(medHeader), Seq("claim_header_id"), "left_semi")
      .select(col("id_apcd"), col("claim_header_id"),
        col("first_service_dt").as("first_service_date"),
        col("last_service_dt").as("last_service_date"),
        col("procedure_code"), col("modifier_code"))

  /** Provider reshape (apcd_claim_provider.R:15-24): no exclusion. */
  def provider(providerRaw: DataFrame): DataFrame =
    providerRaw.select(col("id_apcd"), col("claim_header_id"),
      col("first_service_dt").as("first_service_date"),
      col("last_service_dt").as("last_service_date"),
      col("provider_id_apcd"), col("provider_id_raw_apcd"),
      col("provider_type"))
}
