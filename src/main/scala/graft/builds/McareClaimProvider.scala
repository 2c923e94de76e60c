package graft.builds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** mcare claim_provider — submitted provider ids reshaped to long
  * (load_stage.mcare_claim_provider.R):
  *
  * Seven per-filetype arms (carrier / dme / hha / hospice / inpatient /
  * outpatient / snf), each a wide projection of that file's provider
  * roles — carrier exposes billing / referring / care-plan-oversight /
  * site-of-service / rendering / organization, dme only billing /
  * referring, the five facility files billing / referring /
  * site-of-service / rendering / attending / operating / other, with
  * rendering COALESCEd base-then-revenue-center and its specialty
  * following the same pick (:178-180) — then UNPIVOTed to
  * (provider_type, npi) rows. Only well-formed NPIs survive:
  * `len = 10 and isnumeric = 1` (:91), expressed as a 10-digit regex
  * (the T-SQL ISNUMERIC corner cases — money symbols, floats — cannot
  * be 10 chars of a real NPI and are excluded by evident intent). The
  * outer projection maps provider_zip (rendering/billing roles only)
  * and provider_specialty (role-specific source column) per row
  * (:18-30).
  *
  * Denial rules live here as named gates: carrier/dme keep payment-
  * denial codes '1'-'9' (paid per the ResDAC 01-2020 consult), the
  * facility files keep empty/NULL `clm_mdcr_non_pmt_rsn_cd`.
  *
  * Scale shape: the stack() unpivot is a narrow generator (rows ×
  * populated roles, no shuffle); the single wide exchange is the final
  * UNION distinct. T-SQL UNPIVOT drops NULL role columns implicitly —
  * the NPI validity filter does the same here, so an arm whose role
  * column is absent-by-NULL contributes nothing, exactly like the
  * reference's per-arm UNPIVOT lists.
  */
object McareClaimProvider {

  /** Roles in reference order. */
  val allRoles: Seq[String] = Seq("billing", "referring",
    "care_plan_oversight", "site_of_service", "rendering", "organization",
    "attending", "operating", "other")

  val carrierRoles: Seq[String] = Seq("billing", "referring",
    "care_plan_oversight", "site_of_service", "rendering", "organization")
  val dmeRoles: Seq[String] = Seq("billing", "referring")
  val facilityRoles: Seq[String] = Seq("billing", "referring",
    "site_of_service", "rendering", "attending", "operating", "other")

  /** Carrier/dme denial rule: keep paid codes 1-9. */
  def carrierPaid(dnlCd: Column): Column =
    dnlCd.isin("1", "2", "3", "4", "5", "6", "7", "8", "9")

  /** Facility denial rule: keep empty/NULL non-payment code. */
  def facilityPaid(nonPmtCd: Column): Column =
    nonPmtCd === "" || nonPmtCd.isNull

  /** One arm: stack the roles, gate NPIs, map zip/specialty by role.
    * `wide` carries id_mcare, claim_header_id, first/last_service_date,
    * the role columns (NULL where the file has no such role), and the
    * aux provider_type_nch / provider_tin / provider_zip_* /
    * provider_specialty_* columns. */
  def unpivotArm(wide: DataFrame, roles: Seq[String],
      filetype: String): DataFrame = {
    val stackExpr = s"stack(${roles.length}, " +
      roles.map(r => s"'$r', $r").mkString(", ") +
      ") as (provider_type, providers)"
    wide
      .selectExpr("id_mcare", "claim_header_id", "first_service_date",
        "last_service_date", "provider_type_nch", "provider_tin",
        "provider_zip_rendering", "provider_zip_billing",
        "provider_specialty_attending", "provider_specialty_operating",
        "provider_specialty_other", "provider_specialty_referring",
        "provider_specialty_rendering", stackExpr)
      .filter(length(col("providers")) === 10 &&
        col("providers").rlike("^[0-9]+$"))
      .select(
        trim(col("id_mcare")).as("id_mcare"),
        trim(col("claim_header_id")).as("claim_header_id"),
        col("first_service_date").cast("date").as("first_service_date"),
        col("last_service_date").cast("date").as("last_service_date"),
        col("providers").cast("bigint").as("provider_npi"),
        col("provider_type"),
        col("provider_type_nch"), col("provider_tin"),
        when(col("provider_type") === "rendering",
            col("provider_zip_rendering"))
          .when(col("provider_type") === "billing",
            col("provider_zip_billing"))
          .as("provider_zip"),
        when(col("provider_type") === "attending",
            col("provider_specialty_attending"))
          .when(col("provider_type") === "operating",
            col("provider_specialty_operating"))
          .when(col("provider_type") === "other",
            col("provider_specialty_other"))
          .when(col("provider_type") === "referring",
            col("provider_specialty_referring"))
          .when(col("provider_type") === "rendering",
            col("provider_specialty_rendering"))
          .as("provider_specialty"),
        lit(filetype).as("filetype_mcare"))
  }

  /** Full union: (wideFrame, roles, filetype) per arm. */
  def build(arms: Seq[(DataFrame, Seq[String], String)]): DataFrame =
    arms.map { case (w, r, ft) => unpivotArm(w, r, ft) }
      .reduce(_ union _).distinct()
}
