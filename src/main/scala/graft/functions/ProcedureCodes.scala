package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Procedure-code system classification — the CASE taxonomy the
  * reference's procedure QA uses to spot malformed codes
  * (qa_stage.mcaid_claim_procedure.R:120-143) and the claim-concept
  * vocabulary behind it:
  *
  *   - 5 digits                     → CPT Category I
  *   - 4 digits + 'F'               → CPT Category II
  *   - 4 digits + 'T'               → CPT Category III
  *   - 4 digits + 'M'/'U'           → CPT Other
  *   - letter + 4 digits            → HCPCS
  *   - 3-4 digits                   → ICD-9-PCS
  *   - any 7 characters             → ICD-10-PCS
  *   - anything else                → UNKNOWN
  *
  * The T-SQL original gates each digit run with ISNUMERIC(substring);
  * per the repo convention (ClaimPharm, McareClaimProvider) the
  * money-symbol/float corner cases of ISNUMERIC are deliberately NOT
  * replicated — a digit character class is the sane re-expression, and
  * real procedure codes never carry signs or decimal points.
  *
  * A pure nested-CASE Column: row-local, codegen'd, usable inside any
  * scan. Branch order matches the reference exactly (a 5-digit numeric
  * code is CPT I even though it also matches the ICD-9-PCS arm's
  * ISNUMERIC — first match wins).
  */
object ProcedureCodes {

  def codeSystem(code: Column): Column =
    when(code.rlike("^[0-9]{5}$"), "CPT Category I")
      .when(code.rlike("^[0-9]{4}F$"), "CPT Category II")
      .when(code.rlike("^[0-9]{4}T$"), "CPT Category III")
      .when(code.rlike("^[0-9]{4}[MU]$"), "CPT Other")
      .when(code.rlike("^[A-Z][0-9]{4}$"), "HCPCS")
      .when(code.rlike("^[0-9]{3,4}$"), "ICD-9-PCS")
      .when(length(code) === 7, "ICD-10-PCS")
      .otherwise("UNKNOWN")
}
