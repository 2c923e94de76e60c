package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.builds.{ClaimIcdcm, ClaimPharm, ClaimProcedure}
import graft.queries.Q.t

/** SURVEY §7.2 phase-1 normalization catalog: the wide→long claim builds
  * (icdcm_header, procedure, pharm) on deterministic wide frames synthesized
  * from the orders/lineitem claims analog. The synthesis is plain modular
  * arithmetic so the DuckDB oracle reproduces it exactly. */
object NormalizeQueries {

  /** Wide raw-claim frame with 3 dx slots + an admit slot: slot 01 always
    * present (numeric, 1-5 digits — exercises the 3/4-char right-padding),
    * slot 02 letter-prefixed (ICD-10-shaped, except E/V prefixes whose
    * version depends on the service date), slot 03 an E-code, admit slot
    * intermittently null. last_service_date spans 2014-2017, straddling the
    * 2015-10-01 ICD-10 cutover so both E/V branches are exercised. */
  private[queries] def icdcmWide(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey").as("claim_header_id"),
      col("o_custkey").as("id_person"),
      date_add(to_date(lit("2014-01-01")),
        (col("o_orderkey") % 1460).cast("int")).as("last_service_date"),
      (col("o_orderkey") % 99999).cast("string").as("dx01"),
      when(col("o_orderkey") % 3 =!= 0,
        concat(expr("chr(65 + o_custkey % 26)"),
          lpad((col("o_orderkey") % 999).cast("string"), 3, "0"))).as("dx02"),
      when(col("o_orderkey") % 5 === 0,
        concat(lit("E"), (col("o_orderkey") % 9999).cast("string"))).as("dx03"),
      when(col("o_orderkey") % 2 === 0,
        (col("o_custkey") % 99999).cast("string")).as("dx_admit"))

  /** §7.2 phase 1: icdcm_header build — 13-slot-style unpivot, ICD-9
    * zero-pad, version inference, DISTINCT — rolled up per (version, slot). */
  def q79ClaimIcdcm(s: SparkSession, dir: String): DataFrame =
    ClaimIcdcm.build(icdcmWide(s, dir),
        claimCols = Seq("claim_header_id", "id_person"),
        slots = Seq("01" -> "dx01", "02" -> "dx02", "03" -> "dx03",
          "admit" -> "dx_admit"))
      .groupBy(col("icdcm_version"), col("icdcm_number"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("icdcm_norm")).as("n_codes"),
        min(col("icdcm_norm")).as("min_code"),
        max(col("icdcm_norm")).as("max_code"))
      .orderBy(col("icdcm_version"), col("icdcm_number"))

  /** Wide frame with 3 procedure slots + 2 modifier slots; slot 2 is
    * HCPCS-shaped (letter + 4 digits), modifiers arrive lower-case to
    * exercise the upper() normalization. */
  private[queries] def procWide(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey").as("claim_header_id"),
      col("o_custkey").as("id_person"),
      date_add(to_date(lit("2014-01-01")),
        (col("o_orderkey") % 1460).cast("int")).as("first_service_date"),
      lpad((col("o_orderkey") % 89999 + 10000).cast("string"), 5, "0").as("pc01"),
      when(col("o_orderkey") % 4 =!= 1,
        concat(expr("chr(65 + o_orderkey % 5)"),
          lpad((col("o_custkey") % 9999).cast("string"), 4, "0"))).as("pc02"),
      when(col("o_orderkey") % 7 === 0,
        (col("o_custkey") % 99999).cast("string")).as("pc03"),
      when(col("o_orderkey") % 3 === 0,
        lower(substring(col("o_orderpriority"), 1, 2))).as("mod1"),
      when(col("o_orderkey") % 11 === 0, lit("gt")).as("mod2"))

  /** §7.2 phase 1: claim_procedure build — proc + modifier unpivot with
    * slot labels '01'..'03' / 'M1'..'M2' — rolled up per slot. */
  def q80ClaimProcedure(s: SparkSession, dir: String): DataFrame =
    ClaimProcedure.build(procWide(s, dir),
        claimCols = Seq("claim_header_id"),
        procSlots = Seq("01" -> "pc01", "02" -> "pc02", "03" -> "pc03"),
        modSlots = Seq("M1" -> "mod1", "M2" -> "mod2"))
      .groupBy(col("pcode_number"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("pcode")).as("n_codes"),
        min(col("pcode")).as("min_code"),
        max(col("pcode")).as("max_code"))
      .orderBy(col("pcode_number"))

  /** §7.2 phase 1: claim_pharm build — NDC shape validation + ISNUMERIC-
    * guarded casts + domain clamp, rolled up by validity outcome so any
    * mis-validated row moves a bucket and breaks the oracle hash. */
  /** Shared q81/q295 pharmacy-feed columns — factored so the claim_pharm
    * build fixture and its QA battery cannot drift. */
  private[queries] def pharmNdcRaw: org.apache.spark.sql.Column =
    when(col("l_orderkey") % 13 === 0,
      concat(lit("N"), lpad(col("l_partkey").cast("string"), 10, "0")))
      .otherwise(lpad(((col("l_partkey") * 37 + col("l_suppkey")) % 100000000000L)
        .cast("string"), 11, "0"))

  private[queries] def pharmSupplyRaw: org.apache.spark.sql.Column =
    when(col("l_suppkey") % 17 === 0, lit("NA"))
      .otherwise((floor(col("l_quantity")).cast("int") * 9).cast("string"))

  def q81ClaimPharm(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "lineitem").select(
      col("l_orderkey").as("claim_header_id"),
      pharmNdcRaw.as("ndc_raw"),
      pharmSupplyRaw.as("supply_days_raw"))
    ClaimPharm.build(raw)
      .groupBy(col("ndc_valid"), col("supply_days").isNotNull.as("supply_known"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("ndc")).as("n_ndc"),
        sum(col("supply_days")).as("sum_supply"))
      .orderBy(col("ndc_valid"), col("supply_known"))
  }
}
