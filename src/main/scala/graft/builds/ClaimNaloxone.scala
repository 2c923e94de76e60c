package graft.builds

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Naloxone distribution events — the reference's
  * load_stage.mcaid_claim_naloxone.R, sibling of [[ClaimMoud]]:
  *
  *  step 1  (:29-45) the NDC reference list is CONTAINS-matched
  *          (`like '%'+ndc+'%'`) against the DISTINCT pharmacy NDC
  *          vocabulary to mint a source-specific exact-join ref — the
  *          same vocabulary-first discipline as [[ApcdInjury]]: the
  *          substring join touches distinct codes, never fact rows;
  *  step 2a (:49-77) pharmacy fills: NDC dim attach (proprietary name,
  *          dosage form, strength), quantity >= 1 and a year floor,
  *          form classified from the dosage-form name with per-NDC
  *          overrides, dosage-per-ml from strength with unit
  *          normalization (mg/.1mL vs mg/mL) and per-NDC overrides;
  *  step 2b (:79-112) procedure-billed naloxone: the G/J code set with
  *          J3490 requiring an HG/TG modifier, dispatch-table quantity /
  *          form / dosage, then UNION distinct with the pharmacy branch.
  *
  * Divergence noted: the reference's procedure IN-list carries
  * `'G2216 '` with a trailing space (so G2216 rows can never enter
  * despite the quantity/form CASE handling them — dead branches). This
  * build implements the evident intent (`G2216`), exercising those
  * branches.
  *
  * `minYear` is the reference's 2016 event floor, parameterized so test
  * fixtures can scale it to their data epoch. `injCodes` parameterizes
  * the injection HCPCS list: the mcaid build (:129-153) includes J2312,
  * the mcare sibling (load_stage.mcare_claim_naloxone.R:170-195) does
  * not — otherwise the two are the same build over different sources
  * (incl. the same `'G2216 '` trailing-space artifact, implemented as
  * evident intent in both).
  *
  * Scale: both ref dims broadcast; each branch is one scan + broadcast
  * joins; the union's DISTINCT is the only wide shuffle.
  */
object ClaimNaloxone {

  /** mcaid (:129-153) injection HCPCS; mcare drops J2312. */
  val McaidInjCodes: Seq[String] = Seq("G2216", "J2310", "J2311", "J2312")
  val McareInjCodes: Seq[String] = Seq("G2216", "J2310", "J2311")

  /** Step 1: contains-expansion of the NDC list over the distinct
    * pharmacy vocabulary. */
  def ndcRefExpansion(pharm: DataFrame, ndcList: DataFrame): DataFrame =
    pharm.select(col("ndc")).distinct()
      .join(broadcast(ndcList.select(col("ndc").as("ref_ndc")).distinct()),
        col("ndc").contains(col("ref_ndc")))
      .select(col("ndc")).distinct()

  /** pharm: (id_mcaid, claim_header_id, ndc, rx_fill_date, rx_quantity).
    * ndcList: (ndc) naloxone list. ndcCodes: (ndc, proprietaryname,
    * dosageformname, active_numerator_strength, active_ingred_unit).
    * proc: (id_mcaid, claim_header_id, procedure_code, modifier_code,
    * last_service_date). procDesc: (procedure_code, procedure_long_desc). */
  def build(pharm: DataFrame, proc: DataFrame, ndcList: DataFrame,
      ndcCodes: DataFrame, procDesc: DataFrame,
      minYear: Int = 2016,
      injCodes: Seq[String] = McaidInjCodes): DataFrame = {
    val sprayNdc = "00093216519"
    val injNdcs = Seq("55150034510", "55150032710", "00409121525")
    val rx = pharm
      .join(broadcast(ndcCodes), Seq("ndc"), "left")
      .join(broadcast(ndcRefExpansion(pharm, ndcList)), Seq("ndc"))
      .filter(year(col("rx_fill_date")) >= minYear &&
        col("rx_quantity") >= 1.0)
      .select(col("id_mcaid"), col("claim_header_id"),
        col("ndc").as("code"),
        upper(col("proprietaryname")).as("description"),
        col("rx_fill_date").as("event_date"),
        col("rx_quantity").cast("double").as("quantity"),
        when(col("dosageformname").contains("SPRAY") ||
          col("ndc") === sprayNdc, "SPRAY")
          .when(col("dosageformname").contains("INJECTION") ||
            col("ndc").isin(injNdcs: _*), "INJECTION")
          .as("form"),
        when(col("ndc") === sprayNdc, 40.0)
          .when(col("ndc") === "55150034510", 1.0)
          .when(col("ndc") === "55150032710", 0.4)
          .otherwise(col("active_numerator_strength") /
            when(col("active_ingred_unit") === "mg/.1mL", 0.1)
              .when(col("active_ingred_unit") === "mg/mL", 1.0))
          .cast("double").as("dosage_per_ml"),
        lit("PHARMACY").as("location"))
    val sprayProcs = Seq("G1028", "G2215")
    val px = proc
      .join(broadcast(procDesc), Seq("procedure_code"), "left")
      .filter(year(col("last_service_date")) >= minYear &&
        (col("procedure_code").isin(sprayProcs ++ injCodes: _*) ||
          (col("procedure_code") === "J3490" &&
            col("modifier_code").isin("HG", "TG"))))
      .select(col("id_mcaid"), col("claim_header_id"),
        col("procedure_code").as("code"),
        upper(col("procedure_long_desc")).as("description"),
        col("last_service_date").as("event_date"),
        when(col("procedure_code").isin(sprayProcs: _*), 2.0)
          .when(col("procedure_code").isin(injCodes :+ "J3490": _*), 1.0)
          .cast("double").as("quantity"),
        when(col("procedure_code").isin(sprayProcs: _*), "SPRAY")
          .when(col("procedure_code").isin(injCodes: _*), "INJECTION")
          .when(col("procedure_code") === "J3490", "UNKNOWN")
          .as("form"),
        when(col("procedure_code") === "G1028", 80.0)
          .when(col("procedure_code") === "G2215", 40.0)
          .cast("double").as("dosage_per_ml"),
        lit("PROCEDURE").as("location"))
    rx.unionByName(px).distinct()
  }
}
