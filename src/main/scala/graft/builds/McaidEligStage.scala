package graft.builds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** mcaid elig staging (load_stage.mcaid_elig.R) — raw monthly
  * eligibility extract → stage, with the reference's three-part
  * duplicate handling and the archive merge:
  *
  *  1. duplicate diagnosis (:137-199): three distinct-count probes over
  *     fixed projections, each dropping one suspect discriminator
  *     (END_REASON_NAME / HOH_ID / RAC_NAME) from the person-month-RAC
  *     key;
  *  2. dedup (:225-285): fix the known RAC_NAME misspelling, score
  *     END_REASON_NAME by the priority CASE (NULL=1 … ELSE=7), keep
  *     per-key MAX-score rows. The reference's max self-join is
  *     NULL-safe ONLY on RAC_FROM_DATE/RAC_TO_DATE/RAC_CODE; the three
  *     id columns (CLNDR_YEAR_MNTH/MBR_H_SID/MEDICAID_RECIPIENT_ID)
  *     join plain-equality, so a row with a NULL id key matches nothing
  *     and is DROPPED — the window replays that with an explicit
  *     not-null filter on those three (partitionBy alone would keep
  *     them). Then DISTINCT over the config vars. HOH_ID is NOT in the
  *     stage vars (the yaml), so HOH-only duplicates vanish in this
  *     projection — that, not the score, is what fixes duplicate
  *     type 2;
  *  3. merge (:344-420): archive rows strictly before MIN(incoming
  *     date_var) UNION-distinct incoming rows, the incoming side
  *     gaining geo_hash_raw = SHA-256 of the upper-cased pipe-joined
  *     address (with the `'|'` filler for the absent add3 — :356);
  *     then the post-load UPDATE upper-casing MEDICAID_RECIPIENT_ID —
  *     applied AFTER the distinct, so two ids differing only in case
  *     survive the union and only then collide (reference artifact,
  *     kept).
  *
  * Scale: the probes fuse into one aggregation scan; dedup is one
  * person-month-keyed window + distinct; the merge's MIN(date) scalar
  * is a 1-row broadcast cross join (no driver round-trip), and the
  * union distinct is the single wide shuffle.
  */
object McaidEligStage {

  /** Person-month-RAC duplicate key (reference :146-147). */
  val DedupKey: Seq[String] = Seq("CLNDR_YEAR_MNTH", "MBR_H_SID",
    "MEDICAID_RECIPIENT_ID", "RAC_FROM_DATE", "RAC_TO_DATE", "RAC_CODE")

  val RacMisspelled = "Involuntary Inpatient Psychiactric Treatment (ITA)"
  val RacCorrect = "Involuntary Inpatient Psychiatric Treatment (ITA)"

  /** END_REASON_NAME priority (higher wins — reference :231-237). */
  def reasonScore(endReason: Column): Column =
    when(endReason.isNull, 1)
      .when(endReason === "Other", 2)
      .when(endReason === "Other - For User Generation Only", 3)
      .when(endReason === "Review Not Complete", 4)
      .when(endReason === "No Eligible Household Members", 5)
      .when(endReason === "Already Eligible for Program in Different AU", 6)
      .otherwise(7)

  /** The three duplicate-type probes (:144-182) fused into ONE scan:
    * total rows vs distinct rows under each projection. */
  def duplicateProbes(raw: DataFrame): DataFrame = {
    val base = DedupKey ++ Seq("RAC_NAME", "DUALELIGIBLE_INDICATOR")
    val hoh = DedupKey ++
      Seq("END_REASON_NAME", "RAC_NAME", "DUALELIGIBLE_INDICATOR")
    val rac = DedupKey ++ Seq("END_REASON_NAME", "DUALELIGIBLE_INDICATOR")
    // struct equality treats NULL fields as equal, and a struct with
    // NULL fields is itself non-NULL, so countDistinct over the struct
    // counts exactly what COUNT(*) over SELECT DISTINCT cols does
    def d(cols: Seq[String]) = countDistinct(struct(cols.map(col): _*))
    val agg = raw.agg(count(lit(1)).as("total_rows"),
      d(base).as("d_reason"), d(hoh).as("d_hoh"), d(rac).as("d_rac"))
    agg.select(expr(
      "stack(3, 'end_reason', d_reason, 'hoh_id', d_hoh, 'rac_name', d_rac)" +
        " as (probe, distinct_rows)"), col("total_rows"))
      .withColumn("dup_present",
        (col("distinct_rows") =!= col("total_rows")).cast("int"))
      .select(col("probe"), col("total_rows"), col("distinct_rows"),
        col("dup_present"))
  }

  /** Dedup (:225-285): RAC-name fix, max-score keep, DISTINCT over
    * `varsDedup` (the stage vars minus geo_hash_raw — columns outside
    * it, e.g. HOH_ID, drop out here). */
  def dedup(raw: DataFrame, varsDedup: Seq[String]): DataFrame = {
    val fixed = raw.withColumn("RAC_NAME",
      when(col("RAC_NAME") === RacMisspelled, RacCorrect)
        .otherwise(col("RAC_NAME")))
      .withColumn("reason_score", reasonScore(col("END_REASON_NAME")))
    val w = Window.partitionBy(DedupKey.map(col): _*)
    // The reference joins the three id keys with PLAIN equality (only
    // the RAC columns are NULL-safe), so a NULL id key matches no max
    // row and the record drops out of the dedup output.
    val idKeysPresent = col("CLNDR_YEAR_MNTH").isNotNull &&
      col("MBR_H_SID").isNotNull && col("MEDICAID_RECIPIENT_ID").isNotNull
    fixed
      .withColumn("max_score", max(col("reason_score")).over(w))
      .filter(col("reason_score") === col("max_score") && idKeysPresent)
      .select(varsDedup.map(col): _*)
      .distinct()
  }

  /** geo_hash_raw (:352-359): SHA-256 over the upper-cased pipe-joined
    * address with the empty add3 filler; T-SQL style-2 hex is upper. */
  def geoHashRaw: Column =
    upper(sha2(upper(concat_ws("",
      col("RSDNTL_ADRS_LINE_1"), lit("|"), col("RSDNTL_ADRS_LINE_2"),
      lit("|"), lit("|"), col("RSDNTL_CITY_NAME"), lit("|"),
      col("RSDNTL_STATE_CODE"), lit("|"), col("RSDNTL_POSTAL_CODE"))),
      256))

  /** Incremental merge (:344-420). `incoming` is the (possibly deduped)
    * new extract WITHOUT geo_hash_raw; `archive` already carries the
    * full `vars`. */
  def stage(incoming: DataFrame, archive: DataFrame, vars: Seq[String],
      dateVar: String): DataFrame = {
    val suffix = Seq("MBR_ACES_IDNTFR", "etl_batch_id")
    val prefix = vars.filterNot(v => v == "geo_hash_raw" || suffix.contains(v))
    val cut = incoming.agg(min(col(dateVar)).as("date_truncate"))
    val arch = archive.select(vars.map(col): _*)
      .crossJoin(broadcast(cut))
      .filter(col(dateVar) < col("date_truncate"))
      .drop("date_truncate")
    val incom = incoming.select(
      (prefix.map(col) :+ geoHashRaw.as("geo_hash_raw")) ++
        suffix.map(col): _*)
      .select(vars.map(col): _*)
    arch.union(incom).distinct()
      .withColumn("MEDICAID_RECIPIENT_ID",
        upper(col("MEDICAID_RECIPIENT_ID")))
  }
}
