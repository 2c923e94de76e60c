package graft.builds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** WAHBE smoking-status partner-export prep — the reference's
  * dugan_p1_export/wahbe_data_prep.sql, the second of the two Dugan
  * export prep scripts (the mcaid side is q202/q204):
  *
  *  - step 1 (:12-23): the two WAHBE report extracts UNION-distinct,
  *    ACES id normalized to 9 chars by zero-padding (len 7 -> '00'+id,
  *    len 8 -> '0'+id, anything else NULL — the CASE has no ELSE);
  *  - step 2 (:35-40): inner join to the DISTINCT (aces id, Medicaid
  *    recipient id) pairs of the raw eligibility table;
  *  - step 3 (:47-71): the UW person-id table LEFT joined to the
  *    matched recipients; the export is the DISTINCT (id_uw, smoking
  *    status, eligibility window) of a second left join — one row per
  *    person when unmatched (NULL status), several when WAHBE carries
  *    several windows;
  *  - step 4 (:86-115): for UNMATCHED persons, pick the ACES id with
  *    the most raw-eligibility rows (rank by row_count DESC, then ACES
  *    id ascending as the tie-break);
  *  - step 5 (:122-211): coverage characterization for BOTH groups —
  *    sum cov_time_day per (person, dual, bsp_group_cid, full_benefit,
  *    cov_type) over timevar rows overlapping the study window (the
  *    reference's WHERE on the left join's right side makes it an
  *    inner join — persons with no overlapping coverage drop out),
  *    rank()=1 pick (full ties keep BOTH rows; distinct-person counts
  *    absorb them), then the 5-arm UNION tabulation (overall / dual /
  *    full_benefit / cov_type / bsp_group_name via the RAC ref dim).
  *
  * Scale: report/ref dims broadcast; the elig pair-count aggregation
  * and the timevar rollup are the wide shuffles, both on person-grain
  * keys; tabulation reduces from the tiny ranked frame.
  */
object WahbeDataPrep {

  /** Step 1's zero-pad normalization (no ELSE: other lengths -> NULL). */
  def normalizeAcesId(aces: Column): Column =
    when(length(aces) === 7, concat(lit("00"), aces.cast("string")))
      .when(length(aces) === 8, concat(lit("0"), aces.cast("string")))
      .cast("string")

  /** Steps 1-2: normalized union-distinct reports inner-joined to the
    * distinct raw-elig (aces, recipient) pairs. */
  def matchedWahbe(report1: DataFrame, report2: DataFrame,
      elig: DataFrame): DataFrame = {
    val t1 = report1.unionByName(report2).distinct()
      .select(normalizeAcesId(col("aces_id")).as("aces_id_norm"),
        col("smoking_status"), col("eligibility_start_date"),
        col("eligibility_end_date"))
    val pairs = elig.select(col("MBR_ACES_IDNTFR"),
      col("MEDICAID_RECIPIENT_ID")).distinct()
    t1.join(pairs, col("aces_id_norm") === col("MBR_ACES_IDNTFR"))
  }

  /** Step 3: person table + match flag (the reference's #temp3). */
  def personMatches(personIds: DataFrame, matched: DataFrame): DataFrame =
    personIds.join(
      matched.select(col("MEDICAID_RECIPIENT_ID")).distinct(),
      col("id_mcaid") === col("MEDICAID_RECIPIENT_ID"), "left")

  /** Step 3-Export: the shared table — DISTINCT (id_uw, status,
    * window), unmatched persons keeping one NULL row. */
  def export(persons: DataFrame, matched: DataFrame): DataFrame =
    persons.select(col("id_uw"), col("id_mcaid"))
      .join(matched, col("id_mcaid") === matched("MEDICAID_RECIPIENT_ID"),
        "left")
      .select(col("id_uw"),
        col("smoking_status").as("hbe_smoking_status"),
        col("eligibility_start_date").as("hbe_eligibility_start_date"),
        col("eligibility_end_date").as("hbe_eligibility_end_date"))
      .distinct()

  /** Step 4: unmatched persons' modal ACES id (row_count DESC, aces
    * ASC). `persons` is personMatches' output. */
  def unmatchedAces(persons: DataFrame, elig: DataFrame): DataFrame = {
    val counts = elig
      .groupBy(col("MEDICAID_RECIPIENT_ID").as("_rid"),
        col("MBR_ACES_IDNTFR"))
      .agg(count(lit(1)).as("row_count"))
    val t4 = persons.filter(col("MEDICAID_RECIPIENT_ID").isNull)
      .select(col("id_mcaid")).distinct()
      .join(counts, col("id_mcaid") === col("_rid"), "left")
      .select(col("id_mcaid"), col("MBR_ACES_IDNTFR"), col("row_count"))
      .distinct()
    val w = Window.partitionBy(col("id_mcaid"))
      .orderBy(col("row_count").desc, col("MBR_ACES_IDNTFR"))
    t4.withColumn("_rk", rank().over(w)).filter(col("_rk") === 1)
      .select(col("id_mcaid"), col("MBR_ACES_IDNTFR")).distinct()
  }

  /** Step 5's per-group coverage pick: window-overlap timevar rollup +
    * rank()=1 (ties both kept, like the reference). `ids` carries
    * id_mcaid. */
  def coveragePick(ids: DataFrame, timevar: DataFrame, winFrom: String,
      winTo: String): DataFrame = {
    val rolled = ids.select(col("id_mcaid")).distinct()
      .join(timevar, Seq("id_mcaid"), "left")
      .filter(col("from_date") <= lit(winTo) &&
        col("to_date") >= lit(winFrom))
      .groupBy(col("id_mcaid"), col("dual"), col("bsp_group_cid"),
        col("full_benefit"), col("cov_type"))
      .agg(sum(col("cov_time_day")).as("cov_time_day"))
    val w = Window.partitionBy(col("id_mcaid"))
      .orderBy(col("cov_time_day").desc, col("dual"),
        col("bsp_group_cid"), col("full_benefit"), col("cov_type"))
    rolled.withColumn("_rk", rank().over(w)).filter(col("_rk") === 1)
      .select(col("id_mcaid"), col("dual"), col("bsp_group_cid"),
        col("full_benefit"), col("cov_type")).distinct()
  }

  /** Step 5's 5-arm tabulation over a coverage pick. */
  def coverageTabulation(picked: DataFrame, racRef: DataFrame): DataFrame = {
    def arm(order: Int, cat: String, group: Column, src: DataFrame) =
      src.groupBy(group.cast("string").as("cov_group"))
        .agg(countDistinct(col("id_mcaid")).as("id_dcount"))
        .select(lit(order).as("sort_order"), lit(cat).as("cov_group_cat"),
          col("cov_group"), col("id_dcount"))
    val named = picked.join(broadcast(racRef), Seq("bsp_group_cid"),
      "left")
    // the overall arm is a SCALAR aggregate (no GROUP BY) in the
    // reference — one row even over an empty pick
    val overall = picked
      .agg(countDistinct(col("id_mcaid")).as("id_dcount"))
      .select(lit(1).as("sort_order"), lit("overall").as("cov_group_cat"),
        lit("1").as("cov_group"), col("id_dcount"))
    overall
      .unionByName(arm(2, "dual", col("dual"), picked))
      .unionByName(arm(3, "full_benefit", col("full_benefit"), picked))
      .unionByName(arm(4, "cov_type", col("cov_type"), picked))
      .unionByName(arm(5, "bsp_group_name", col("bsp_group_name"), named))
  }
}
