package graft.builds

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** APCD claim-header QA battery — the reference's per-release checks
  * (load_stage.apcd_claim_header.R:1105-1258 qa_stage function, plus
  * the qa_stage.apcd_claim_header_10001.sql interactive probes) as
  * distributed verdict-count rows over the FULL staged table instead
  * of `top 1` eyeball samples.
  *
  * The reference's global-uniqueness checks on inpatient_id /
  * pc_visit_id / ed_perform_id (res8a-8d, res9a-9b) assert properties
  * of its GLOBAL `dense_rank() over (order by id_apcd,
  * first_service_date)` surrogates — a scale-hostile construct this
  * engine deliberately replaces with per-person composite surrogates
  * (id_apcd, seq). The battery pins the composite analogs: per-person
  * DENSITY (max(seq) = distinct count, i.e. no skipped values — the
  * res9a=res9b intent) and episode-window soundness (res11's 1-day
  * chain). Identity-across-persons is vacuous at composite grain.
  *
  * Scale shape: ONE conditional-agg pass over the staged frame plus
  * ONE person-grain rollup (all four seq densities fused as masked
  * aggregates), one window pass over the ED sliver only (partitioned
  * by person+episode), two key-only anti-joins for the
  * elig-membership checks, one raw-table count. Each multi-metric
  * 1-row aggregate unpivots to verdict rows via stack — nothing
  * collects claim-level data, and no frame is aggregated twice.
  */
object ApcdHeaderQa {

  private val T = "stage_apcd_claim_header"

  private def rows(df: DataFrame, table: String,
      labels: Seq[(String, String)]): DataFrame = {
    val stackArgs = labels.map { case (c, l) =>
      s"'${l.replace("'", "''")}', CAST(coalesce($c, 0) AS BIGINT)"
    }.mkString(", ")
    df.select(expr(
      s"stack(${labels.size}, $stackArgs) AS (qa_type, qa)"))
      .select(lit(table).as("table"), col("qa_type"), col("qa"))
  }

  /** @param stage        q142's build output
    * @param rawHeader    the raw medical_claim_header feed
    * @param eligDemo     frame carrying id_apcd (one row per member)
    * @param eligTimevar  frame carrying id_apcd */
  def build(stage0: DataFrame, rawHeader: DataFrame,
      eligDemo: DataFrame, eligTimevar: DataFrame): DataFrame = {
    // The battery fans out into several independent aggregate
    // consumers (global agg, person rollup, ED window, two
    // anti-joins); Spark does not share a common subplan across union
    // branches, so WITHOUT materialization the audited build would
    // re-execute once per consumer (measured 5x on q142 — 30 s vs
    // 7 s). One eager localCheckpoint trades one write of the audited
    // frame for all re-executions — the same call a 100-TB audit
    // would make, where re-running the build five times is unthinkable.
    val stage = stage0.localCheckpoint(true)

    // ONE conditional-agg pass: res1/res2/res6/res7/res10 + episodes
    val one = stage.agg(
      count(lit(1)).as("n_headers"),
      countDistinct(col("claim_header_id")).as("n_distinct"),
      sum(when(col("claim_type_id").isNull ||
        col("claim_type_apcd_id").isNull, 1L).otherwise(0L))
        .as("n_untyped"),
      sum(when(col("inpatient_seq").isNotNull &&
        col("discharge_date").isNull, 1L).otherwise(0L))
        .as("n_ipt_no_discharge"),
      sum(when(col("ed_perform_seq").isNotNull &&
        col("ed_pophealth_seq").isNull, 1L).otherwise(0L))
        .as("n_edperform_no_pophealth"),
      countDistinct(when(col("ed_pophealth_seq").isNotNull,
        concat_ws("|", col("id_apcd"), col("ed_pophealth_seq"))))
        .as("n_ph_episodes"))
    val oneRows = rows(one, T, Seq(
      "n_headers" -> "# of headers",
      "n_distinct" -> "# of distinct headers",
      "n_untyped" -> "# of claims with unmatched claim type, expect 0",
      "n_ipt_no_discharge" ->
        "# of ipt stays with no discharge date, expect 0",
      "n_edperform_no_pophealth" ->
        "# of ed_perform rows with no ed_pophealth, expect 0",
      "n_ph_episodes" -> "# of distinct (person, ed_pophealth) episodes"))

    // ONE person-grain rollup: all four seq densities, masked aggs
    val seqs = Seq("ed_pophealth_seq", "inpatient_seq", "pc_visit_seq",
      "ed_perform_seq")
    val perPerson = stage.groupBy(col("id_apcd")).agg(
      max(col(seqs.head)).as(s"mx_${seqs.head}"),
      (seqs.tail.map(c => max(col(c)).as(s"mx_$c")) ++
        seqs.map(c => countDistinct(col(c)).as(s"dc_$c"))): _*)
    val dens = perPerson.agg(
      sum(when(col(s"mx_${seqs.head}").isNotNull &&
        col(s"mx_${seqs.head}") =!= col(s"dc_${seqs.head}"), 1L)
        .otherwise(0L)).as(s"viol_${seqs.head}"),
      (seqs.tail.map(c => sum(when(col(s"mx_$c").isNotNull &&
        col(s"mx_$c") =!= col(s"dc_$c"), 1L).otherwise(0L))
        .as(s"viol_$c")) :+
        sum(col("mx_ed_pophealth_seq")).as("summax_ph")): _*)
    val densRows = rows(dens, T, Seq(
      "summax_ph" -> "sum of per-person max ed_pophealth_seq") ++
      seqs.map(c => s"viol_$c" ->
        s"# of persons with non-dense $c, expect 0"))

    // res11: inside each (person, episode), consecutive first-service
    // dates must chain with gaps <= 1 day
    val w = Window.partitionBy(col("id_apcd"), col("ed_pophealth_seq"))
      .orderBy(col("first_service_date"))
    val gapViol = stage.filter(col("ed_pophealth_seq").isNotNull)
      .withColumn("prev_f", lag(col("first_service_date"), 1).over(w))
      .agg(sum(when(col("prev_f").isNotNull &&
        datediff(col("first_service_date"), col("prev_f")) > 1, 1L)
        .otherwise(0L)).as("n_gap"))
    val gapRows = rows(gapViol, T, Seq("n_gap" ->
      "# of ed_pophealth chain gaps greater than 1 day, expect 0"))

    // raw-feed reconciliation (res3): survivors of the denied/orphan gate
    val raw = rawHeader
      .filter(col("denied_header_flag") === "N" &&
        col("orphaned_header_flag") === "N")
      .agg(count(lit(1)).as("n_raw"))
    val rawRows = rows(raw, "apcd_medical_claim_header",
      Seq("n_raw" -> "# of headers in raw table"))

    // membership (res4/res5): claim rows whose member is absent
    def notIn(dim: DataFrame, label: String) = rows(
      stage.select(col("id_apcd"))
        .join(dim.select(col("id_apcd")).distinct(), Seq("id_apcd"),
          "left_anti")
        .agg(count(lit(1)).as("n_miss")),
      T, Seq("n_miss" -> label))

    Seq(oneRows, densRows, gapRows, rawRows,
      notIn(eligDemo, "# of members not in elig_demo, expect 0"),
      notIn(eligTimevar, "# of members not in elig_timevar, expect 0"))
      .reduce(_ unionAll _)
  }
}
