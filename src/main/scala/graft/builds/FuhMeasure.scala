package graft.builds

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** FUH (Follow-up After Hospitalization for Mental Illness) feeder — the
  * reference's view/sproc family
  * (create_stage.v_perf_fuh_inpatient_index_stay.sql,
  * create_stage.v_perf_fuh_inpatient_index_stay_readmit.sql,
  * create_stage.v_perf_fuh_follow_up_visit.sql,
  * create_stage.sp_perf_fuh_join_step.sql).
  *
  * Shapes: HEDIS value-set membership is pure distinct-set algebra over
  * (person, claim) pairs; the join step is three person-keyed equi-joins
  * with date-range residuals (last-discharge collapse, readmit exclusion,
  * follow-up attach). Every join here shuffles on the person id only, so
  * the plan is a sequence of hash joins co-partitioned on one key — no
  * cartesian products, no global windows (the collapse window partitions
  * by claim id).
  *
  * All claim-membership frames carry (id_person, claim_id); `header`
  * carries (claim_id, admit_date, discharge_date, first_service_date,
  * last_service_date); `demo` carries (id_person, dob).
  */
object FuhMeasure {

  /** Shared follow-up-attachment kernel of the FUH and FUM join steps:
    * left range-join a per-person visit frame (id_person, service_date,
    * flag) onto `df` over [dateCol + fromOffset, dateCol + days] and
    * aggregate one MAX flag per input row. FUH windows start at +1; FUM's
    * are day-0 inclusive — the only difference between the two sprocs'
    * attachment joins, so it is a parameter, not a second copy. */
  private[builds] def attachMaxFlag(df: DataFrame, visits: DataFrame,
      fromOffset: Int, days: Int, dateCol: String,
      outCol: String): DataFrame = {
    val v = visits.select(col("id_person").as("f_id"),
      col("service_date").as("f_date"), col("flag").as("f_flag"))
    val keys = df.columns.map(col)
    df.join(v,
        col("id_person") === col("f_id") &&
        col("f_date").between(date_add(col(dateCol), fromOffset),
          date_add(col(dateCol), days)), "left")
      .groupBy(keys.toSeq: _*)
      .agg(max(coalesce(col("f_flag"), lit(0))).as(outCol))
  }

  /** 31-day follow-up period fits one calendar month only when the event
    * lands on the 1st of a 31-day month (sp_perf_fuh_join_step.sql:121,
    * sp_perf_fum_join_step.sql — identical CASE in both). */
  private[builds] def need1MonthCoverage(
      d: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(dayofmonth(d) === 1 && month(d).isin(1, 3, 5, 7, 8, 10, 12), 1)
      .otherwise(0)

  /** Acute qualifying stays for one diagnosis value set: dx-claims
    * INTERSECT (Inpatient Stay EXCEPT Nonacute Inpatient Stay) — the
    * v_perf_fuh_inpatient_index_stay.sql:65-130 set algebra (T-SQL set ops
    * are distinct set ops; so are these). */
  def acuteStays(dx: DataFrame, inpatient: DataFrame,
      nonacute: DataFrame): DataFrame =
    dx.intersect(inpatient.except(nonacute))

  /** (person, claim) pairs -> tagged index-stay rows: demographics join
    * for the exact-anniversary age at COALESCE(discharge, last_service)
    * (v_perf_fuh_inpatient_index_stay.sql:205), header join for stay
    * dates — the ONE select both the set-op and the one-scan paths share
    * (so a change to the age or date semantics cannot drift between
    * them; FuhMeasureSpec additionally pins the equality). */
  private def stayRows(pairs: DataFrame, name: String, demo: DataFrame,
      header: DataFrame): DataFrame =
    pairs.select(col("id_person"), col("claim_id"))
      .join(demo.select(col("id_person"), col("dob")), Seq("id_person"))
      .join(header, Seq("claim_id"))
      .select(lit(name).as("value_set_name"), col("id_person"),
        FuaMeasure.ageAt(col("dob"),
          coalesce(col("discharge_date"), col("last_service_date")))
          .as("age"),
        col("claim_id"), col("admit_date"), col("discharge_date"),
        lit(1).as("flag"))

  private def readmitRows(tagged: DataFrame, header: DataFrame): DataFrame =
    tagged.join(header.select(col("claim_id"), col("admit_date"),
      col("discharge_date")), Seq("claim_id"))
      .select(col("id_person"), col("claim_id"), col("admit_date"),
        col("discharge_date"), col("acuity"), lit(1).as("flag"))

  /** The stacked index-stay view: Mental Illness + Mental Health Diagnosis
    * acute stays over the set-algebra path. */
  def indexStays(miDx: DataFrame, mhdDx: DataFrame, inpatient: DataFrame,
      nonacute: DataFrame, demo: DataFrame, header: DataFrame): DataFrame =
    stayRows(acuteStays(miDx, inpatient, nonacute), "Mental Illness",
        demo, header)
      .unionAll(stayRows(acuteStays(mhdDx, inpatient, nonacute),
        "Mental Health Diagnosis", demo, header))

  /** Readmission/direct-transfer candidates
    * (v_perf_fuh_inpatient_index_stay_readmit.sql): nonacute stays
    * (Inpatient INTERSECT Nonacute) regardless of diagnosis, UNION acute
    * stays ((Inpatient EXCEPT Nonacute) EXCEPT MHD-principal-dx) — i.e.
    * acute readmits only count when NOT for mental health. */
  def readmitStays(mhdDx: DataFrame, inpatient: DataFrame,
      nonacute: DataFrame, header: DataFrame): DataFrame = {
    val nonacuteStays = inpatient.intersect(nonacute)
      .withColumn("acuity", lit("Nonacute"))
    val acuteNonMh = inpatient.except(nonacute).except(mhdDx)
      .withColumn("acuity", lit("Acute"))
    readmitRows(nonacuteStays.union(acuteNonMh), header)
  }

  /** Single-scan membership flags — the 100-TB shape of the index-stay /
    * readmit algebra. The reference's input IS one value-set membership
    * table (stage.mcaid_claim_value_set); expressing each value set as a
    * filtered view makes the distinct-set algebra re-scan that table six
    * times. Because every set is a projection of the same (person, claim)
    * key space, INTERSECT ≡ AND, EXCEPT ≡ AND NOT over per-claim MAX
    * flags — ONE scan + one partial-aggregated shuffle for the whole
    * algebra. [[FuhMeasureSpec]] pins equality against the set-op path.
    *
    * @param valueSets (id_person, claim_id, value_set_name, code_set,
    *                  primary_dx_only) membership rows
    * @return one row per (id_person, claim_id) with mi/mhd/inp/na flags
    */
  def membershipFlags(valueSets: DataFrame): DataFrame = {
    def m(c: org.apache.spark.sql.Column) = max(when(c, 1).otherwise(0))
    valueSets.groupBy(col("id_person"), col("claim_id")).agg(
      m(col("value_set_name") === "Mental Illness" &&
        col("code_set") === "ICD10CM" && col("primary_dx_only") === "Y")
        .as("mi"),
      m(col("value_set_name") === "Mental Health Diagnosis" &&
        col("code_set") === "ICD10CM" && col("primary_dx_only") === "Y")
        .as("mhd"),
      m(col("value_set_name") === "Inpatient Stay" &&
        col("code_set") === "UBREV").as("inp"),
      m(col("value_set_name") === "Nonacute Inpatient Stay" &&
        col("code_set").isin("UBREV", "UBTOB")).as("na"))
  }

  /** [[indexStays]] from one [[membershipFlags]] pass: MI/MHD acute =
    * dx AND inp AND NOT na. */
  def indexStaysOneScan(flags: DataFrame, demo: DataFrame,
      header: DataFrame): DataFrame = {
    val acute = col("inp") === 1 && col("na") === 0
    stayRows(flags.filter(col("mi") === 1 && acute), "Mental Illness",
        demo, header)
      .unionAll(stayRows(flags.filter(col("mhd") === 1 && acute),
        "Mental Health Diagnosis", demo, header))
  }

  /** [[readmitStays]] from the same flags pass: nonacute = inp AND na;
    * acute non-MH = inp AND NOT na AND NOT mhd. */
  def readmitStaysOneScan(flags: DataFrame, header: DataFrame): DataFrame =
    readmitRows(flags
      .withColumn("acuity",
        when(col("inp") === 1 && col("na") === 1, "Nonacute")
          .when(col("inp") === 1 && col("na") === 0 && col("mhd") === 0,
            "Acute"))
      .filter(col("acuity").isNotNull), header)

  /** Qualifying follow-up visits (v_perf_fuh_follow_up_visit.sql): the
    * UNION of condition frames, each (id_person, claim_id, service_date);
    * frames in `thirtyDayOnly` (TCM 14 Day) only satisfy the 30-day
    * indicator. Dedup keeps MAX(only_30_day_fu) per visit — the
    * reference's GROUP BY ... MAX (sql:268, verified verbatim), so a
    * visit matching both a 'Y' and an 'N' condition resolves to 'Y'
    * ('Y' > 'N') and is thereby SUPPRESSED from the 7-day window even
    * though an 'N' condition qualified it — arguably a reference bug
    * (MIN would let the both-windows condition win), replicated
    * faithfully because HEDIS certification audits against this SQL. */
  def followUpVisits(sevenAndThirty: Seq[DataFrame],
      thirtyDayOnly: Seq[DataFrame]): DataFrame = {
    def tag(dfs: Seq[DataFrame], v: String) = dfs.map(
      _.select(col("id_person"), col("claim_id"), col("service_date"),
        lit(1).as("flag"), lit(v).as("only_30_day_fu")))
    (tag(sevenAndThirty, "N") ++ tag(thirtyDayOnly, "Y"))
      .reduce(_ union _)
      .groupBy(col("id_person"), col("claim_id"), col("service_date"),
        col("flag"))
      .agg(max(col("only_30_day_fu")).as("only_30_day_fu"))
  }

  /** The join step (create_stage.sp_perf_fuh_join_step.sql):
    *
    * 1. Collapse chained discharges: an MI index discharge followed by an
    *    MHD discharge within 30 days retains only the LAST discharge
    *    (row_number over claim, ordered by the later discharge desc).
    *    The reference's ORDER BY b.discharge_date DESC ties are broken
    *    nondeterministically; we add claim_id DESC so the pick is stable
    *    across engines.
    * 2. Exclude index stays with a readmission/direct-transfer admission
    *    within the 30-day follow-up window.
    * 3. Attach the 7-day and 30-day follow-up indicators. The reference
    *    left-joins both frames at once and aggregates (fan-out product per
    *    stay); we join+aggregate sequentially — identical MAX semantics,
    *    and the intermediate stays one row per stay instead of
    *    |fu7|x|fu30| rows, which is the plan you want when a member has
    *    many qualifying visits.
    *
    * Returns one row per surviving index stay with ym (discharge month),
    * need_1_month_coverage, follow_up_7_day, follow_up_30_day. */
  def joinStep(indexStays: DataFrame, readmit: DataFrame,
      followUp: DataFrame, startDate: String, endDate: String): DataFrame = {
    val start = to_date(lit(startDate))
    val end = to_date(lit(endDate))
    val inWin = col("discharge_date").between(start, end)

    // step 1: last-discharge collapse
    val a = indexStays.filter(col("value_set_name") === "Mental Illness" && inWin)
    val b = indexStays.filter(
        col("value_set_name") === "Mental Health Diagnosis" && inWin)
      .select(col("id_person").as("b_id"), col("age").as("b_age"),
        col("claim_id").as("b_claim"), col("admit_date").as("b_admit"),
        col("discharge_date").as("b_discharge"), col("flag").as("b_flag"))
    val wLast = Window.partitionBy(col("claim_id"))
      .orderBy(col("b_discharge").desc_nulls_last, col("b_claim").desc_nulls_last)
    val collapsed = a.join(b,
        col("id_person") === col("b_id") &&
        col("b_discharge").between(date_add(col("discharge_date"), 1),
          date_add(col("discharge_date"), 30)), "left")
      .withColumn("rn", row_number().over(wLast))
      .filter(col("rn") === 1)
      .select(
        coalesce(col("b_id"), col("id_person")).as("id_person"),
        coalesce(col("b_age"), col("age")).as("age"),
        coalesce(col("b_claim"), col("claim_id")).as("claim_id"),
        coalesce(col("b_admit"), col("admit_date")).as("admit_date"),
        coalesce(col("b_discharge"), col("discharge_date")).as("discharge_date"),
        coalesce(col("b_flag"), col("flag")).as("flag"))
      .distinct()

    // step 2: readmit exclusion within (discharge+1, discharge+30)
    val re = readmit.filter(col("admit_date").between(start, end))
      .select(col("id_person").as("r_id"), col("admit_date").as("r_admit"),
        col("flag").as("r_flag"))
    val stayCols = Seq("id_person", "age", "claim_id", "admit_date",
      "discharge_date", "flag").map(col)
    val excl = collapsed.join(re,
        col("id_person") === col("r_id") &&
        col("r_admit").between(date_add(col("discharge_date"), 1),
          date_add(col("discharge_date"), 30)), "left")
      .groupBy(stayCols: _*)
      .agg(max(coalesce(col("r_flag"), lit(0))).as("inpatient_within_30_day"))
      .filter(col("inpatient_within_30_day") === 0)
      .withColumn("need_1_month_coverage",
        need1MonthCoverage(col("discharge_date")))

    // step 3: follow-up indicators, one aggregation per window (+1-based)
    val fu = followUp.filter(col("service_date").between(start, end))
    val with7 = attachMaxFlag(excl,
      fu.filter(col("only_30_day_fu") === "N"), 1, 7, "discharge_date",
      "follow_up_7_day")
    val with30 = attachMaxFlag(with7, fu, 1, 30, "discharge_date",
      "follow_up_30_day")
    with30
      .withColumn("ym",
        year(col("discharge_date")) * 100 + month(col("discharge_date")))
      .withColumnRenamed("flag", "inpatient_index_stay")
  }
}
