package graft.builds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** AMR — asthma medication ratio (HEDIS / reference measure_id 19,
  * load_stage.mcaid_perf_measure_amr.R), the one perf-measure family
  * member previously unrepresented. Per measurement-year end month:
  *
  *  pop      enroll-denom rows full_benefit_t_12_m >= 11, non-dual,
  *           age 5-64 at the measurement year end (:47-76);
  *  dx       asthma diagnosis events = header × icdcm × the HEDIS
  *           'Asthma' value set, with the ICD version decoded from the
  *           4th character of code_system ('ICD9CM' → 9) exactly like
  *           the reference (:84-99);
  *  events   trailing-12-month signals per person — ED and inpatient
  *           counts on primary-asthma claims, outpatient distinct
  *           service dates on any-asthma claims with an 'Outpatient'
  *           procedure, and FIVE pharmacy event buckets (oral
  *           leukotriene / oral other: per-(fill, generic)
  *           days-supply-to-30-day units, floor semantics; inhaler:
  *           distinct generics per fill; antibody / other injectables:
  *           NDC-rows per fill), full-joined and zero-filled
  *           (:102-440);
  *  any      identification flags: ED, inpatient, outpatient (visit +
  *           >2 rx events), rx-only (>= 4 events, and if ALL events are
  *           oral-leukotriene/antibody ones a diagnosis must exist —
  *           the dx_needed/dx_made rule), rx_any (:545-590);
  *  persist  persistent asthma = identified in BOTH the measurement
  *           year and the prior year (self-join on end_month - 1 year,
  *           :600-613);
  *  excl     ever-diagnosis in the 7 respiratory exclusion value sets
  *           before the year end (:480-530);
  *  amr      numerator: controller units / (controller + reliever)
  *           units, med units = 30-day blocks for oral (ceiling),
  *           quantity/package-size ceiling for injectables, 1 per fill
  *           for inhalers (:640-700). The reference computes the final
  *           ratio with T-SQL INTEGER division (`meds_control /
  *           (meds_control + meds_relief)` over ints — collapsing amr
  *           to {0,1}); this build computes the evident-intent REAL
  *           ratio, matching the HEDIS >= 0.5 numerator rule the next
  *           statement applies. Divergence documented here.
  *
  * Output: one perf_measure row per qualifying (person, year) with the
  * ratio, the >= 0.5 numerator flag, and the 10-year age group.
  *
  * Scale shape: every per-window frame is a filtered scan + broadcast
  * code-set join + person-keyed partial agg; windows (annual) union.
  * The full joins key on (person, fill_date) — high-cardinality, no
  * skew. Nothing is quadratic; the persistence check is a person-keyed
  * self-join of the small identified population.
  */
object AmrMeasure {

  private val exclusionSets = Seq("Emphysema", "Other Emphysema", "COPD",
    "Obstructive Chronic Bronchitis",
    "Chronic Respiratory Conditions Due To Fumes/Vapors",
    "Cystic Fibrosis", "Acute Respiratory Failure")

  /** HEDIS value-set codes with the ICD version decoded from
    * code_system's 4th character (reference :95-97). */
  private def vsCodes(valueSets: DataFrame, names: Seq[String]): DataFrame =
    valueSets.filter(col("value_set_name").isin(names: _*))
      .select(col("code"),
        when(substring(col("code_system"), 4, 1) === "9", 9).otherwise(10)
          .as("dx_ver"))
      .distinct()

  /** One 30-day drug event per (fill, generic); floor blocks beyond 30
    * days (denominator-side semantics, :190-199). */
  private def supplyEvents(c: Column): Column =
    when(c <= 30, 1).otherwise(floor(c / 30).cast("int"))

  def build(pop: DataFrame, header: DataFrame, dx: DataFrame,
      proc: DataFrame, pharm: DataFrame, valueSets: DataFrame,
      medLists: DataFrame, ageGrp: DataFrame,
      endMonths: Seq[String]): DataFrame = {
    val asthmaCodes = vsCodes(valueSets, Seq("Asthma"))
    val exclCodes = vsCodes(valueSets, exclusionSets)
    val outpatCodes = valueSets
      .filter(col("value_set_name") === "Outpatient")
      .select(col("code").as("procedure_code")).distinct()
    // asthma dx events (person, claim, date, dx slot)
    val asthmaDx = header
      .select(col("id_mcaid"), col("claim_header_id"),
        col("first_service_date"))
      .join(dx.select(col("id_mcaid"), col("claim_header_id"),
        col("icdcm_norm"), col("icdcm_version"), col("icdcm_number")),
        Seq("id_mcaid", "claim_header_id"))
      .join(broadcast(asthmaCodes),
        col("icdcm_norm") === col("code") &&
          col("icdcm_version") === col("dx_ver"))
      .select(col("id_mcaid"), col("claim_header_id"),
        col("first_service_date"), col("icdcm_number"))
    val meds = medLists.filter(col("code_system") === "NDC" &&
      col("medication_list_name").isin("Asthma Controller Medications",
        "Asthma Reliever Medications"))

    def window(em: String): (Column, Column) = {
      val end = to_date(lit(em))
      (date_add(add_months(end, -12), 1), end)
    }

    // ---- identification (denominator) per measurement year ----
    val anyByWindow = endMonths.map { em =>
      val (lo, hi) = window(em)
      val endLit = to_date(lit(em))
      val popW = pop
        .filter(col("full_benefit_t_12_m") >= 11 &&
          col("dual_t_12_m") === 0 && col("end_month_age") >= 5 &&
          col("end_month_age") < 65 && col("end_month") === endLit)
        .select(col("id_mcaid"), col("year_month"), col("end_month_age"),
          col("beg_measure_year_month"), lit(1).as("enroll_flag"))
      val edInpat = header
        .filter((col("ed_perform") === 1 || col("inpatient") === 1) &&
          col("first_service_date").between(lo, hi))
        .join(asthmaDx.filter(col("icdcm_number") === "01")
          .select(col("id_mcaid"), col("claim_header_id")),
          Seq("id_mcaid", "claim_header_id"))
        .groupBy(col("id_mcaid"))
        .agg(sum(col("ed_perform")).as("ed_cnt"),
          sum(col("inpatient")).as("inpat_cnt"))
      val outpat = header
        .filter(col("first_service_date").between(lo, hi))
        .join(asthmaDx.select(col("id_mcaid"), col("claim_header_id")),
          Seq("id_mcaid", "claim_header_id"))
        .join(proc.select(col("id_mcaid"), col("claim_header_id"),
          col("procedure_code")), Seq("id_mcaid", "claim_header_id"))
        .join(broadcast(outpatCodes), Seq("procedure_code"))
        .groupBy(col("id_mcaid"))
        .agg(countDistinct(col("first_service_date")).as("outpat_cnt"))
      // five pharmacy buckets over the window
      val fills = pharm.filter(col("rx_fill_date").between(lo, hi))
        .join(broadcast(meds), col("ndc") === meds("code"))
      def supplyBucket(routeCond: Column, name: String): DataFrame =
        fills.filter(routeCond)
          .groupBy(col("id_mcaid"), col("rx_fill_date"),
            col("generic_product_name"))
          .agg(supplyEvents(sum(col("rx_days_supply"))).as("ev"))
          .groupBy(col("id_mcaid"), col("rx_fill_date"))
          .agg(sum(col("ev")).as(name))
      def ndcBucket(routeCond: Column, name: String): DataFrame =
        fills.filter(routeCond)
          .select(col("id_mcaid"), col("rx_fill_date"), col("ndc"))
          .distinct()
          .groupBy(col("id_mcaid"), col("rx_fill_date"))
          .agg(count(lit(1)).as(name))
      val oralLk = supplyBucket(col("route") === "oral" &&
        col("drug_class") === "Leukotriene modifiers", "events_oral_lk")
      val oralNonLk = supplyBucket(col("route") === "oral" &&
        col("drug_class") =!= "Leukotriene modifiers", "events_oral_non_lk")
      val inhaler = fills.filter(col("route") === "inhalation")
        .groupBy(col("id_mcaid"), col("rx_fill_date"))
        .agg(countDistinct(col("generic_product_name")).as("events_inhaler"))
      val injAntib = ndcBucket(col("route").isin("intravenous",
        "subcutaneous") && col("drug_class") === "Antibody inhibitor",
        "events_inject_antib")
      val injNonAntib = ndcBucket(col("route").isin("intravenous",
        "subcutaneous") && col("drug_class") =!= "Antibody inhibitor",
        "events_inject_non_antib")
      val keys = Seq("id_mcaid", "rx_fill_date")
      val rxRows = oralLk
        .join(oralNonLk, keys, "full").join(inhaler, keys, "full")
        .join(injAntib, keys, "full").join(injNonAntib, keys, "full")
        .na.fill(0L, Seq("events_oral_lk", "events_oral_non_lk",
          "events_inhaler", "events_inject_antib", "events_inject_non_antib"))
        .withColumn("events_rx", col("events_oral_lk") +
          col("events_oral_non_lk") + col("events_inhaler") +
          col("events_inject_antib") + col("events_inject_non_antib"))
        .withColumn("dx_needed_cnt",
          col("events_oral_lk") + col("events_inject_antib"))
      val dxMade = asthmaDx
        .filter(col("first_service_date").between(lo, hi))
        .select(col("id_mcaid")).distinct()
        .withColumn("dx_made", lit(1))
      val rxEvent = rxRows.groupBy(col("id_mcaid"))
        .agg(sum(col("events_rx")).as("events_rx"),
          when(sum(col("events_rx")) === sum(col("dx_needed_cnt")), 1)
            .otherwise(0).as("dx_needed"))
        .join(dxMade, Seq("id_mcaid"), "left")
        .withColumn("dx_made", coalesce(col("dx_made"), lit(0)))
      popW
        .join(edInpat, Seq("id_mcaid"), "full")
        .join(outpat, Seq("id_mcaid"), "full")
        .join(rxEvent, Seq("id_mcaid"), "full")
        .na.fill(0L, Seq("enroll_flag", "ed_cnt", "inpat_cnt",
          "outpat_cnt", "events_rx", "dx_needed", "dx_made"))
        .withColumn("end_month", endLit)
        .withColumn("ed_flag", (col("ed_cnt") > 0).cast("int"))
        .withColumn("inpat_flag", (col("inpat_cnt") > 0).cast("int"))
        .withColumn("outpat_flag",
          (col("outpat_cnt") > 0 && col("events_rx") > 2).cast("int"))
        .withColumn("rx_flag", when(col("events_rx") >= 4 &&
          (col("dx_needed") === 0 || col("dx_made") === 1), 1).otherwise(0))
        .withColumn("rx_any", (col("events_rx") > 0).cast("int"))
        .filter(col("ed_flag") === 1 || col("inpat_flag") === 1 ||
          col("outpat_flag") === 1 || col("rx_flag") === 1)
        .withColumn("past_year", add_months(col("end_month"), -12))
    }
    val anyAll = anyByWindow.reduce(_.unionByName(_))
    // persistent = identified this year AND the prior year
    val priorIds = anyAll
      .select(col("id_mcaid").as("prior_id"),
        col("end_month").as("prior_end"), lit(1).as("persistent"))
    val persist = anyAll.join(priorIds,
        col("id_mcaid") === col("prior_id") &&
          col("past_year") === col("prior_end"), "left")
      .drop("prior_id", "prior_end")
      .withColumn("persistent", coalesce(col("persistent"), lit(0)))
    // ever-exclusions before each year end
    val excl = endMonths.map { em =>
      val endLit = to_date(lit(em))
      header.filter(col("first_service_date") <= endLit)
        .select(col("id_mcaid"), col("claim_header_id"))
        // inner both hops: the exclusion-code match discards any
        // null-extended dx row anyway, so a left join here would only
        // obscure the semantics and the plan
        .join(dx.select(col("id_mcaid"), col("claim_header_id"),
          col("icdcm_norm"), col("icdcm_version")),
          Seq("id_mcaid", "claim_header_id"))
        .join(broadcast(exclCodes), col("icdcm_norm") === col("code") &&
          col("icdcm_version") === col("dx_ver"))
        .select(col("id_mcaid")).distinct()
        .withColumn("end_month", endLit)
        .withColumn("dx_exclude", lit(1))
    }.reduce(_.unionByName(_))
    val denom = persist.join(excl, Seq("id_mcaid", "end_month"), "left")
      .withColumn("dx_exclude", coalesce(col("dx_exclude"), lit(0)))
    // ---- numerator: controller/reliever med units ----
    val medUnits = pharm
      .join(broadcast(meds), col("ndc") === meds("code"))
      .groupBy(col("id_mcaid"), col("medication_list_name"),
        col("rx_fill_date"), col("route"), col("generic_product_name"),
        col("rx_quantity"), col("package_size"))
      .agg(sum(col("rx_days_supply")).as("supply"))
      .withColumn("med_units",
        when(col("route") === "oral" && col("supply") <= 30, 1.0)
          .when(col("route") === "oral",
            ceil(col("supply") / 30.0).cast("double"))
          .when(col("route").isin("intravenous", "subcutaneous"),
            ceil(col("rx_quantity") / col("package_size")).cast("double"))
          .when(col("route") === "inhalation", 1.0))
    val amr = endMonths.map { em =>
      val (lo, hi) = window(em)
      val inWin = medUnits.filter(col("rx_fill_date").between(lo, hi))
      def side(list: String, name: String) = inWin
        .filter(col("medication_list_name") === list)
        .groupBy(col("id_mcaid")).agg(sum(col("med_units")).as(name))
      side("Asthma Controller Medications", "meds_control")
        .join(side("Asthma Reliever Medications", "meds_relief"),
          Seq("id_mcaid"), "full")
        .na.fill(0.0, Seq("meds_control", "meds_relief"))
        .withColumn("end_month", to_date(lit(em)))
        .withColumn("amr", when(col("meds_control") + col("meds_relief") > 0,
          round(col("meds_control") /
            (col("meds_control") + col("meds_relief")), 4))
          .otherwise(0.0))
    }.reduce(_.unionByName(_))
    // ---- final assembly ----
    denom
      .filter(col("enroll_flag") === 1 && col("rx_any") === 1 &&
        col("persistent") === 1 && col("dx_exclude") === 0)
      .join(amr.select(col("id_mcaid"), col("end_month"), col("amr")),
        Seq("id_mcaid", "end_month"), "left")
      .join(broadcast(ageGrp.select(col("age").as("end_month_age"),
        col("age_grp_10"))), Seq("end_month_age"), "left")
      .select(col("beg_measure_year_month").as("beg_year_month"),
        col("year_month").as("end_year_month"), col("id_mcaid"),
        col("end_month"), col("end_month_age"),
        col("age_grp_10").as("age_grp"),
        lit(19).as("measure_id"), lit(1).as("denominator"),
        col("amr"),
        (col("amr") >= 0.5).cast("int").as("numerator"))
  }
}
