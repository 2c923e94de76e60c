package graft.qa

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The APCD line-level QA batteries (stage/tables/qa_stage.apcd_*.sql)
  * re-expressed at population scale.
  *
  * The reference scripts spot-check HAND-PICKED exemplar members/claims
  * ("kid with multiple possible birthdays", "person with pregap", one
  * claim_header_id) against the table each was derived from, with
  * commented-out finder queries for locating fresh exemplars after each
  * extract. Spark-first that becomes: run the finder over EVERY member,
  * re-derive the expectation for each reference category independently
  * of the build's own mechanics, and emit one verdict row per category
  * with population counts — the same checks, except nobody has to pick
  * ids, and a regression anywhere in the population moves a count.
  *
  * Scale shape: every battery is per-key aggregations on the audited
  * table's own grain (member / claim header) followed by one verdict
  * rollup — the joins are all on the high-cardinality natural key, no
  * window is unpartitioned, nothing collects.
  */
object ApcdLineQa {

  /** qa_stage.apcd_claim_provider.sql: the stage table is a pure
    * reshape of the medical-claim provider slots, so the audit is
    * set-equality per provider slot type — every non-null source slot
    * appears as exactly one stage row with that (header, type, id),
    * nothing extra appears, and the service dates ride along unchanged
    * (the reference eyeballs one header_id = 629250074914541 across
    * billing/rendering/attending/referring + both dates).
    *
    * Output: one row per provider_type with source/stage/missing/extra
    * counts, plus a `service_dates` row counting stage rows whose date
    * pair disagrees with the source header's.
    */
  def claimProviderQa(stage: DataFrame, medClaim: DataFrame): DataFrame = {
    val src = medClaim.select(col("claim_header_id"),
      expr("""stack(4,
        'attending', attending_internal_provider_id,
        'billing', billing_provider_internal_id,
        'referring', referring_internal_provider_id,
        'rendering', rendering_internal_provider_id)
        AS (provider_type, provider_id)"""))
      .filter(col("provider_id").isNotNull)
    val st = stage.select(col("claim_header_id"), col("provider_type"),
      col("provider_id_apcd").as("provider_id"),
      col("first_service_date"), col("last_service_date"))
    val joined = src.withColumn("in_src", lit(1))
      .join(st.select(col("claim_header_id"), col("provider_type"),
          col("provider_id")).withColumn("in_st", lit(1)),
        Seq("claim_header_id", "provider_type", "provider_id"),
        "full_outer")
    val slots = joined.groupBy(col("provider_type")).agg(
      coalesce(sum(col("in_src")), lit(0)).cast("long").as("n_source"),
      coalesce(sum(col("in_st")), lit(0)).cast("long").as("n_stage"),
      coalesce(sum(when(col("in_st").isNull, 1)), lit(0)).cast("long")
        .as("n_missing"),
      coalesce(sum(when(col("in_src").isNull, 1)), lit(0)).cast("long")
        .as("n_extra"))
    val dates = st.join(medClaim.select(col("claim_header_id"),
        col("first_service_dt"), col("last_service_dt")),
        Seq("claim_header_id"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(
            col("first_service_date") =!= col("first_service_dt") ||
            col("last_service_date") =!= col("last_service_dt"), 1)),
          lit(0)).as("bad"))
      .select(lit("service_dates").as("provider_type"),
        col("n").cast("long").as("n_source"),
        col("n").cast("long").as("n_stage"),
        col("bad").cast("long").as("n_missing"),
        lit(0L).as("n_extra"))
    slots.unionByName(dates)
      .select(lit("stage.apcd_claim_provider").as("table_name"),
        col("provider_type"), col("n_source"), col("n_stage"),
        col("n_missing"), col("n_extra"),
        (col("n_missing") === 0 && col("n_extra") === 0).cast("int")
          .as("pass"))
  }

  private def verdictRow(df: DataFrame, table: String, category: String,
      checked: Column, fail: Column): DataFrame =
    df.agg(coalesce(sum(checked.cast("long")), lit(0L)).as("n_checked"),
        coalesce(sum(fail.cast("long")), lit(0L)).as("n_fail"))
      .select(lit(table).as("table_name"),
        lit(category).as("qa_category"),
        col("n_checked").cast("long"), col("n_fail").cast("long"),
        (col("n_fail") === 0).cast("int").as("pass"))

  /** qa_stage.apcd_elig_demo.sql: the reference spot-checks one member
    * per category — age bands with/without an observed birthday
    * increment, the 90-top-code, male/female/multiple/partial-unknown/
    * fully-unknown gender, and seven race configurations — each against
    * the member-month or eligibility table it was derived from. At
    * population scale each category becomes a re-derivation over EVERY
    * member in it, built with different mechanics than the audited
    * build (pair self-join instead of lag for the birthday increment,
    * max_by instead of lead-null for the last-month estimate, direct
    * grouped aggregation instead of window passes for gender/race), so
    * a mechanic bug in either side moves a count.
    *
    * One divergence from the QA script's comments, kept deliberately:
    * "Age 90+ with age of 90 only … dob should be null" — the load
    * script itself (load_stage.apcd_elig_demo.R:37-39) has no nulling
    * branch; a constant-90 member gets the last-month dob_2 estimate
    * like any other single-age member, and the battery checks THAT
    * (the build's real convention), with ninety_only carrying the
    * top-code signal.
    *
    * `demo` is the audited build output; `mm` the member-month detail
    * (id_apcd, year_month yyyymm-string, age, gender_code); `elig` the
    * eligibility extract; `ethMap` the ethnicity→race map. */
  def eligDemoQa(demo: DataFrame, mm: DataFrame, elig: DataFrame,
      ethMap: DataFrame): DataFrame = {
    val t = "stage.apcd_elig_demo"
    val m = mm.select(col("id_apcd"),
      col("year_month").cast("int").as("ym"), col("age"),
      col("gender_code"))

    // --- dob: birthday-increment members (pair self-join, no window)
    val a = m.select(col("id_apcd"), col("ym"), col("age"))
    val pairs = a.as("p").join(a.as("q"),
        col("p.id_apcd") === col("q.id_apcd") &&
        (col("q.ym") - col("p.ym")).isin(1, 89) &&
        col("q.age") - col("p.age") === 1)
      .select(col("p.id_apcd").as("id_apcd"),
        // the build lags the PREVIOUS month's (age+1)*100; with the
        // increment pinned at 1 that equals the current month's age*100
        to_date(concat((col("q.ym") - col("q.age") * 100)
          .cast("string"), lit("01")), "yyyyMMdd").as("dob_imp"))
    val incExp = pairs.groupBy(col("id_apcd"))
      .agg(max(col("dob_imp")).as("dob_inc"))
    // --- dob: single-age members (max_by, no lead)
    val lastExp = m.groupBy(col("id_apcd"))
      .agg(max_by(struct(col("ym"), col("age")), col("ym")).as("lr"),
        min(col("age")).as("min_age"))
      .select(col("id_apcd"), col("min_age"),
        add_months(to_date(concat(
          (col("lr.ym") - (col("lr.age") + 1) * 100).cast("string"),
          lit("01")), "yyyyMMdd"), 1).as("dob_est"))
    val dj = demo.select(col("id_apcd"), col("dob"), col("ninety_only"))
      .join(incExp, Seq("id_apcd"), "left")
      .join(lastExp, Seq("id_apcd"), "left")
    val dobInc = verdictRow(dj, t, "dob_age_increment_members",
      col("dob_inc").isNotNull,
      col("dob_inc").isNotNull && !(col("dob") <=> col("dob_inc")))
    val dobEst = verdictRow(dj, t, "dob_single_age_members",
      col("dob_inc").isNull,
      col("dob_inc").isNull && !(col("dob") <=> col("dob_est")))
    val ninety = verdictRow(dj, t, "ninety_only_flag", lit(1),
      !(col("ninety_only") <=> (col("min_age") === 90).cast("int")))

    // --- gender: grouped aggregation, no window
    val fFlag = when(col("gender_code") === "F", 1)
      .when(col("gender_code") === "U", lit(null).cast("int"))
      .otherwise(0)
    val mFlag = when(col("gender_code") === "M", 1)
      .when(col("gender_code") === "U", lit(null).cast("int"))
      .otherwise(0)
    val known = col("gender_code").isNotNull && col("gender_code") =!= "U"
    val g = m.groupBy(col("id_apcd")).agg(
      max(fFlag).as("ev_f"), max(mFlag).as("ev_m"),
      min(when(col("gender_code") === "U", 1).otherwise(0)).as("all_u"),
      max(when(col("gender_code") === "U", 1).otherwise(0)).as("any_u"),
      max(known.cast("int")).as("any_known"),
      max_by(when(known, col("gender_code")), when(known, col("ym")))
        .as("last_known"))
    val gExp = g.select(col("id_apcd"), col("any_u"), col("any_known"),
      when(col("ev_f") === 1 && col("ev_m") === 1, "Multiple")
        .when(col("ev_f") === 1, "Female")
        .when(col("ev_m") === 1, "Male")
        .when(col("all_u") === 1, "Unknown").as("exp_me"),
      when(col("last_known") === "F", "Female")
        .when(col("last_known") === "M", "Male")
        .when(col("last_known").isNull && col("any_u") === 1, "Unknown")
        .as("exp_recent"),
      col("ev_f").as("exp_female"), col("ev_m").as("exp_male"))
    val gj = demo.select(col("id_apcd"), col("gender_me"),
        col("gender_recent"), col("gender_female"), col("gender_male"))
      .join(gExp, Seq("id_apcd"))
    val gMap = verdictRow(gj, t, "gender_slot_flags", lit(1),
      !(col("gender_me") <=> col("exp_me")) ||
      !(col("gender_female") <=> col("exp_female")) ||
      !(col("gender_male") <=> col("exp_male")))
    val gPartial = verdictRow(gj, t, "gender_partial_unknown_not_unknown",
      col("any_u") === 1 && col("any_known") === 1,
      col("any_u") === 1 && col("any_known") === 1 &&
        col("gender_me") === "Unknown")
    val gRecent = verdictRow(gj, t, "gender_recent_last_known", lit(1),
      !(col("gender_recent") <=> col("exp_recent")))

    // --- race: per-row signal recompute, grouped collapse
    val m1 = ethMap.select(col("ethnicity_id").as("ethnicity_id1"),
      col("race_id").as("r3_m"))
    val m2 = ethMap.select(col("ethnicity_id").as("ethnicity_id2"),
      col("race_id").as("r4_m"))
    val rRows = elig.join(broadcast(m1), Seq("ethnicity_id1"), "left")
      .join(broadcast(m2), Seq("ethnicity_id2"), "left")
      .select(col("id_apcd"),
        when(col("race_id1").isin(1, 2, 3, 4, 5), col("race_id1"))
          .otherwise(0).as("r1"),
        when(col("race_id2").isin(1, 2, 3, 4, 5), col("race_id2"))
          .otherwise(0).as("r2"),
        when(col("hispanic_id").isin(1, 2), col("hispanic_id"))
          .otherwise(0).as("lat"),
        coalesce(col("r3_m"), lit(0)).as("r3"),
        coalesce(col("r4_m"), lit(0)).as("r4"))
    def anyV(v: Int) = greatest(
      (col("r1") === v).cast("int"), (col("r2") === v).cast("int"),
      (col("r3") === v).cast("int"), (col("r4") === v).cast("int"))
    val rAgg = rRows.groupBy(col("id_apcd")).agg(
      max(anyV(1)).as("e_aian"), max(anyV(2)).as("e_asian"),
      max(anyV(3)).as("e_black"), max(anyV(4)).as("e_nhpi"),
      max(anyV(5)).as("e_white"),
      max((col("lat") === 1 || col("r3") === 8 || col("r4") === 8)
        .cast("int")).as("e_latino"),
      min((col("r1") === 0 && col("r2") === 0 && col("r3") === 0 &&
        col("r4") === 0 && col("lat") =!= 1).cast("int")).as("all_unk"))
    val rj = demo.select(col("id_apcd"), col("race_aian"),
        col("race_asian"), col("race_black"), col("race_latino"),
        col("race_nhpi"), col("race_white"), col("race_unknown"),
        col("race_eth_me"), col("race_me"))
      .join(rAgg, Seq("id_apcd"))
    val rFlags = verdictRow(rj, t, "race_ever_flags", lit(1),
      !(col("race_aian") <=> col("e_aian")) ||
      !(col("race_asian") <=> col("e_asian")) ||
      !(col("race_black") <=> col("e_black")) ||
      !(col("race_nhpi") <=> col("e_nhpi")) ||
      !(col("race_white") <=> col("e_white")) ||
      !(col("race_latino") <=> col("e_latino")))
    // race_eth_me is NULL (not 'Unknown') for a fully-unknown member:
    // the person collapse is max(CASE WHEN race_eth_me = 'Unknown' THEN
    // NULL END) — T-SQL MAX over all-NULL — and the reference never
    // backfills it (load_stage.apcd_elig_demo.R step 9). The battery
    // pins the REAL convention, not the QA script's labels.
    val rUnknown = verdictRow(rj, t, "race_unknown_iff_no_signal", lit(1),
      !(col("race_unknown") <=> col("all_unk")) ||
      (col("all_unk") === 1 && col("race_eth_me").isNotNull) ||
      (col("all_unk") === 0 && (col("race_eth_me").isNull ||
        col("race_eth_me") === "Unknown")))
    val nRace = col("e_aian") + col("e_asian") + col("e_black") +
      col("e_nhpi") + col("e_white")
    val latinoMult = verdictRow(rj, t, "race_latino_drives_multiple",
      nRace === 1 && col("e_latino") === 1,
      nRace === 1 && col("e_latino") === 1 &&
        (col("race_eth_me") =!= "Multiple" ||
         col("race_me") === "Multiple"))

    val unique = verdictRow(
      demo.groupBy(col("id_apcd")).agg(count(lit(1)).as("c")), t,
      "one_row_per_member", lit(1), col("c") =!= 1)

    Seq(dobInc, dobEst, ninety, gMap, gPartial, gRecent, rFlags,
        rUnknown, latinoMult, unique)
      .reduce(_ unionByName _)
  }
}
