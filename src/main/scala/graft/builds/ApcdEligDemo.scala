package graft.builds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** APCD elig_demo — non-time-varying demographics estimated from the
  * OnPoint member-month and eligibility extracts
  * (load_stage.apcd_elig_demo.R):
  *
  *  steps 1-2  DOB estimation and gender from member months: when age
  *             increments between two CONTIGUOUS months (year_month diff
  *             1, or 89 for Dec→Jan) the birthday month is pinned —
  *             `ym - lag((age+1)*100)` reconstructs yyyymm01 (:31-35);
  *             otherwise the last recorded (month, age) over-estimates
  *             age and the month AFTER `ym - (age+1)*100` is used
  *             (:37-39); alone-or-in-combination female/male flags with
  *             'U' mapping to NULL (:41-44), `ninety_only` for the
  *             top-coded age 90 (:27), most-recent non-unknown gender
  *             via T-SQL last_value with NULLs sorted first (:46-49),
  *             and the Multiple/Female/Male/Unknown mutually-exclusive
  *             recode (:73-78);
  *  steps 3-6  race recodes from eligibility: race_id1/2 clamped to
  *             {1..5} else 0, hispanic_id to {1,2} else 0, two
  *             ethnicity→race map joins (race_id3/4, unmapped → 0), and
  *             the alone-or-in-combination race flags — latino counts
  *             race_id3/4 = 8; race_unknown requires every signal empty
  *             (:95-152);
  *  steps 7-8  mutually-exclusive race_eth_me (latino counted) and
  *             race_me (latino excluded), with 'z_Multiple' standing in
  *             for Multiple so the last_value tie-break sorts it LAST
  *             (:163-186); most-recent race ignoring unknown rows via
  *             the same NULLs-first last_value (:194-201);
  *  step 9     person-level collapse: Multiple recomputed from the
  *             MAXed flags ignoring Unknown, z_Multiple unmasked
  *             (:214-228);
  *  step 10    member-month LEFT JOIN race — only people surviving
  *             OnPoint's member-month processing appear (:240-262).
  *
  * Determinism note: for a person whose every month is 'U'/NULL gender,
  * the reference's last_value orders by an all-NULL key and returns an
  * arbitrary tied row. We add the gender code itself as a secondary
  * NULLS-FIRST sort key, so 'U' deterministically wins over NULL —
  * the only case where the tie-break matters, since (id, year_month)
  * is unique after the DISTINCT.
  *
  * Scale shape: two person-keyed window passes (member-month, then
  * race rows) + two person-keyed partial aggregations + one person
  * join; the ethnicity map broadcasts. No global windows, nothing
  * collected.
  */
object ApcdEligDemo {

  /** Steps 1-2: member-month rollup → (id_apcd, dob, ninety_only,
    * gender_me, gender_recent, gender_female, gender_male).
    * `mm` columns: id_apcd, year_month (yyyymm string), age,
    * gender_code. */
  def memberMonthRollup(mm: DataFrame): DataFrame = {
    val ym = col("year_month").cast("int")
    val w = Window.partitionBy(col("id_apcd")).orderBy(ym)
    val lagAge = lag(col("age"), 1).over(w)
    val lagYm = lag(ym, 1).over(w)
    val lagDobBase = lag((col("age") + 1) * 100, 1).over(w)
    val leadAge = lead(col("age"), 1).over(w)
    def ymToDate(c: Column): Column =
      to_date(concat(c.cast("string"), lit("01")), "yyyyMMdd")
    // last_value(gender) ignoring 'U'/NULL months: NULLs-first key ≡
    // T-SQL; gender_code secondary key pins the all-unknown tie.
    val wRecent = Window.partitionBy(col("id_apcd"))
      .orderBy(
        when(col("gender_code") === "U" || col("gender_code").isNull,
          lit(null).cast("int")).otherwise(ym).asc_nulls_first,
        col("gender_code").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val enriched = mm
      .withColumn("dob_1",
        when(col("age") - lagAge === 1 && (ym - lagYm).isin(1, 89),
          ymToDate(ym - lagDobBase)))
      .withColumn("dob_2",
        when(leadAge.isNull,
          add_months(ymToDate(ym - (col("age") + 1) * 100), 1)))
      .withColumn("female",
        when(col("gender_code") === "F", 1)
          .when(col("gender_code") === "U", lit(null).cast("int"))
          .otherwise(0))
      .withColumn("male",
        when(col("gender_code") === "M", 1)
          .when(col("gender_code") === "U", lit(null).cast("int"))
          .otherwise(0))
      .withColumn("gender_unk",
        when(col("gender_code") === "U", 1).otherwise(0))
      .withColumn("gender_recent_raw", last(col("gender_code")).over(wRecent))
    enriched.groupBy(col("id_apcd"))
      .agg(
        coalesce(max(col("dob_1")), max(col("dob_2"))).as("dob"),
        max(col("female")).as("female"),
        max(col("male")).as("male"),
        min(col("gender_unk")).as("gender_unk"),
        when(min(col("age")) === 90, 1).otherwise(0).as("ninety_only"),
        max(col("gender_recent_raw")).as("gr"))
      .select(col("id_apcd"), col("dob"), col("ninety_only"),
        when(col("female") === 1 && col("male") === 1, "Multiple")
          .when(col("female") === 1, "Female")
          .when(col("male") === 1, "Male")
          .when(col("gender_unk") === 1, "Unknown")
          .as("gender_me"),
        when(col("gr") === "F", "Female").when(col("gr") === "M", "Male")
          .when(col("gr") === "U", "Unknown").as("gender_recent"),
        col("female").as("gender_female"),
        col("male").as("gender_male"))
  }

  /** Steps 3-9: race rollup → person grain. `elig` columns:
    * eligibility_id, id_apcd, eligibility_end_dt, race_id1, race_id2,
    * hispanic_id, ethnicity_id1, ethnicity_id2; `ethMap`:
    * (ethnicity_id, race_id). */
  def raceRollup(elig: DataFrame, ethMap: DataFrame): DataFrame = {
    val m1 = ethMap.select(col("ethnicity_id").as("ethnicity_id1"),
      col("race_id").as("race_id3_m"))
    val m2 = ethMap.select(col("ethnicity_id").as("ethnicity_id2"),
      col("race_id").as("race_id4_m"))
    def clamp(c: Column, allowed: Seq[Int]): Column =
      when(c.isin(allowed: _*), c).otherwise(0)
    val recoded = elig
      .join(broadcast(m1), Seq("ethnicity_id1"), "left")
      .join(broadcast(m2), Seq("ethnicity_id2"), "left")
      .select(col("id_apcd"), col("eligibility_end_dt"),
        clamp(col("race_id1"), Seq(1, 2, 3, 4, 5)).as("r1"),
        clamp(col("race_id2"), Seq(1, 2, 3, 4, 5)).as("r2"),
        clamp(col("hispanic_id"), Seq(1, 2)).as("latino_id"),
        coalesce(col("race_id3_m"), lit(0)).as("r3"),
        coalesce(col("race_id4_m"), lit(0)).as("r4"))
    def anyIs(v: Int): Column =
      (col("r1") === v || col("r2") === v || col("r3") === v ||
        col("r4") === v).cast("int")
    val flags = recoded
      .select(col("id_apcd"), col("eligibility_end_dt"),
        anyIs(1).as("race_aian"), anyIs(2).as("race_asian"),
        anyIs(3).as("race_black"),
        (col("latino_id") === 1 || col("r3") === 8 || col("r4") === 8)
          .cast("int").as("race_latino"),
        anyIs(4).as("race_nhpi"), anyIs(5).as("race_white"),
        (col("r1") === 0 && col("r2") === 0 &&
          (col("latino_id") === 0 || col("latino_id") === 2) &&
          col("r3") === 0 && col("r4") === 0).cast("int")
          .as("race_unknown"))
      .distinct()
    val ethSum = col("race_aian") + col("race_asian") + col("race_black") +
      col("race_latino") + col("race_nhpi") + col("race_white")
    val meSum = col("race_aian") + col("race_asian") + col("race_black") +
      col("race_nhpi") + col("race_white")
    def only(flag: String, others: Seq[String]): Column =
      others.map(col(_) === 0).reduce(_ && _) && col(flag) === 1
    val named = flags
      .withColumn("race_eth_me",
        when(ethSum > 1, "z_Multiple")
          .when(only("race_aian", Seq("race_asian", "race_black",
            "race_latino", "race_nhpi", "race_white")), "AI/AN")
          .when(only("race_asian", Seq("race_aian", "race_black",
            "race_latino", "race_nhpi", "race_white")), "Asian")
          .when(only("race_black", Seq("race_aian", "race_asian",
            "race_latino", "race_nhpi", "race_white")), "Black")
          .when(only("race_latino", Seq("race_aian", "race_asian",
            "race_black", "race_nhpi", "race_white")), "Latino")
          .when(only("race_nhpi", Seq("race_aian", "race_asian",
            "race_black", "race_latino", "race_white")), "NH/PI")
          .when(only("race_white", Seq("race_aian", "race_asian",
            "race_black", "race_latino", "race_nhpi")), "White")
          .when(col("race_unknown") === 1, "Unknown"))
      .withColumn("race_me",
        when(meSum > 1, "z_Multiple")
          .when(only("race_aian", Seq("race_asian", "race_black",
            "race_nhpi", "race_white")), "AI/AN")
          .when(only("race_asian", Seq("race_aian", "race_black",
            "race_nhpi", "race_white")), "Asian")
          .when(only("race_black", Seq("race_aian", "race_asian",
            "race_nhpi", "race_white")), "Black")
          .when(only("race_nhpi", Seq("race_aian", "race_asian",
            "race_black", "race_white")), "NH/PI")
          .when(only("race_white", Seq("race_aian", "race_asian",
            "race_black", "race_nhpi")), "White")
          .when(col("race_unknown") === 1, "Unknown")
          .otherwise("Unknown"))
    val recentKey =
      when(col("race_unknown") === 1, lit(null).cast("date"))
        .otherwise(col("eligibility_end_dt"))
    val wEth = Window.partitionBy(col("id_apcd"))
      .orderBy(recentKey.asc_nulls_first,
        col("race_eth_me").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wMe = Window.partitionBy(col("id_apcd"))
      .orderBy(recentKey.asc_nulls_first, col("race_me").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val withRecent = named
      .withColumn("race_eth_recent_raw", last(col("race_eth_me")).over(wEth))
      .withColumn("race_recent_raw", last(col("race_me")).over(wMe))
    def unmask(c: Column): Column =
      when(c === "z_Multiple", "Multiple").otherwise(c)
    withRecent.groupBy(col("id_apcd"))
      .agg(
        when(max(col("race_aian")) + max(col("race_asian")) +
            max(col("race_black")) + max(col("race_latino")) +
            max(col("race_nhpi")) + max(col("race_white")) > 1, "Multiple")
          .otherwise(max(when(col("race_eth_me") === "Unknown",
            lit(null).cast("string")).otherwise(col("race_eth_me"))))
          .as("race_eth_me"),
        when(max(col("race_aian")) + max(col("race_asian")) +
            max(col("race_black")) + max(col("race_nhpi")) +
            max(col("race_white")) > 1, "Multiple")
          .otherwise(max(when(col("race_me") === "Unknown",
            lit(null).cast("string")).otherwise(col("race_me"))))
          .as("race_me"),
        unmask(max(col("race_eth_recent_raw"))).as("race_eth_recent"),
        unmask(max(col("race_recent_raw"))).as("race_recent"),
        max(col("race_aian")).as("race_aian"),
        max(col("race_asian")).as("race_asian"),
        max(col("race_black")).as("race_black"),
        max(col("race_latino")).as("race_latino"),
        max(col("race_nhpi")).as("race_nhpi"),
        max(col("race_white")).as("race_white"),
        min(col("race_unknown")).as("race_unknown"))
  }

  /** Step 10: full build — member-month demographics LEFT JOIN race. */
  def build(mm: DataFrame, elig: DataFrame, ethMap: DataFrame): DataFrame =
    memberMonthRollup(mm)
      .join(raceRollup(elig, ethMap), Seq("id_apcd"), "left")
      .select(col("id_apcd"), col("dob"), col("ninety_only"),
        col("gender_me"), col("gender_recent"), col("gender_female"),
        col("gender_male"), col("race_eth_me"), col("race_me"),
        col("race_eth_recent"), col("race_recent"), col("race_aian"),
        col("race_asian"), col("race_black"), col("race_latino"),
        col("race_nhpi"), col("race_white"), col("race_unknown"))
}
