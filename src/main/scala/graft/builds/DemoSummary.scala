package graft.builds

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ref.mcaid_demo_summary — annual Medicaid member counts by demographic
  * measure (load_ref.mcaid_demo_summary.R:66-360), the DCHS roll-up
  * table:
  *
  *  step 1 (:66-79)   most-common geocode per (person, year): per-hash
  *         month counts, ROW_NUMBER by frequency DESC, row 1. The
  *         reference orders by frequency alone (ties nondeterministic
  *         in T-SQL); the evident intent — a deterministic pick — adds
  *         the hash as tie-break, documented divergence;
  *  step 2 (:122-148) person-year frame: gender fallback
  *         (recent 'Unknown' → mcaid-ever), the T-SQL month-boundary
  *         age at July 1 integer-divided by 12 into 7 age groups, race
  *         flags, council district + clean ZIP from the geocode ref via
  *         the picked hash; full-benefit KC rows of complete years
  *         only, and `dob <= Dec 31` (NULL dob drops, as the T-SQL
  *         WHERE does);
  *  step 3 (:237-253) UNPIVOT the 11 measures to (measure, value) long
  *         rows — a stack() generator here; T-SQL UNPIVOT drops NULL
  *         values implicitly and the reference filters value <> '0',
  *         so both filters apply; race_* measures collapse to
  *         'race_aic' with the race name as the value;
  *  step 4 (:311-327) per (year, measure, value) distinct-person
  *         counts, a per (year, measure) total joined back, lowercased
  *         values, and small-count suppression: pop 1-10 → NULL, then
  *         the reference's final UPDATE turns NULL into 0.
  *
  * Scale: the geocode pick is one (id, year, hash) partial count + an
  * (id, year) window; the long frame is a generator off one month-table
  * scan; the final tabulation aggregates on (year, measure, value) with
  * the per-(year, measure) totals joined broadcast (measure cardinality
  * is tiny). No driver collects.
  */
object DemoSummary {

  private val raceCols = Seq("race_aian", "race_asian", "race_black",
    "race_latino", "race_nhpi", "race_white", "race_unk")

  /** @param month    elig month rows: (id_mcaid, year,
    *                 geo_hash_geocode, full_benefit, geo_kc)
    * @param demo     person demographics: (id_mcaid, dob, gender_recent,
    *                 gender_me, race_aian..race_unk)
    * @param geocode  geocode ref: (geo_hash_geocode, geo_id20_kccdist,
    *                 geo_zip_clean)
    * @param currentYear rows for `year >= currentYear` are incomplete
    *                 and excluded (the reference's
    *                 `year < year(CURRENT_DATE)`)
    */
  def build(month: DataFrame, demo: DataFrame, geocode: DataFrame,
      currentYear: Int): DataFrame = {
    // ---- step 1: modal geocode per (person, year) ----
    val wPick = Window.partitionBy(col("id_mcaid"), col("year"))
      .orderBy(col("geo_freq").desc, col("geo_hash_geocode"))
    val yearlyGeo = month
      .groupBy(col("id_mcaid"), col("year"), col("geo_hash_geocode"))
      .agg(count(col("geo_hash_geocode")).as("geo_freq"))
      .withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("id_mcaid").as("g_id"), col("year").as("g_year"),
        col("geo_hash_geocode").as("g_hash"))

    // ---- step 2: person-year frame ----
    // T-SQL DATEDIFF(month, dob, July-1) counts month boundaries:
    // (year*12 + 7) - (year(dob)*12 + month(dob)); `div` truncates
    // toward zero like the T-SQL integer division
    val ageYears =
      expr("(year * 12 + 7 - year(dob) * 12 - month(dob)) div 12")
    val clients = month
      .filter(col("full_benefit") === 1 && col("geo_kc") === 1 &&
        col("year") < currentYear)
      .join(yearlyGeo, col("id_mcaid") === col("g_id") &&
        col("year") === col("g_year"), "left")
      .join(demo, Seq("id_mcaid"), "left")
      .join(broadcast(geocode),
        col("g_hash") === geocode("geo_hash_geocode"), "left")
      .filter(col("dob") <= make_date(col("year"), lit(12), lit(31)))
      .select((Seq(col("id_mcaid"), col("year"), col("dob"),
        when(col("gender_recent") === "Unknown", col("gender_me"))
          .otherwise(col("gender_recent")).as("gender"),
        when(ageYears < 18, "0-17")
          .when(ageYears.between(18, 24), "18-24")
          .when(ageYears.between(25, 34), "25-34")
          .when(ageYears.between(35, 44), "35-44")
          .when(ageYears.between(45, 54), "45-54")
          .when(ageYears.between(55, 64), "55-64")
          .when(ageYears > 64, "65+").as("age_group")) ++
        raceCols.map(col) ++
        Seq(col("geo_id20_kccdist").as("kccdist"),
          col("geo_zip_clean").as("zip"))): _*)
      .distinct()

    // ---- step 3: long frame (UNPIVOT drops NULLs; '0' filtered) ----
    val measures = Seq("gender", "age_group") ++ raceCols ++
      Seq("kccdist", "zip")
    val stackExpr = measures.map(m => s"'$m', cast($m as string)")
      .mkString(s"stack(${measures.size}, ", ", ", ") as (measure, value)")
    val long = clients.select(col("id_mcaid"), col("year"),
        expr(stackExpr))
      .filter(col("value").isNotNull && col("value") =!= "0")
      .select(col("id_mcaid"), col("year"),
        when(col("measure").startsWith("race_"), "race_aic")
          .otherwise(col("measure")).as("measure"),
        when(col("measure").startsWith("race_"),
          regexp_replace(col("measure"), "^race_", ""))
          .otherwise(col("value")).as("value"))

    // ---- step 4: tabulate + totals + suppression ----
    val totals = long.groupBy(col("year").as("t_year"),
        col("measure").as("t_measure"))
      .agg(countDistinct(col("id_mcaid")).as("total_pop"))
    val counts = long.groupBy(col("year"), col("measure"), col("value"))
      .agg(countDistinct(col("id_mcaid")).as("pop0"))
    counts
      .join(broadcast(totals), counts("year") === totals("t_year") &&
        counts("measure") === totals("t_measure"), "left")
      .select(col("year"), col("measure"), lower(col("value")).as("value"),
        // suppression: 1-10 → NULL, then the final UPDATE's NULL → 0
        when(col("pop0").between(1, 10), 0).otherwise(col("pop0"))
          .as("pop"),
        col("total_pop"))
  }
}
