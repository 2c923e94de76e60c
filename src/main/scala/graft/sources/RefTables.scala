package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-table loaders — the ref/tables/ scripts that mint the
  * lookup tables every analytic build consumes. */
object RefTables {

  /** ref.date — the time-aggregation date dimension every month/
    * quarter rollup joins (ref/tables/load_ref.date.sql, adapted in
    * the reference from Aaron Bertrand's calendar-table script): one
    * row per day over [start, start + years), with
    *  - T-SQL DATEFIRST 7 weekday semantics (Sunday = 1 — Spark's
    *    dayofweek() natively matches), is_weekend on {1, 7};
    *  - day_suffix via the reference's integer-division quirk
    *    (day/10 = 1 → 'th', so 10-19 all 'th', else by last digit);
    *  - week_of_year = T-SQL DATEPART(week): week 1 contains Jan 1,
    *    weeks advance on Sundays — floor((doy + dow(jan1) - 2)/7) + 1;
    *  - dow_in_month (nth weekday of the month — row_number per
    *    (month, weekday)) and week_of_month (dense_rank of the week
    *    number within (year, month)), both per the reference's
    *    windows;
    *  - month/quarter/year bounds as the reference computes them:
    *    first_day_month/year directly, the last_day_* and
    *    first_day_quarter as MIN/MAX windows over the generated span
    *    (equal to the true bounds because the span covers whole
    *    years, exactly as in the reference);
    *  - the federal-holiday UPDATE (New Year's, MLK 3rd-Mon-Jan,
    *    Presidents 3rd-Mon-Feb, Memorial last-Mon-May, July 4th,
    *    Labor 1st-Mon-Sep, Columbus 2nd-Mon-Oct, Veterans Nov 11,
    *    Thanksgiving 4th-Thu-Nov, Christmas Dec 25) — matched rows
    *    flip is_holiday to 'Holiday' and name themselves; everything
    *    else stays 'Non-Holiday'/NULL.
    *
    * Scale: a 40-year dim is ~14.6k rows — generated in one explode,
    * windowed per month/quarter/year partitions, broadcast everywhere
    * it joins. */
  def dateDim(s: SparkSession, startDate: String, years: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val start = to_date(lit(startDate))
    val d = col("date")
    val base = s.range(1)
      .select(explode(sequence(start,
        date_sub(add_months(start, years * 12), 1))).as("date"))
    val day = dayofmonth(d)
    val dow = dayofweek(d) // 1 = Sunday (T-SQL DATEFIRST 7)
    val weekDayName = date_format(d, "EEEE")
    val doy = dayofyear(d)
    val firstOfYear = trunc(d, "year")
    val jan1dow = dayofweek(firstOfYear)
    val week = floor((doy + jan1dow - 2) / 7) + 1
    val wMonthDow = Window.partitionBy(trunc(d, "month"), dow)
      .orderBy(d)
    val wMonthDowDesc = Window
      .partitionBy(trunc(d, "month"), weekDayName).orderBy(d.desc)
    val wYm = Window.partitionBy(year(d), month(d))
    val wYmWeek = Window.partitionBy(year(d), month(d)).orderBy(week)
    val wYq = Window.partitionBy(year(d), quarter(d))
    val wY = Window.partitionBy(year(d))
    val withCols = base.select(d,
      (year(d) * 10000 + month(d) * 100 + day).as("year_month_day"),
      day.cast("int").as("day"),
      weekDayName.as("week_day_name"),
      when(dow.isin(1, 7), "Weekend").otherwise("Weekday")
        .as("is_weekend"),
      row_number().over(wMonthDow).as("dow_in_month"),
      row_number().over(wMonthDowDesc).as("_last_dow_in_month"),
      doy.cast("int").as("day_of_year"),
      dense_rank().over(wYmWeek).as("week_of_month"),
      week.cast("int").as("week_of_year"),
      month(d).cast("int").as("month"),
      date_format(d, "MMMM").as("month_name"),
      (year(d) * 100 + month(d)).as("year_month"),
      trunc(d, "month").as("first_day_month"),
      max(d).over(wYm).as("last_day_month"),
      quarter(d).cast("int").as("quarter"),
      when(quarter(d) === 1, "First").when(quarter(d) === 2, "Second")
        .when(quarter(d) === 3, "Third").otherwise("Fourth")
        .as("quarter_name"),
      (year(d) * 100 + quarter(d)).as("year_quarter"),
      min(d).over(wYq).as("first_day_quarter"),
      max(d).over(wYq).as("last_day_quarter"),
      year(d).cast("int").as("year"),
      trunc(d, "year").as("first_day_year"),
      max(d).over(wY).as("last_day_year"))
      .withColumn("day_suffix",
        // the reference's integer-division rule: day/10 = 1 -> 'th'
        when((col("day") / 10).cast("int") === 1, "th")
          .when(col("day") % 10 === 1, "st")
          .when(col("day") % 10 === 2, "nd")
          .when(col("day") % 10 === 3, "rd")
          .otherwise("th"))
    val holidayName =
      when(col("date") === col("first_day_year"), "New Year's Day")
        .when(col("dow_in_month") === 3 &&
          col("month_name") === "January" &&
          col("week_day_name") === "Monday", "Martin Luther King Day")
        .when(col("dow_in_month") === 3 &&
          col("month_name") === "February" &&
          col("week_day_name") === "Monday", "President's Day")
        .when(col("_last_dow_in_month") === 1 &&
          col("month_name") === "May" &&
          col("week_day_name") === "Monday", "Memorial Day")
        .when(col("month_name") === "July" && col("day") === 4,
          "Independence Day")
        .when(col("dow_in_month") === 1 &&
          col("month_name") === "September" &&
          col("week_day_name") === "Monday", "Labor Day")
        .when(col("dow_in_month") === 2 &&
          col("month_name") === "October" &&
          col("week_day_name") === "Monday", "Columbus Day")
        .when(col("month_name") === "November" && col("day") === 11,
          "Veterans' Day")
        .when(col("dow_in_month") === 4 &&
          col("month_name") === "November" &&
          col("week_day_name") === "Thursday", "Thanksgiving Day")
        .when(col("month_name") === "December" && col("day") === 25,
          "Christmas Day")
    withCols
      .withColumn("holiday_name", holidayName)
      .withColumn("is_holiday",
        when(col("holiday_name").isNotNull, "Holiday")
          .otherwise("Non-Holiday"))
      .select(col("date"), col("year_month_day"), col("day"),
        col("day_suffix"), col("week_day_name"), col("is_weekend"),
        col("is_holiday"), col("holiday_name"), col("dow_in_month"),
        col("day_of_year"), col("week_of_month"), col("week_of_year"),
        col("month"), col("month_name"), col("year_month"),
        col("first_day_month"), col("last_day_month"), col("quarter"),
        col("quarter_name"), col("year_quarter"),
        col("first_day_quarter"), col("last_day_quarter"), col("year"),
        col("first_day_year"), col("last_day_year"))
  }

  /** qa_ref.date.sql — the dimension's self-consistency battery: the
    * three packed integer keys (year_month_day, year_month,
    * year_quarter) and the year column must each equal their
    * recomputation from [date]; the reference runs a match count AND a
    * mismatch count per key plus the total (9 scans) — here ONE fused
    * conditional-aggregation scan emits all nine verdict rows. */
  def dateDimQa(dim: DataFrame): DataFrame = {
    val s = dim.sparkSession
    val d = col("date")
    val checks = Seq(
      ("year_month_day",
        year(d) * 10000 + month(d) * 100 + dayofmonth(d)),
      ("year_month", year(d) * 100 + month(d)),
      ("year_quarter", year(d) * 100 + quarter(d)),
      ("year", year(d)))
    val aggs = count(lit(1)).as("_n") +: checks.flatMap { case (c, e) =>
      Seq(sum(when(col(c) === e, 1L).otherwise(0L)).as(s"_m_$c"),
        sum(when(col(c) =!= e, 1L).otherwise(0L)).as(s"_x_$c"))
    }
    val r = dim.agg(aggs.head, aggs.tail: _*).head()
    val n = r.getAs[Long]("_n")
    val rows = (("row_count", n, n, true) +: checks.flatMap { case (c, _) =>
      val m = r.getAs[Long](s"_m_$c")
      val x = r.getAs[Long](s"_x_$c")
      Seq((s"match_$c", m, n, m == n), (s"mismatch_$c", x, 0L, x == 0L))
    }).map { case (i, o, e, p) => (i, o, e, if (p) 1 else 0) }
    import s.implicits._
    rows.toDF("qa_item", "observed", "expected", "pass")
  }

  /** Chronic-medication fuzzy crosswalk
    * (ref/tables/load_ref.chronic_meds_eli.R:14-34): the curated med
    * list becomes match_name — a '%'-bearing drug_name strips every
    * '%' and matches ANYWHERE (R's str_detect is an unanchored regex
    * search, so 'met%' matches 'dimetapp' — the reference's wildcard
    * semantics, kept faithfully), a plain name anchors '^' (prefix) —
    * and the DISTINCT lowercased claim drug names
    * fuzzyjoin::regex_left_join against it: every matching list row
    * expands (multi-match keeps all), non-matching names keep one
    * NULL row.
    *
    * Scale: the med list is a curated few-hundred-row dim — broadcast
    * nested-loop against the DISTINCT drug-name vocabulary (Zipf-
    * bounded), never against claim rows. */
  def chronicMedsCrosswalk(mcaidMeds: DataFrame,
      medList: DataFrame): DataFrame = {
    val ml = medList.withColumn("match_name",
      when(col("drug_name").contains("%"),
        regexp_replace(col("drug_name"), "%", ""))
        .otherwise(concat(lit("^"), col("drug_name"))))
    mcaidMeds.join(broadcast(ml), expr("ndc_desc rlike match_name"),
      "left")
  }

  /** Fixed-position parse of a CMS ICD-10-CM order file
    * (ref/tables/combine_icdcm_codes.R:12-40: the files read with
    * sep = "" then `substr(V1, 7, 12)` / `substr(V1, 17, 77)` — the
    * code is characters 7-12 (6 wide, short codes space-padded), the
    * short description characters 17-77 (61 wide, longer text
    * TRUNCATES — the reference never reads the long-description tail),
    * and the order number (1-5) and HIPAA-valid flag (14) are skipped
    * entirely). Input: a text frame with a `value` line column. Output
    * keeps the RAW (untrimmed) fields — the reference's exact-duplicate
    * drop runs before its str_trim, so trimming here would collapse
    * rows the reference keeps apart. */
  def parseIcdOrderFile(lines: DataFrame): DataFrame =
    lines.select(
      substring(col("value"), 7, 6).as("icdcode_raw"),
      substring(col("value"), 17, 61).as("dx_description_raw"))

  /** The multi-year combine (combine_icdcm_codes.R:43-58):
    *  1. new-year files bind in YEAR order and exact-duplicate rows
    *     drop keeping the FIRST occurrence — `!duplicated(new_data)`
    *     on the UNTRIMMED (code, description) pair, so rows differing
    *     only in padding survive this pass;
    *  2. `str_trim` both columns, ver = 10;
    *  3. the existing master (old_data: ICD-9 rows and pre-2019
    *     ICD-10) binds FIRST, then `distinct(icdcode, ver,
    *     .keep_all = TRUE)` keeps the first row per (icdcode, ver) in
    *     bind order — old beats new, and among new rows the EARLIEST
    *     year's description wins.
    *
    * Re-expression: R's positional keep-first becomes an explicit
    * priority — old rows rank -1, new rows rank by year — and the
    * per-(icdcode, ver) pick is min_by over (priority,
    * dx_description); the description tie-break only fires when one
    * year file lists the same code twice with different descriptions
    * (the order files never do — documented, deterministic either
    * way). Scale: the code vocabulary is ~100k rows — two
    * partial-agg shuffles, everything broadcastable downstream. */
  /** APCD provider NPI master (ref/tables/load_ref.apcd_provider_npi.R:
    * 13-88): provider_master rows pass through DISTINCT with flag 1;
    * the provider table gates orig_npi through the T-SQL charclass
    * `[1-9][0-9]x9` (exactly ten digits, no leading zero), picks each
    * provider's MOST COMMON valid NPI — rank() over (row_count DESC,
    * npi ASC), the q13 deterministic-mode kernel — and only providers
    * NOT already in provider_master insert, with flag 0; the two arms
    * UNION (distinct). The reference's own QA providers are planted by
    * the caller: an NPI typo must not double a provider, and one NPI
    * shared by two providers must keep both rows.
    *
    * Scale: counts partial-agg on (provider, npi); the rank window
    * partitions by provider; master is a broadcastable dim for the
    * anti-join. */
  def apcdProviderNpi(providerMaster: DataFrame,
      provider: DataFrame): DataFrame = {
    val pm = providerMaster.select(col("provider_id_apcd"),
        col("npi").cast("bigint").as("npi"),
        lit(1).as("provider_master_flag"))
      .distinct()
    val gated = provider.select(col("provider_id_apcd"),
        when(col("orig_npi").rlike("^[1-9][0-9]{9}$"), col("orig_npi"))
          .as("npi_str"))
      .filter(col("npi_str").isNotNull)
    val counts = gated.groupBy(col("provider_id_apcd"), col("npi_str"))
      .agg(count(lit(1)).as("row_count"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("provider_id_apcd"))
      .orderBy(col("row_count").desc, col("npi_str"))
    val ranked = counts.withColumn("rk", rank().over(w))
      .filter(col("rk") === 1)
      .select(col("provider_id_apcd"), col("npi_str"))
    val notInMaster = gated.select(col("provider_id_apcd")).distinct()
      .join(broadcast(pm.select(col("provider_id_apcd"))),
        Seq("provider_id_apcd"), "left_anti")
    val prov = notInMaster
      .join(ranked, Seq("provider_id_apcd"), "left")
      .select(col("provider_id_apcd"),
        col("npi_str").cast("bigint").as("npi"),
        lit(0).as("provider_master_flag"))
      .distinct()
    pm.unionByName(prov).distinct()
  }

  /** The sibling table-level QA (qa_ref.apcd_provider_npi res1/res2):
    * providers with more than one row, and NPIs whose digit length is
    * not ten (the T-SQL len() of a bigint) — two verdict rows in the
    * reference's (table, qa_type, qa) shape, each one distributed
    * aggregate over the ref. */
  def apcdProviderNpiQa(ref: DataFrame): DataFrame = {
    val dupes = ref.groupBy(col("provider_id_apcd"))
      .agg(count(lit(1)).as("row_count"))
      .filter(col("row_count") > 1)
      .agg(count(lit(1)).as("qa"))
      .select(lit("ref.apcd_provider_npi").as("table"),
        lit("# of provider IDs with >1 row, expect 0").as("qa_type"),
        col("qa"))
    val badLen = ref
      .filter(length(col("npi").cast("string")) =!= 10)
      .agg(count(lit(1)).as("qa"))
      .select(lit("ref.apcd_provider_npi").as("table"),
        lit("# of NPIs with length != 10, expect 0").as("qa_type"),
        col("qa"))
    dupes.unionByName(badLen)
  }

  /** Ethnicity→race map update check
    * (ref/tables/load_ref.apcd_ethnicity_race_map_update_check.sql):
    * for each eligibility ethnicity variable, the DISTINCT ids whose
    * map join found no race — the rows a curator must append to the
    * crosswalk. The reference's second probe carries a faithful QUIRK:
    * its ethnicity_id2 query JOINS ON ethnicity_id1 (the copy-paste
    * left in the shipped SQL), so it surfaces the distinct id2 values
    * of rows whose id1 is unmapped — kept exactly, documented here.
    * Map is broadcast; one distinct per variable. */
  def ethnicityMapCheck(elig: DataFrame, map: DataFrame): DataFrame = {
    val m = broadcast(map.select(col("ethnicity_id").cast("bigint")
        .as("ethnicity_id"),
      col("ethnicity_desc"), col("race_id"), col("race_desc")))
    def probe(varName: String, selectCol: String,
        joinCol: String): DataFrame =
      elig.select(col(selectCol).as("_sel"), col(joinCol).as("_join"))
        .join(m, col("_join") === col("ethnicity_id"), "left")
        .filter(col("race_desc").isNull)
        .select(lit(varName).as("variable"),
          col("_sel").as("unmapped_id"),
          col("ethnicity_desc"), col("race_id"), col("race_desc"))
        .distinct()
    probe("ethnicity_id1", "ethnicity_id1", "ethnicity_id1")
      // the reference's id2 probe joins on id1 — quirk kept
      .unionByName(probe("ethnicity_id2", "ethnicity_id2",
        "ethnicity_id1"))
  }

  def combineIcdcm(newByYear: Seq[(Int, DataFrame)],
      old: DataFrame): DataFrame = {
    val bound = newByYear.map { case (y, df) =>
      parseIcdOrderFile(df).withColumn("prio", lit(y))
    }.reduce(_ unionByName _)
    // pass 1: !duplicated on the RAW pair — earliest year keeps the row
    val deduped = bound
      .groupBy(col("icdcode_raw"), col("dx_description_raw"))
      .agg(min(col("prio")).as("prio"))
    val newTrimmed = deduped.select(
      trim(col("icdcode_raw")).as("icdcode"),
      trim(col("dx_description_raw")).as("dx_description"),
      lit(10).as("ver"), col("prio"))
    // pass 2: old binds first (priority below any year), then
    // keep-first per (icdcode, ver)
    val all = old.select(col("icdcode"), col("dx_description"),
        col("ver"), lit(-1).as("prio"))
      .unionByName(newTrimmed)
    all.groupBy(col("icdcode"), col("ver"))
      .agg(min_by(col("dx_description"),
        struct(col("prio"), col("dx_description"))).as("dx_description"))
      .select(col("icdcode"), col("dx_description"), col("ver"))
  }

  /** ref.mcaid_rac_code (load_ref.mcaid_rac_code.sql:43-110 over the
    * four workbook sheets load_ref.mcaid_rac_code.R:14-27 stages): the
    * fund-source sheet anchors, detailed codes and the elig-value
    * grouping LEFT-join on their cast keys, the BSP sheet joins
    * DISTINCTed; category overridden to the MN label at elig value 14,
    * MAGI '--' nulled, and the two benefit CASEs — full_benefit 'Y'
    * only for the four CHIP/Federal BSP group CIDs under a
    * Federal/Title XXI fund source, alternate_rda_full_benefit from
    * the Title XIX/XXI flags with its matched-but-unflagged 'N' arm.
    * (The reference's MN label carries a mangled en-dash; rendered
    * here as an ASCII hyphen.)
    *
    * Scale: every non-anchor frame is a vocabulary-sized dim — three
    * broadcast joins, zero shuffles beyond the anchor scan. */
  def racCode(fundSource: DataFrame, detailed: DataFrame,
      grouping: DataFrame, bsp: DataFrame): DataFrame = {
    val b = detailed.select(col("rac_code").cast("int").as("b_rac"),
      col("elig_value").cast("int").as("b_elig"),
      col("sub_elig_value").cast("int").as("b_sub"))
    val c = grouping.select(col("elig_value").cast("int").as("c_elig"),
      col("category"), col("title_xix_full"), col("title_xix_limited"),
      col("title_xxi_full"), col("legacy_mcs"), col("magi"),
      col("major_cov_grp"))
    val d = bsp.select(col("rac_code").cast("int").as("d_rac"),
        col("bsp_group_abbrev"), col("bsp_group_name"),
        col("bsp_group_cid").cast("int").as("bsp_group_cid"))
      .distinct()
    val fullBenefitCids = Seq(1003960, 1003956, 10066833, 1003962)
    fundSource
      .select(col("rac_code").cast("int").as("rac_code"),
        col("rac_desc").as("rac_name"), col("fund_source_code"))
      .join(broadcast(b), col("rac_code") === col("b_rac"), "left")
      .join(broadcast(c), col("b_elig") === col("c_elig"), "left")
      .join(broadcast(d), col("rac_code") === col("d_rac"), "left")
      .select(col("rac_code"), col("rac_name"), col("fund_source_code"),
        col("b_elig").as("elig_value"), col("b_sub").as("sub_elig_value"),
        when(col("b_elig") === 14, "MN - Other (Family/Pregnancy)")
          .otherwise(col("category")).as("category"),
        col("title_xix_full").as("title_xix_full_benefit_1519_reporting"),
        col("title_xix_limited").as("title_xix_limited_benefit"),
        col("title_xxi_full").as("title_xxi_full_benefit"),
        col("legacy_mcs"),
        when(col("magi") === "--", lit(null).cast("string"))
          .otherwise(col("magi")).as("magi"),
        col("major_cov_grp").as("major_cov_grp_1519_reporting"),
        col("bsp_group_cid"), col("bsp_group_abbrev"),
        col("bsp_group_name"),
        when(col("bsp_group_cid").isin(fullBenefitCids: _*) &&
          col("fund_source_code").isin("Federal", "Title XXI"), "Y")
          .when(col("d_rac").isNotNull &&
            (!col("bsp_group_cid").isin(fullBenefitCids: _*) ||
              !col("fund_source_code").isin("Federal", "Title XXI")), "N")
          .as("full_benefit"),
        when(col("title_xix_full") === "Y" ||
          col("title_xxi_full") === "Y", "Y")
          .when(col("b_rac").isNotNull && col("title_xix_full").isNull &&
            col("title_xxi_full").isNull, "N")
          .as("alternate_rda_full_benefit"))
  }

  /** ref.kc_provider_master (load_ref.kc_provider_master.sql:1-128):
    * the APCD provider-master slice (validated zips/taxonomies, flag
    * 1) unioned with the derived slice — raw provider rows under the
    * ten-digit charclass NPI gate, per-NPI MODE picks for entity type
    * (count desc, entity desc), practice zip (count desc, zip asc),
    * and the TOP-2 taxonomy mode (rank 1 → primary, rank 2 →
    * secondary), anti-joined against the master NPIs, flag 0.
    *
    * The reference's RANK() keeps genuine ties in rank 1/2 — a tied
    * NPI would emit multiple primary taxonomies and break the PK on
    * insert; per the determinism rule the rank here is ROW_NUMBER
    * over fully-specified orderings, so the pick is a pure function of
    * the data. Scale: every pick is a (npi, value) partial-agg count
    * then one npi-hash window at dimension grain. */
  def kcProviderMaster(master: DataFrame, raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pm = master.select(col("npi").cast("bigint").as("npi"),
      col("entity_type"),
      when(length(col("zip_physical")) === 5, col("zip_physical"))
        .as("geo_zip_practice"),
      when(col("primary_taxonomy").isin("-1", "-2"),
        lit(null).cast("string")).otherwise(col("primary_taxonomy"))
        .as("primary_taxonomy"),
      when(col("secondary_taxonomy_physical").isin("-1", "-2"),
        lit(null).cast("string"))
        .otherwise(col("secondary_taxonomy_physical"))
        .as("secondary_taxonomy"),
      lit(1).as("apcd_provider_master_flag")).distinct()
    val t1 = raw.select(
      when(col("orig_npi").rlike("^[1-9][0-9]{9}$"), col("orig_npi"))
        .as("npi"),
      col("entity_type"),
      when(length(col("zip")) === 5, col("zip")).as("geo_zip_practice"),
      when(length(col("primary_specialty_code")) === 10,
        col("primary_specialty_code")).as("taxonomy"))
    def modePick(valCol: String, tieAsc: Boolean) = {
      val counted = t1.filter(col(valCol).isNotNull)
        .groupBy(col("npi"), col(valCol))
        .agg(count(lit(1)).as("row_count"))
      val tie = if (tieAsc) col(valCol).asc else col(valCol).desc
      counted.withColumn("rk", row_number().over(
          Window.partitionBy(col("npi"))
            .orderBy(col("row_count").desc, tie)))
    }
    val entity = modePick("entity_type", tieAsc = false)
      .filter(col("rk") === 1).select(col("npi"), col("entity_type"))
    val zip = modePick("geo_zip_practice", tieAsc = true)
      .filter(col("rk") === 1)
      .select(col("npi"), col("geo_zip_practice"))
    val tax = modePick("taxonomy", tieAsc = true).filter(col("rk") <= 2)
    val tax1 = tax.filter(col("rk") === 1)
      .select(col("npi"), col("taxonomy").as("primary_taxonomy"))
    val tax2 = tax.filter(col("rk") === 2)
      .select(col("npi"), col("taxonomy").as("secondary_taxonomy"))
    val derived = t1.filter(col("npi").isNotNull).select(col("npi"))
      .distinct()
      .join(pm.select(col("npi").as("m_npi")),
        col("npi") === col("m_npi"), "left_anti")
      .join(entity, Seq("npi"), "left")
      .join(zip, Seq("npi"), "left")
      .join(tax1, Seq("npi"), "left")
      .join(tax2, Seq("npi"), "left")
      .select(col("npi").cast("bigint").as("npi"), col("entity_type"),
        col("geo_zip_practice"), col("primary_taxonomy"),
        col("secondary_taxonomy"),
        lit(0).as("apcd_provider_master_flag"))
    pm.unionByName(derived).distinct()
  }

  /** The ref.age_grp ladders (load_ref.age_grp.sql:44-73) as data —
    * (column name, (lo, hi, label) arms; hi = Int.MaxValue renders the
    * open '65+' style arm). Shared with the oracle generator so the
    * two sides cannot drift. */
  val AgeLadders: Seq[(String, Seq[(Int, Int, String)])] = {
    val M = Int.MaxValue
    Seq(
      ("age_grp_0", Seq((0, 4, "Age 0-4"), (5, 11, "Age 5-11"),
        (12, 17, "Age 12-17"), (18, 24, "Age 18-24"),
        (25, 44, "Age 25-44"), (45, 64, "Age 45-64"),
        (65, M, "Age 65+"))),
      ("age_grp_1", Seq((18, M, "Age 18+"))),
      ("age_grp_2", Seq((0, 17, "Age 0-17"), (18, 64, "Age 18-64"),
        (65, M, "Age 65+"))),
      ("age_grp_3", Seq((13, M, "Age 13+"))),
      ("age_grp_4", Seq((6, M, "Age 6+"))),
      ("age_grp_5", Seq((6, 17, "Age 6-17"), (18, 64, "Age 18-64"),
        (65, M, "Age 65+"))),
      ("age_grp_6", Seq((12, 17, "Age 12-17"), (18, 64, "Age 18-64"),
        (65, M, "Age 65+"))),
      ("age_grp_7", Seq((18, 64, "Age 18-64"), (65, M, "Age 65+"))),
      ("age_grp_8", Seq((18, 64, "Age 18-64"))),
      ("age_grp_9_months", Seq((0, 11, "Age 0-11 Months"),
        (12, 24, "Age 12-24 Months"), (25, 83, "Age 25 Months-6"),
        (84, 143, "Age 7-11"), (144, 239, "Age 12-19"))),
      ("age_grp_10", Seq((5, 11, "Age 5-11"), (12, 18, "Age 12-18"),
        (19, 50, "Age 19-50"), (51, 64, "Age 51-64"))),
      ("age_grp_11", Seq((0, 17, "Age 0-17"), (18, 24, "Age 18-24"),
        (25, 34, "Age 25-34"), (35, 44, "Age 35-44"),
        (45, 54, "Age 45-54"), (55, 64, "Age 55-64"),
        (65, M, "Age 65+"))))
  }

  /** ref.age_grp (load_ref.age_grp.sql:25-75): the -1..250 age spine
    * (the reference's CTE over ref.num plus the -1/0 rows — ref.num
    * itself is load_ref.num.sql's doubling WHILE loop, a T-SQL
    * row-generation workaround whose Spark-native equivalent is
    * range()) carrying the twelve grouping ladders. */
  def ageGrp(s: SparkSession): DataFrame = {
    val age = col("age").cast("int")
    val ladders = AgeLadders.map { case (name, arms) =>
      arms.foldLeft(lit(null).cast("string")) { case (acc, (lo, hi, lab)) =>
        val cond = if (hi == Int.MaxValue) age >= lo
          else age.between(lo, hi)
        when(cond, lab).otherwise(acc)
      }.as(name)
    }
    s.range(-1, 251).select(col("id").cast("int").as("age"))
      .select(col("age") +: ladders: _*)
  }

  /** ref.apcd_mcare_carrier_billing_npi
    * (load_ref.apcd_mcare_carrier_billing_npi.sql:7-16 + its inline QA
    * :17-23): APCD medical claims of the carrier types (24, 25) joined
    * to the Medicare carrier file on the submitter claim control
    * number — the reference forces a CASE-SENSITIVE collation for the
    * join (SQL Server default is CI; Spark string equality is already
    * case-sensitive, so the collate clause needs no analog here). */
  def carrierBillingNpi(apcdClaims: DataFrame,
      bcarrier: DataFrame): DataFrame =
    apcdClaims
      .filter(col("submitted_claim_type_id").isin(24, 25))
      .select(col("submitter_clm_control_num"),
        col("medical_claim_header_id").as("claim_header_id"))
      .join(bcarrier.select(col("clm_id"),
        col("carr_clm_blg_npi_num").cast("bigint")
          .as("carr_clm_blg_npi_num")),
        col("submitter_clm_control_num") === col("clm_id"), "left")
      .select(col("claim_header_id"), col("carr_clm_blg_npi_num"))
}
