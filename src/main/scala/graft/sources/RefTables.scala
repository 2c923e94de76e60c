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

  /** ref.provider_nppes_apde_load
    * (ref/tables/load_ref.provider_nppes_apde_load.R:31-166, fed by
    * load_ref.provider_nppes_load.R:46-49's comma-scrub of the raw CMS
    * download): the NPPES provider master reshape —
    *
    *  steps 1-2  both 15-slot column families (taxonomy codes +
    *             primary switches) unpivoted to long DISTINCT rows
    *             (posexplode over an array literal stands in for T-SQL
    *             UNPIVOT, which drops NULL slots — the isNotNull
    *             filter replicates that);
    *  steps 3-4  joined on (npi, slot), collapsed to DISTINCT
    *             (npi, taxonomy) with primary = max('Y'), then
    *             RANKed primary-first / taxonomy-A-Z;
    *  step 5     three taxonomy fields per NPI via the reference's
    *             three filtered self-joins — arm one is
    *             `primary_flag = 1 OR taxonomy_number = 1`, so an NPI
    *             whose switches mark SEVERAL primaries fans out to
    *             several rows (a reference quirk kept deliberately:
    *             the battery fixture plants one such NPI);
    *  final      geo_wa ('WA'/'WASHINGTON'), the SHA2-256 geo_hash_raw
    *             over UPPER(add1|add2|city|state|zip5) with T-SQL
    *             CONCAT's NULL-as-empty semantics (coalesce per part)
    *             and CONVERT-style-2 uppercase hex, date casts, and
    *             deactivation_flag = organization-typeless NPI with a
    *             deactivation date.
    *
    * Scale: the unpivots are row-local explodes (15× fan-out, no
    * shuffle); the collapse/rank partition on npi (high-cardinality);
    * the three-arm pivot joins and the final attach are all npi-keyed
    * equi-joins. The comma scrub is applied to every string column
    * first, as the raw loader does to the whole frame. */
  /** claims.ref_hedis_value_sets_apde
    * (ref/tables/load_claims.ref_hedis_value_sets_apde_2018-2023.R
    * steps 2-3, identically load_claims.ref_hedis_value_sets_apde_2024
    * .R:157-176 / _2025.R): the QRS value-set master — per-measurement-
    * year sheet frames bound rows-wise (unionByName with NULL padding,
    * the bind_rows analog — early years lack columns later years
    * carry), then the ICD normalization that aligns HEDIS codes with
    * the claims tables: punctuation stripped from ICD-9/10-CM codes
    * only, and ICD-9-CM codes padded to five digits with TRAILING
    * zeroes (3→+'00', 4→+'0'). Other code systems pass through
    * untouched. The reference's interactive length probes (ICD9 = 5,
    * ICD10 in 3-7, NDC = 11) become the HedisSpec contract. */
  def hedisValueSets(byYear: Seq[(Int, DataFrame)]): DataFrame = {
    val unioned = byYear.map { case (y, df) =>
      df.select(lit(y).as("year") +: df.columns.map(col): _*)
    }.reduce(_.unionByName(_, allowMissingColumns = true))
    unioned
      .withColumn("code",
        when(col("code_system").isin("ICD10CM", "ICD9CM"),
          regexp_replace(col("code"), "\\p{Punct}", ""))
        .otherwise(col("code")))
      .withColumn("code",
        when(col("code_system") === "ICD9CM" &&
          length(col("code")) === 3, concat(col("code"), lit("00")))
        .when(col("code_system") === "ICD9CM" &&
          length(col("code")) === 4, concat(col("code"), lit("0")))
        .otherwise(col("code")))
  }

  /** claims.ref_rda_value_sets_apde refresh
    * (ref/tables/load_ref.rda_value_sets_apde.R steps 3-6b) — the
    * behavioral-health value-set master rebuild:
    *
    *  step 3   desc → upper + squish; ICDCM version inference by code
    *           shape (digit → ICD9CM; ^E plus a POISON/INJURY-family
    *           desc regex → ICD9CM — replicated WITHOUT the
    *           reference's dead `\n INJ` alternation branch, which
    *           contains a literal newline and can never match;
    *           ^V → ICD9CM; other ^alpha → ICD10CM); ICD-9 trailing-
    *           zero pad to 5; NDC leading-zero pad to 11; DISTINCT;
    *           then the padded-collision resolution — per CODE, keep
    *           the row whose RAW code was longest (the reference's
    *           rank(ties = 'first') depends on frame order; we break
    *           ties by raw code ascending for determinism);
    *  step 4   sub_group_condition for diagnosis rows via the CCS
    *           detail category of ref.icdcm_codes — the reference's
    *           ~200-branch case_when re-expressed as a broadcast
    *           lookup dim (ccsMap), data instead of code;
    *  step 5   sub_group_pharmacy for pharmacy rows via the drug-name
    *           map (first-match priority preserved by a min-priority
    *           collapse), the manual recode lists, the NALTREXONE /
    *           DISULFIRAM contains-fallbacks and BRIXADI, then
    *           pharmacy → condition;
    *  step 5b  the NO HARMS ICD-10 self-harm additions, desc'd from
    *           ref.icdcm_codes (right-join semantics: the addition
    *           survives even without a ref match);
    *  step 6   bind existing + new + additions, DISTINCT over every
    *           column EXCEPT desc keeping the first in bind order
    *           (existing wins), then the mh_disrupt manual removal;
    *  step 6b  MOUD procedure codes appended (rbind.fill → NULL-pad
    *           union) with the oud_dx1_flag list.
    *
    * Scale: one scan of each input; the collision window partitions on
    * code; every lookup is a broadcast dim; the dedupe partitions on
    * the full key tuple. */
  def rdaValueSets(existing: DataFrame, newRaw: DataFrame,
      icdcmRef: DataFrame, ccsMap: DataFrame,
      pharmacyMap: DataFrame, moudProc: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val squish = (c: Column) =>
      trim(regexp_replace(upper(c), "\\s+", " "))
    val injRegex = "POISON|INJURY|INJURIES|INJU|POIS|SELF"
    val n0 = newRaw.withColumn("desc", squish(col("desc")))
    val verInf =
      when(col("code_set") === "ICDCM" && col("code").rlike("^[0-9]"),
        "ICD9CM")
      .when(col("code_set") === "ICDCM" && col("code").rlike("^E") &&
        col("desc").rlike(injRegex), "ICD9CM")
      .when(col("code_set") === "ICDCM" && col("code").rlike("^V"),
        "ICD9CM")
      .when(col("code_set") === "ICDCM" &&
        col("code").rlike("^[A-Za-z]"), "ICD10CM")
      .otherwise(col("code_set"))
    val padded = n0.withColumn("code_set", verInf)
      .withColumn("code_raw", col("code"))
      .withColumn("code",
        when(col("code_set") === "ICD9CM" && length(col("code")) === 3,
          concat(col("code"), lit("00")))
        .when(col("code_set") === "ICD9CM" && length(col("code")) === 4,
          concat(col("code"), lit("0")))
        .when(col("code_set") === "NDC" &&
          length(col("code")).between(7, 10),
          lpad(col("code"), 11, "0"))
        .otherwise(col("code")))
      .distinct()
    val n1 = padded
      .withColumn("code_raw_len",
        when(col("code_set").isin("ICD9CM", "ICD10CM"),
          length(col("code_raw"))))
      .withColumn("rk", row_number().over(Window.partitionBy(col("code"))
        .orderBy(col("code_raw_len").desc_nulls_last,
          col("code_raw").asc)))
      .filter(col("code_raw_len").isNull || col("rk") === 1)
      .drop("code_raw", "code_raw_len", "rk")
      .withColumn("icdcm_version",
        when(col("code_set") === "ICD9CM", 9)
          .when(col("code_set") === "ICD10CM", 10).cast("int"))
    // step 4: CCS category -> condition sub-group
    val refDim = icdcmRef.select(col("icdcm"),
      col("icdcm_version").as("ref_ver"), col("ccs_detail_code"))
    val ccsDim = ccsMap.select(col("ccs_detail_code").as("ccs_m"),
      col("sub_group_condition").as("sgc_m"))
    val withCcs = n1
      .join(broadcast(refDim), col("code") === col("icdcm") &&
        col("icdcm_version") === col("ref_ver"), "left")
      .join(broadcast(ccsDim), col("ccs_detail_code") === col("ccs_m"),
        "left")
      .withColumn("sub_group_condition",
        when(col("icdcm_version").isNotNull, col("sgc_m")))
      .drop("icdcm", "ref_ver", "ccs_detail_code", "ccs_m", "sgc_m")
    // step 5: pharmacy sub-groups (first-match priority)
    val groupNames = Seq(
      "Acamprosate" -> "pharm_acamprosate",
      "Disulfiram" -> "pharm_disulfiram",
      "ADHD Rx" -> "pharm_adhd",
      "Antianxiety Rx" -> "pharm_antianxiety",
      "Antidepressants Rx" -> "pharm_antidepressant",
      "Antimania Rx" -> "pharm_antimania",
      "Antipsychotic Rx" -> "pharm_antipsychotic",
      "Buprenorphine-Naloxone" -> "pharm_buprenorphine_naloxone",
      "Buprenorphine" -> "pharm_buprenorphine",
      "Naltrexone" -> "pharm_naltrexone_rx")
    val prio = groupNames.map(_._1).zipWithIndex.toMap
    val prioCol = groupNames.map(_._1).foldLeft(lit(999)) { (acc, g) =>
      when(col("sub_group_pharmacy_src") === g, prio(g)).otherwise(acc)
    }
    val sgpName = groupNames.foldLeft(lit(null).cast("string")) {
      case (acc, (g, p)) =>
        when(col("sub_group_pharmacy_src") === g, p).otherwise(acc)
    }
    val pmap = pharmacyMap
      .select(col("desc_1"),
        col("sub_group_pharmacy").as("sub_group_pharmacy_src"))
      .withColumn("p", prioCol)
      .groupBy(col("desc_1"))
      .agg(min(struct(col("p"), col("sub_group_pharmacy_src"))).as("m"))
      .select(col("desc_1"),
        col("m.sub_group_pharmacy_src").as("sub_group_pharmacy_src"))
      .withColumn("sgp_mapped", sgpName).drop("sub_group_pharmacy_src")
    val isRx = col("data_source_type") === "pharmacy"
    val manualAdhd = Seq("METHYLPHENIDATE", "DICLOFENAC SODIUM DR",
      "LISDEXAMFETAMINE DIMESYLATE", "GUANFACINE HYDROCHLORIDE ER",
      "RELEXXII", "AMPHETAMINE/DEXTROAMPHETAMINE ER")
    val manualAntidep = Seq("VILAZODONE HYDROCHLORIDE",
      "VENLAFAXINE BESYLATE ER", "ABILIFY MYCITE STARTER KIT",
      "ABILIFY MYCITE MAINTENANCE KIT", "AUVELITY", "ZURZUVAE")
    val manualAntipsy = Seq("INVEGA HAFYERA",
      "LURASIDONE HYDROCHLORIDE", "RYKINDO", "RISPERIDONE ER", "UZEDY",
      "ABILIFY ASIMTUFII")
    val withRx0 = withCcs
      .join(broadcast(pmap), col("desc") === col("desc_1"), "left")
      .withColumn("sub_group_pharmacy", when(isRx, col("sgp_mapped")))
      .drop("desc_1", "sgp_mapped")
    val sgp = col("sub_group_pharmacy")
    val withRx = withRx0.withColumn("sub_group_pharmacy",
      when(isRx && sgp.isNull && col("desc").isin(manualAdhd: _*),
        "pharm_adhd")
      .when(isRx && sgp.isNull && col("desc").isin(manualAntidep: _*),
        "pharm_antidepressant")
      .when(isRx && sgp.isNull && col("desc").isin(manualAntipsy: _*),
        "pharm_antipsychotic")
      .when(isRx && sgp.isNull && col("desc") === "LOREEV XR",
        "pharm_antianxiety")
      .when(isRx && sgp.isNull && col("desc").contains("NALTREXONE"),
        "pharm_naltrexone_rx")
      .when(isRx && sgp.isNull && col("desc").contains("DISULFIRAM"),
        "pharm_disulfiram")
      .when(isRx && sgp.isNull && col("desc") === "BRIXADI",
        "pharm_buprenorphine")
      .otherwise(sgp))
    val rxCond = Map(
      "pharm_acamprosate" -> "sud_alcohol",
      "pharm_disulfiram" -> "sud_alcohol",
      "pharm_adhd" -> "mh_adhd",
      "pharm_antianxiety" -> "mh_anxiety",
      "pharm_antidepressant" -> "mh_depression",
      "pharm_antimania" -> "mh_mania_bipolar",
      "pharm_antipsychotic" -> "mh_psychotic",
      "pharm_buprenorphine_naloxone" -> "sud_opioid",
      "pharm_buprenorphine" -> "sud_opioid",
      "pharm_naltrexone_rx" -> "sud_opioid")
    val rxCondCol = rxCond.toSeq.sortBy(_._1)
      .foldLeft(col("sub_group_condition")) { case (acc, (g, c)) =>
        when(isRx && col("sub_group_pharmacy") === g, c).otherwise(acc)
      }
    val newFinal = withRx.withColumn("sub_group_condition", rxCondCol)
    // step 5b: NO HARMS additions, desc from the icdcm ref
    val descDim = icdcmRef.select(col("icdcm").as("nh_icdcm"),
      col("icdcm_version").as("nh_ver"),
      upper(col("icdcm_description")).as("nh_desc"))
    val ss = existing.sparkSession
    import ss.implicits._
    val extra = NoHarmsCodes.toDF("code")
      .select(lit("mh").as("value_set_group"),
        lit("apde-added-diagnosis").as("value_set_name"),
        lit("diagnosis").as("data_source_type"),
        lit("ICD10CM").as("code_set"), col("code"),
        lit(10).cast("int").as("icdcm_version"),
        lit("mh_other").as("sub_group_condition"))
      .join(broadcast(descDim), col("code") === col("nh_icdcm") &&
        col("icdcm_version") === col("nh_ver"), "left")
      .withColumn("desc", col("nh_desc"))
      .drop("nh_icdcm", "nh_ver", "nh_desc")
    // step 6: bind + distinct-except-desc keeping first in bind order
    val cols = Seq("value_set_group", "value_set_name",
      "data_source_type", "code_set", "code", "desc", "icdcm_version",
      "sub_group_condition", "sub_group_pharmacy")
    def conform(df: DataFrame, priority: Int): DataFrame = {
      val have = df.columns.toSet
      df.select(cols.map(c =>
          if (have(c)) col(c)
          else lit(null).cast(if (c == "icdcm_version") "int"
            else "string").as(c)): _*)
        .withColumn("bind_priority", lit(priority))
    }
    val keyCols = cols.filterNot(_ == "desc").map(col)
    val bound = conform(existing, 0)
      .unionByName(conform(newFinal, 1))
      .unionByName(conform(extra, 2))
      .withColumn("dk", row_number().over(
        Window.partitionBy(keyCols: _*)
          .orderBy(col("bind_priority").asc,
            col("desc").asc_nulls_last)))
      .filter(col("dk") === 1).drop("dk", "bind_priority")
    val disruptFix = Seq("F068", "F09", "F488", "F489", "F54", "F59",
      "F938", "F939", "F989", "F99", "O9934", "O99340", "O99341",
      "O99342", "O99343", "O99344", "O99345")
    val cleaned = bound.filter(!(col("code").isin(disruptFix: _*) &&
      col("sub_group_condition") === "mh_disrupt"))
    // step 6b: MOUD procedure codes (rbind.fill)
    val oudDx1 = Seq("H0033", "96372", "11981", "11983", "G0516",
      "G0518", "G2073", "J2315")
    val moud = moudProc.select(lit("sud").as("value_set_group"),
      lit("apde-moud-procedure").as("value_set_name"),
      lit("procedure").as("data_source_type"),
      lit("HCPCS").as("code_set"),
      col("procedure_code").as("code"),
      upper(col("desc")).as("desc"),
      lit("sud_opioid").as("sub_group_condition"),
      when(col("procedure_code").isin(oudDx1: _*), 1).otherwise(0)
        .as("oud_dx1_flag"))
    cleaned.withColumn("oud_dx1_flag", lit(null).cast("int"))
      .unionByName(moud, allowMissingColumns = true)
  }

  /** The 66 NO HARMS ICD-10-CM self-harm codes
    * (load_ref.rda_value_sets_apde.R:915-928). private[graft] so the
    * q323 oracle is generated from the same constant. */
  private[graft] val NoHarmsCodes: Seq[String] = Seq(
    "T43652", "T43652A", "T43652D", "T43652S", "T45AX2A", "T45AX2D",
    "T45AX2S", "T4792X", "X738XX", "X739XX", "X7401X", "X7402X",
    "X7409X", "X748XX", "X749XX", "X75XXX", "X76XXX", "X770XX",
    "X771XX", "T4592X", "X710XX", "X711XX", "X712XX", "X713XX",
    "X718XX", "X719XX", "X72XXX", "X730XX", "T3692X", "T3792X",
    "T3992X", "X781XX", "X782XX", "X788XX", "X789XX", "X79XXX",
    "X80XXX", "X810XX", "X811XX", "X818XX", "X820XX", "X821XX",
    "X822XX", "X828XX", "X830XX", "X731XX", "X732XX", "X838XX",
    "X772XX", "X773XX", "X778XX", "X779XX", "X780XX", "T1491X",
    "T56822A", "T56822D", "T56822S", "X831XX", "X832XX", "T40412",
    "T40422", "T40492", "T4272X", "T4392X", "T4142X", "T4992X")

  /** ref.fda_ndc_product (ref/tables/load_ref.fda_ndc_product.R:38-50):
    * the FDA NDC directory load — every column read as VARCHAR (the
    * `col_types = "ccc…"` read), and the one data repair the reference
    * makes: the U+FFFD replacement characters that mojibake'd labeler
    * names on download are stripped from LABELERNAME. The row-count QA
    * (raw n == loaded n) holds by construction here — the load is a
    * projection — and is pinned by the catalog row's own row check. */
  def fdaNdcProduct(raw: DataFrame): DataFrame =
    raw.withColumn("labelername",
      regexp_replace(col("labelername"), "�", ""))

  def nppesApdeLoad(nppesRaw: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nppes0 = nppesRaw.select(nppesRaw.schema.fields.map { f =>
      if (f.dataType == org.apache.spark.sql.types.StringType)
        regexp_replace(col(f.name), ",", "").as(f.name)
      else col(f.name)
    }: _*)
    val nppes = nppes0.withColumn("npi", col("npi").cast("bigint"))
    def slotLong(prefix: String, valName: String) =
      nppes.select(col("npi"),
          posexplode(array((1 to 15).map(i =>
            col(s"${prefix}_$i").cast("string")): _*))
            .as(Seq("slot0", valName)))
        .select(col("npi"), (col("slot0") + 1).as("slot"), col(valName))
        .filter(col(valName).isNotNull).distinct()
    val taxLong = slotLong("healthcare_provider_taxonomy_code",
      "taxonomy")
    val priLong = slotLong("healthcare_provider_primary_taxonomy_switch",
      "primary_flag_raw")
    val joined = taxLong.join(priLong, Seq("npi", "slot"), "left")
    val collapsed = joined.groupBy(col("npi"), col("taxonomy"))
      .agg(max(when(col("primary_flag_raw") === "Y", 1).otherwise(0))
        .as("primary_flag"))
    val ranked = collapsed.withColumn("taxonomy_number",
      rank().over(Window.partitionBy(col("npi"))
        .orderBy(col("primary_flag").desc, col("taxonomy").asc)))
    val a = ranked.filter(col("primary_flag") === 1 ||
        col("taxonomy_number") === 1)
      .select(col("npi"), col("taxonomy").as("taxonomy_1"),
        col("primary_flag").as("taxonomy_primary_flag"))
    val b = ranked.filter(col("taxonomy_number") === 2)
      .select(col("npi").as("npi_b"), col("taxonomy").as("taxonomy_2"))
    val c = ranked.filter(col("taxonomy_number") === 3)
      .select(col("npi").as("npi_c"), col("taxonomy").as("taxonomy_3"))
    val taxFinal = a
      .join(b, col("npi") === col("npi_b"), "left")
      .join(c, col("npi") === col("npi_c"), "left")
      .select(col("npi").as("tax_npi"), col("taxonomy_1"),
        col("taxonomy_2"), col("taxonomy_3"),
        col("taxonomy_primary_flag"))
    val st = upper(col("address_practice_state"))
    val hashInput = upper(concat(
      coalesce(col("address_practice_first"), lit("")), lit("|"),
      coalesce(col("address_practice_second"), lit("")), lit("|"),
      coalesce(col("address_practice_city"), lit("")), lit("|"),
      coalesce(col("address_practice_state"), lit("")), lit("|"),
      coalesce(substring(col("address_practice_zip_code"), 1, 5),
        lit(""))))
    nppes.select(col("npi"), col("entity_type_code"), col("name_org"),
        col("name_last"), col("name_first"),
        col("address_practice_first"), col("address_practice_second"),
        col("address_practice_city"), col("address_practice_state"),
        col("address_practice_zip_code"),
        when(st === "WA" || st === "WASHINGTON", 1).otherwise(0)
          .as("geo_wa"),
        upper(sha2(hashInput, 256)).as("geo_hash_raw"),
        col("enumeration_date").cast("date").as("enumeration_date"),
        col("last_update").cast("date").as("last_update"),
        when(col("entity_type_code").isNull &&
          col("deactivation_date").isNotNull, 1).otherwise(0)
          .as("deactivation_flag"),
        col("deactivation_date").cast("date").as("deactivation_date"),
        col("gender_code"))
      .join(taxFinal, col("npi") === col("tax_npi"), "left")
      .drop("tax_npi")
  }

  /** ref.ahrq_value_set (ref/tables/load_ref.ahrq_value_set.sql:21-40
    * over the .R xlsx→tmp stage): the PQI/PDI value-set publish —
    * SUBSTRING([code], 13, LEN([code]) - 12) strips the workbook's
    * fixed 12-char code prefix (T-SQL ERRORS on codes shorter than 12;
    * the gate below models that), and the PRIMARY KEY on (value_set_
    * name, data_source_type, code_set, code) rejects duplicate keys —
    * a real load would fail the INSERT, so the kernel requires key
    * distinctness up front (one fused vocabulary-sized aggregate).
    * The INSERT's ORDER BY is physical-layout cosmetics in T-SQL —
    * not result semantics — and is left to the catalog row. */
  def ahrqValueSet(tmp: DataFrame): DataFrame = {
    val short = tmp.filter(length(col("code")) < 12).count()
    require(short == 0L,
      s"AHRQ codes shorter than the 12-char prefix: $short " +
        "(T-SQL SUBSTRING would error)")
    val out = tmp.select(col("value_set_group"), col("value_set_name"),
      col("data_source_type"), col("code_set"),
      expr("substring(code, 13, length(code) - 12)").as("code"),
      col("desc_1"))
    val pk = out.agg(count(lit(1)).as("n"),
      count_distinct(struct(col("value_set_name"),
        col("data_source_type"), col("code_set"), col("code")))
        .as("d")).head()
    require(pk.getLong(0) == pk.getLong(1),
      "duplicate (value_set_name, data_source_type, code_set, code) " +
        "keys — the pk_ahrq_value_set constraint would fail the INSERT")
    out
  }

  /** ref.provider_nppes_load (ref/tables/load_ref.provider_nppes_load
    * .R:44-67): the non-APDE NPPES lookup load — every column read as
    * VARCHAR (col_types "c") with whitespace trim (handled at the CSV
    * read), commas stripped from EVERY value (mutate_all gsub — the
    * same scrub nppesApdeLoad shares), and the raw CSV headers
    * renamed POSITIONALLY to the yaml's column names (setnames).
    * last_run dropped (audit metadata); the raw-vs-loaded row-count
    * QA holds by construction — the load is a projection — and is
    * pinned by the catalog row's own count. */
  def providerNppesLoad(raw: DataFrame, yamlNames: Seq[String]): DataFrame = {
    require(raw.columns.length == yamlNames.length,
      s"yaml declares ${yamlNames.length} columns, file has " +
        s"${raw.columns.length}")
    val renamed = raw.toDF(yamlNames: _*)
    renamed.select(renamed.columns.map(c =>
      regexp_replace(col(c), ",", "").as(c)).toIndexedSeq: _*)
  }
}
