package graft.builds

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** mcare_elig_month — the Medicare month-grain enrollment table
  * (load_stage.mcare_elig_month.R:40-283), the month-level sibling of
  * [[McareEligTimevar]] (which collapses the same monthly rows into
  * intervals):
  *
  *  step 1  (:42-144) four 12-column UNPIVOTs (buy-in / HMO / Part-D
  *          contract / dual status) re-joined on (bene, year, month) —
  *          here ONE `stack` pass emits all four families per month
  *          (the [[McareEligTimevar]] kernel: a generator, no shuffle,
  *          no self-joins), with the `len(zip_cd) < 5 → NULL else
  *          left(zip,5)` ZIP rule;
  *  step 2a (:150-200) ResDAC code→flag recodes (shared with the
  *          timevar build so the two stay in lock-step) and the month
  *          date attach — the reference joins ref.date for
  *          first/last_day_month; one broadcast date-dim join here
  *          supplies those plus the final year_quarter/year columns
  *          (the reference joins the same dim twice);
  *  step 2b (:205-236) the NULL-propagating cov_type_sum > 0 month
  *          drop, months after death dropped, to_date truncated to
  *          death_dt;
  *  step 3  (:241-258) cov_time_day from the (possibly truncated)
  *          month;
  *  step 8  (:263-283) geo_kc via LEFT JOIN on the distinct
  *          (geo_zip, geo_kc) ref — NULL zip keeps NULL geo_kc, not 0.
  *
  * Scale: ONE scan of bene_enrollment; the stack is a generator and
  * both ref joins (date dim, geo_kc) are broadcast, so the build has no
  * wide shuffle at all — month grain is preserved, no windows needed.
  * The reference's 4 unpivot scans + 3 (bene, year, month) self-joins
  * would shuffle the full month-grain table three times.
  */
object McareEligMonth {

  /** @param bene    wide bene_enrollment rows: `id_mcare, cal_year,
    *                zip_cd` and for mm in 01..12: `buyin_mm, hmo_mm,
    *                rx_mm, dual_mm`
    * @param demo    person-level frame with `id_mcare, death_dt`
    * @param dateDim ref.date months: (year_month, first_day_month,
    *                last_day_month, year_quarter, year)
    * @param geoKc   ref geo_kc rows: (geo_zip, geo_kc)
    */
  def build(bene: DataFrame, demo: DataFrame, dateDim: DataFrame,
      geoKc: DataFrame): DataFrame = {
    import McareEligTimevar.{partA, partB, partC, partD, stateBuyin,
      partialDual, fullDual}
    val stackExpr = (1 to 12).map { m =>
      val mm = f"$m%02d"
      s"$m, buyin_$mm, hmo_$mm, rx_$mm, dual_$mm"
    }.mkString("stack(12, ", ", ", ") as (cal_mon, buyins, hmos, rx, duals)")
    val long = bene.select(col("id_mcare"), col("cal_year"),
      when(length(col("zip_cd")) >= 5, substring(col("zip_cd"), 1, 5))
        .as("geo_zip"),
      expr(stackExpr))
      .withColumn("year_month",
        (col("cal_year") * 100 + col("cal_mon")).cast("int"))

    val dates = dateDim.select(col("year_month").as("dd_ym"),
      col("first_day_month"), col("last_day_month"), col("year_quarter"),
      col("year")).distinct()
    val monthly = long
      .join(broadcast(dates), long("year_month") === dates("dd_ym"),
        "left")
      .select(col("id_mcare"),
        col("first_day_month").as("from_date"),
        col("last_day_month").as("to_date"),
        col("year_month"), col("year_quarter"), col("year"),
        col("geo_zip"),
        partA(col("buyins")).as("part_a"),
        partB(col("buyins")).as("part_b"),
        partC(col("hmos")).as("part_c"),
        partD(col("rx")).as("part_d"),
        stateBuyin(col("buyins")).as("state_buyin"),
        partialDual(col("duals")).as("partial_dual"),
        fullDual(col("duals")).as("full_dual"))

    // a NULL flag nulls the sum and drops the month (reference WHERE)
    val covSum = Seq("part_a", "part_b", "part_c", "part_d",
      "state_buyin", "partial_dual", "full_dual").map(col).reduce(_ + _)
    val alive = monthly.filter(covSum > 0)
      .join(demo.select(col("id_mcare"), col("death_dt")),
        Seq("id_mcare"), "left")
      .filter(col("from_date") <= col("death_dt") ||
        col("death_dt").isNull)
      .withColumn("to_date",
        when(col("death_dt").isNotNull &&
          col("from_date") <= col("death_dt") &&
          col("to_date") > col("death_dt"), col("death_dt"))
          .otherwise(col("to_date")))
      .drop("death_dt")

    val kc = geoKc.select(col("geo_zip").as("kc_zip"), col("geo_kc"))
      .distinct()
    alive
      .join(broadcast(kc), alive("geo_zip") === kc("kc_zip"), "left")
      .select(col("id_mcare"), col("from_date"), col("to_date"),
        col("year_month"), col("year_quarter"), col("year"),
        col("part_a"), col("part_b"), col("part_c"), col("part_d"),
        col("full_dual"), col("partial_dual"), col("state_buyin"),
        col("geo_zip"), col("geo_kc"),
        (datediff(col("to_date"), col("from_date")) + 1)
          .as("cov_time_day"))
  }
}
