package graft.builds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Intervals

/** mcare elig_timevar — the Medicare enrollment timeline build
  * (load_stage.mcare_elig_timevar.R):
  *
  *   1. reshape the wide bene_enrollment year rows (12 monthly indicator
  *      columns x 4 families) to month grain. The reference runs FOUR
  *      separate UNPIVOTs and re-joins them on (bene, year, month)
  *      (:24-125); here ONE `stack` emits all four families per month in
  *      a single scan — same rows, one pass, no self-joins;
  *   2. recode the ResDAC monthly codes to coverage flags (:140-176):
  *      part_a/part_b from the buy-in code, part_c from the HMO code,
  *      part_d from the Part-D contract prefix, state_buyin,
  *      partial_dual/full_dual from the dual-status code — each CASE is
  *      deliberately NON-exhaustive, so an unknown code yields NULL;
  *   3. drop months with no coverage — `cov_type_sum > 0`, where a NULL
  *      flag nulls the whole sum and drops the month (the reference's
  *      T-SQL semantics, kept verbatim) — drop months starting after
  *      death, truncate to_date at death (:185-214);
  *   4. contiguous-period islands per (person, zip, all 7 flags) and
  *      min/max collapse (:215-332, the 3-step lag/flag/spread ≡
  *      [[Intervals.islandIds]]);
  *   5. cov_time_day, the contiguous-with-previous-row flag, and the
  *      King-County zip flag (:336-383).
  *
  * Scale: one scan of bene_enrollment (stack is a generator, not a
  * shuffle), one broadcast-able join to demo for death dates, then one
  * shuffle keyed on (person + attrs) shared by the island window and the
  * collapse groupBy, and one final per-person window. The reference's
  * three unpivot re-joins — each a full shuffle of the month-grain table
  * — don't exist here.
  */
object McareEligTimevar {

  /** ResDAC Medicare entitlement/buy-in code → Part A flag (:142-146). */
  def partA(b: Column): Column =
    when(b.isin("1", "3", "A", "C"), 1).when(b.isin("0", "2", "B"), 0)

  /** Buy-in code → Part B flag (:147-151). */
  def partB(b: Column): Column =
    when(b.isin("2", "3", "B", "C"), 1).when(b.isin("0", "1", "A"), 0)

  /** HMO indicator → Part C / Medicare Advantage flag (:152-156). */
  def partC(h: Column): Column =
    when(h.isin("1", "2", "A", "B", "C"), 1).when(h.isin("0", "4"), 0)

  /** Part-D contract id → Part D flag: explicit no-coverage markers → 0,
    * contract-prefix letters → 1 (:157-161). */
  def partD(r: Column): Column =
    when(r.isin("N", "NULL", "*", "0", "NA") || r.isNull, 0)
      .when(substring(r, 1, 1).isin("E", "H", "R", "S", "X"), 1)

  /** Buy-in code → state buy-in flag (:162-166). */
  def stateBuyin(b: Column): Column =
    when(b.isin("0", "1", "2", "3"), 0).when(b.isin("A", "B", "C"), 1)

  /** Dual-status code → partial-dual flag (:167-171). */
  def partialDual(d: Column): Column =
    when(d.isin("NULL", "**", "0", "00", "2", "02", "4", "04", "8", "08",
      "9", "09", "99", "10", "NA") || d.isNull, 0)
      .when(d.isin("1", "01", "3", "03", "5", "05", "6", "06"), 1)

  /** Dual-status code → full-dual flag (:172-176). */
  def fullDual(d: Column): Column =
    when(d.isin("NULL", "**", "0", "00", "9", "09", "99", "NA", "1", "01",
      "3", "03", "5", "05", "6", "06") || d.isNull, 0)
      .when(d.isin("2", "02", "4", "04", "8", "08", "10"), 1)

  private val flagCols = Seq("part_a", "part_b", "part_c", "part_d",
    "state_buyin", "partial_dual", "full_dual")

  /** @param bene wide bene_enrollment rows: `id_mcare, cal_year, zip_cd`
    *   and for mm in 01..12: `buyin_mm, hmo_mm, rx_mm, dual_mm`
    * @param demo person-level frame with `id_mcare, death_dt` */
  def build(bene: DataFrame, demo: DataFrame,
      kcZips: Seq[String]): DataFrame = {
    val stackExpr = (1 to 12).map { m =>
      val mm = f"$m%02d"
      s"$m, buyin_$mm, hmo_$mm, rx_$mm, dual_$mm"
    }.mkString("stack(12, ", ", ", ") as (cal_mon, buyins, hmos, rx, duals)")
    val long = bene.select(col("id_mcare"), col("cal_year"),
      when(length(col("zip_cd")) >= 5, substring(col("zip_cd"), 1, 5))
        .as("geo_zip"),
      expr(stackExpr))
    val fromDate = to_date(concat(col("cal_year").cast("string"),
      lpad(col("cal_mon").cast("string"), 2, "0"), lit("01")), "yyyyMMdd")
    val monthly = long.select(col("id_mcare"),
      fromDate.as("from_date"), last_day(fromDate).as("to_date"),
      col("geo_zip"),
      partA(col("buyins")).as("part_a"),
      partB(col("buyins")).as("part_b"),
      partC(col("hmos")).as("part_c"),
      partD(col("rx")).as("part_d"),
      stateBuyin(col("buyins")).as("state_buyin"),
      partialDual(col("duals")).as("partial_dual"),
      fullDual(col("duals")).as("full_dual"))
    // a NULL flag nulls the sum and drops the month — reference semantics
    val covSum = flagCols.map(col).reduce(_ + _)
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
    val attrs = "geo_zip" +: flagCols
    val collapsed = Intervals.collapse(
      Intervals.islandIds(alive, Seq("id_mcare"), "from_date", "to_date",
        maxGapDays = 1, attrs = attrs),
      Seq("id_mcare"), "from_date", "to_date", attrs)
    val wPrev = Window.partitionBy(col("id_mcare")).orderBy(col("from_date"))
    collapsed
      .withColumn("contiguous",
        when(datediff(col("from_date"),
          lag(col("to_date"), 1).over(wPrev)) === 1, 1).otherwise(0))
      .withColumn("cov_time_day",
        datediff(col("to_date"), col("from_date")) + 1)
      .withColumn("geo_kc",
        when(col("geo_zip").isin(kcZips: _*), 1).otherwise(0))
      .select(col("id_mcare"), col("from_date"), col("to_date"),
        col("contiguous"), col("part_a"), col("part_b"), col("part_c"),
        col("part_d"), col("full_dual"), col("partial_dual"),
        col("state_buyin"), col("geo_zip"), col("geo_kc"),
        col("cov_time_day"))
  }
}
