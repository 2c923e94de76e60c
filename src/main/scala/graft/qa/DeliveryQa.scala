package graft.qa

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pre-load delivery QA
  * (db_loader/mcaid/new_files_download.R:150-260) — the checks run on
  * a freshly downloaded/consolidated Medicaid delivery BEFORE any SQL
  * load, against the PREVIOUS delivery's etl_log row:
  *
  *  - type by filename ('elig' substring, else claims; :152-156);
  *  - column-ORDER check: the file's headers compared POSITIONALLY
  *    against the yaml's declared vars (:166-170 — any position
  *    mismatch flips the whole file to FAIL);
  *  - delivery date from the filename's trailing yyyymmdd
  *    (:171-173);
  *  - month span: elig files read CLNDR_YEAR_MNTH, claims derive
  *    yyyymm from FROM_SRVC_DATE; min_date = first day of the min
  *    month, max_date = last day of the max month (:176-207);
  *  - rows-per-month drift: curr_rpm = rows / month-span vs the
  *    previous delivery's row_count / (DATEDIFF(month)+1), reported
  *    as a relative difference (:181-195);
  *  - per-month distribution: row count and share per
  *    CLNDR_YEAR_MNTH (:196-199 — the reviewer's eyeball table);
  *  - months-vs-prev: observed distinct months == the previous
  *    delivery's span (:239-243);
  *  - expected dates: the new span's min AND max land exactly one
  *    whole month after the previous delivery's (:244-249 —
  *    lubridate interval %/% months(1); re-expressed as the
  *    month-index difference with a day-of-month clamp, month-end to
  *    month-end counting as whole months — the fixture keeps both
  *    ends day-aligned so every convention agrees).
  *
  * Output: one frame, two sections — 'file' (one verdict row per
  * delivery file) and 'month' (the distribution rows).
  *
  * Scale: per file, one fused aggregate for the scalars and one
  * month-grain groupBy for the distribution; the month table is
  * span-bounded (dozens of rows). The previous-delivery probe is the
  * etl_log TOP(1) — a literal here. */
object DeliveryQa {

  /** The previous delivery's etl_log TOP(1) row (:181-190):
    * rows-per-month, month span, and date bounds (yyyy-MM-dd). */
  case class PrevDelivery(rpm: Double, numMon: Int, dateMin: String,
      dateMax: String)

  /** Whole months from a to b, day-clamped (see object doc). */
  private def wholeMonths(a: java.time.LocalDate,
      b: java.time.LocalDate): Int = {
    val idx = (b.getYear * 12 + b.getMonthValue) -
      (a.getYear * 12 + a.getMonthValue)
    val bMonthEnd = b.getDayOfMonth == b.lengthOfMonth
    if (b.getDayOfMonth < a.getDayOfMonth && !bMonthEnd) idx - 1 else idx
  }

  /** One delivery file: (file name, its consolidated frame, the
    * yaml's declared column order, the previous delivery). */
  def battery(s: SparkSession,
      files: Seq[(String, DataFrame, Seq[String], PrevDelivery)])
      : DataFrame = {
    import s.implicits._
    val sections = files.map { case (name, df, vars, prev) =>
      val isElig = name.toLowerCase.contains("elig")
      val tpe = if (isElig) "elig" else "claims"
      // positional header compare over the declared list (:166-170)
      val colQa = if (vars.zip(df.columns).forall { case (a, b) => a == b }
          && vars.length <= df.columns.length) "PASS" else "FAIL"
      val dd = name.dropRight(4).takeRight(8)
      val delDate = s"${dd.take(4)}-${dd.slice(4, 6)}-${dd.drop(6)}"
      val ym = if (isElig) col("CLNDR_YEAR_MNTH").cast("int")
        else (year(col("FROM_SRVC_DATE")) * 100 +
          month(col("FROM_SRVC_DATE")))
      val withYm = df.withColumn("ym", ym)
      val agg = withYm.agg(count(lit(1)).as("n"),
        min(col("ym")).as("ym0"), max(col("ym")).as("ym1"),
        count_distinct(col("ym")).as("mon_cnt")).head()
      val n = agg.getLong(0)
      // empty delivery: no span to derive — report the file row with
      // NULL bounds and failed comparisons (no-throw contract)
      val (minS, maxS, rpmDiff, monCnt, monvprev, expdates) =
        if (n == 0L) (null: String, null: String, -1.0d, 0L, "FAIL",
          "FAIL")
        else {
          val (ym0, ym1) = (agg.getInt(1), agg.getInt(2))
          val monCnt0 = agg.getLong(3)
          val minDate = java.time.LocalDate.of(ym0 / 100, ym0 % 100, 1)
          val maxDate = java.time.LocalDate.of(ym1 / 100, ym1 % 100, 1)
            .plusMonths(1).minusDays(1)
          val span = (ym1 / 100 * 12 + ym1 % 100) -
            (ym0 / 100 * 12 + ym0 % 100) + 1
          val currRpm = n.toDouble / span
          val mv = if (monCnt0 == prev.numMon) "PASS" else "FAIL"
          val ed =
            if (wholeMonths(java.time.LocalDate.parse(prev.dateMin),
                  minDate) == 1 &&
                wholeMonths(java.time.LocalDate.parse(prev.dateMax),
                  maxDate) == 1) "PASS" else "FAIL"
          (minDate.toString, maxDate.toString,
            (currRpm - prev.rpm) / prev.rpm, monCnt0, mv, ed)
        }
      val fileRow = Seq((name, tpe, delDate, minS, maxS, colQa, n,
          rpmDiff, monCnt, monvprev, expdates))
        .toDF("file_name", "type", "del_date", "min_date", "max_date",
          "col_qa", "row_cnt", "rpm_diff", "mon_cnt", "monvprev",
          "expdates")
        .select(lit("file").as("section"), col("file_name"),
          lit(null).cast("int").as("ym"), lit(null).cast("long").as("n"),
          lit(null).cast("double").as("perc"), col("type"),
          col("del_date"), col("min_date"), col("max_date"),
          col("col_qa"), col("row_cnt"), col("rpm_diff"),
          col("mon_cnt"), col("monvprev"), col("expdates"))
      val monthRows = withYm.groupBy(col("ym"))
        .agg(count(lit(1)).as("n"))
        .select(lit("month").as("section"), lit(name).as("file_name"),
          col("ym"), col("n"),
          (col("n").cast("double") / lit(n.toDouble)).as("perc"),
          lit(null).cast("string").as("type"),
          lit(null).cast("string").as("del_date"),
          lit(null).cast("string").as("min_date"),
          lit(null).cast("string").as("max_date"),
          lit(null).cast("string").as("col_qa"),
          lit(null).cast("long").as("row_cnt"),
          lit(null).cast("double").as("rpm_diff"),
          lit(null).cast("long").as("mon_cnt"),
          lit(null).cast("string").as("monvprev"),
          lit(null).cast("string").as("expdates"))
      fileRow.unionByName(monthRows)
    }
    sections.reduce(_ unionByName _)
  }
}
