package graft.builds

import java.sql.Date
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Enrollment-denominator kernels: anniversary age semantics, the window
  * battery on a hand-built member, and the last-known-ZIP fill's
  * equivalence to the reference's two-window formulation. */
class EnrollDenomSpec extends SparkSpec {

  private def d(s: String) = Date.valueOf(s)

  test("ageYears/ageMonths use exact anniversary (DATEDIFF-corrected)") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      // birthday not yet reached in the year: year diff - 1
      (d("1990-06-15"), d("2000-06-14"), 9, 119),
      (d("1990-06-15"), d("2000-06-15"), 10, 120),
      // Jan-31 dob: Feb-28 completes the month (add_months clamps)
      (d("1990-01-31"), d("1990-02-28"), 0, 1),
      (d("1990-01-31"), d("1990-03-30"), 0, 1),
      (d("1990-01-31"), d("1990-03-31"), 0, 2))
      .toDF("dob", "at", "exp_years", "exp_months")
    val got = rows.select(
      EnrollDenom.ageYears(col("dob"), col("at")).as("y"),
      EnrollDenom.ageMonths(col("dob"), col("at")).as("m"),
      col("exp_years"), col("exp_months"))
      .as[(Int, Int, Int, Int)].collect()
    got.foreach { case (y, m, ey, em) => assert((y, m) == (ey, em)) }
  }

  test("window battery: trailing, prior, and leading sums line up") {
    val s = spark
    import s.implicits._
    // one member, 24 dense months; enrolled only in months 13..24,
    // hospice in month 13 only
    val mm = (1 to 24).map { i =>
      val ym = if (i <= 12) 199600 + i else 199688 + i // 199601.., 199701..
      (ym, (i - 1) % 12 + 1, 1L, d("1950-01-01"), 47, 571,
        if (i >= 13) 1 else 0, 1, 0, 0, if (i == 13) 1 else 0,
        if (i >= 13) 1 else 0, if (i % 2 == 0) s"98$i" else null, i)
    }.toDF("year_month", "month", "id_person", "dob", "end_month_age",
      "age_in_months", "enrolled_any", "full_benefit", "dual", "tpl",
      "hospice", "full_criteria", "zip_code", "row_num")
    val out = EnrollDenom.enrollDenom(mm, 199701, 199712)
      .orderBy(col("year_month"))
    val rows = out.select("year_month", "enrolled_any_t_12_m",
        "hospice_t_12_m", "hospice_prior_t_12_m", "hospice_p_2_m",
        "full_criteria_t_12_m")
      .as[(Int, Long, Long, Long, Long, Long)].collect()
    // month 13 (199701): trailing 12 = months 2..13 -> 1 enrolled month
    assert(rows.head == ((199701, 1L, 1L, 0L, 1L, 1L)))
    // month 24 (199712): trailing 12 = months 13..24, all enrolled;
    // hospice month 13 still inside; prior window = months 1..12
    assert(rows.last == ((199712, 12L, 1L, 0L, 0L, 12L)))
    // month 25 absent: hospice_p_2_m at 24 sums current row only
  }

  test("last-zip fill equals the reference two-window formulation") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(7)
    val mm = (for (p <- 1L to 5L; i <- 1 to 24) yield {
      val zip = if (rng.nextInt(4) == 0) s"98${p}$i" else null
      (p, i, zip)
    }).toDF("id_person", "row_num", "zip_code")
    val t12 = Window.partitionBy(col("id_person")).orderBy(col("row_num"))
      .rowsBetween(-11, 0)
    val ours = mm.withColumn("last_zip",
      last(col("zip_code"), ignoreNulls = true).over(t12))
    // sp_mcaid_perf_enroll_denom.sql:96-117: MAX(relevant ym) over the
    // trailing frame, then MAX(zip) partitioned by (id, that month)
    val lym = mm.withColumn("lym",
      max(when(col("zip_code").isNotNull, col("row_num"))).over(t12))
    val ref = lym.withColumn("last_zip",
      max(col("zip_code")).over(
        Window.partitionBy(col("id_person"), col("lym"))))
    val a = ours.select("id_person", "row_num", "last_zip")
      .as[(Long, Int, Option[String])].collect().toSet
    val b = ref.select("id_person", "row_num", "last_zip")
      .as[(Long, Int, Option[String])].collect().toSet
    assert(a == b)
  }
}
