package graft.builds

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hospice member-month denominator exclusion — the reference's
  * create_stage.v_mcaid_perf_hospice_member_month.sql: three code-joined
  * sources (claim header by type-of-bill, claim line by revenue code,
  * claim procedure by CPT/HCPCS) UNION-distinct into one
  * (member, month, hospice_flag = 1) frame that measure denominators
  * subtract.
  *
  * The reference attaches the month by joining first_service_date BETWEEN
  * ref.perf_year_month bounds — a month truncation wearing a join costume;
  * expressed directly as date_trunc so the build is three scans + one
  * distinct shuffle, no spine join at all.
  *
  * Each input frame carries (id_person, svc_date, code).
  */
object HospiceMemberMonth {

  def build(headerTob: DataFrame, lineRev: DataFrame, procCode: DataFrame,
      hospiceTob: Seq[String], hospiceRev: Seq[String],
      hospiceProc: Seq[String]): DataFrame = {
    def one(df: DataFrame, codes: Seq[String]) =
      df.filter(col("code").isin(codes: _*))
        .select(col("id_person"),
          to_date(date_trunc("MONTH", col("svc_date"))).as("month"))
    one(headerTob, hospiceTob)
      .union(one(lineRev, hospiceRev))
      .union(one(procCode, hospiceProc))
      .distinct()
      .withColumn("hospice_flag", lit(1))
  }
}
