package graft.builds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Performance-measure enrollment denominator — the reference's
  * member-month TVF + window-battery sproc
  * (create_stage.fn_mcaid_perf_enroll_member_month.sql,
  * create_stage.sp_mcaid_perf_enroll_denom.sql).
  *
  * Shape: a DENSE member x month grid (every member gets a row for every
  * month, enrolled or not — the ROWS-frame windows below depend on it),
  * per-month 0/1 flags from left-joined eligibility/RAC/hospice frames,
  * then one window pass per member computing trailing-12 / prior-12 /
  * next-2 sums for each flag plus a last-known-ZIP fill.
  *
  * Scale: the grid is |members| x |months| — at statewide scale that is
  * ~2M x 24 = 48M rows, far smaller than the claim tables; every window
  * partitions by member id and orders by the spine row number, so the
  * whole battery is ONE shuffle on id_person followed by in-partition
  * frame scans (Spark fuses same-partitioning windows into consecutive
  * WindowExecs without re-exchanging). The reference's two-window
  * MAX(relevant_year_month) trick for the last ZIP exists because T-SQL
  * lacks IGNORE NULLS; `last(_, ignoreNulls = true)` over the same
  * trailing frame is the single-window equivalent (EnrollDenomSpec pins
  * the equivalence against the two-window formulation).
  */
object EnrollDenom {

  /** T-SQL DATEDIFF(YEAR)-with-anniversary-correction age
    * (fn_mcaid_perf_enroll_member_month.sql:21). */
  def ageYears(dob: Column, at: Column): Column =
    (year(at) - year(dob) -
      when(add_months(dob, (year(at) - year(dob)) * 12) > at, 1)
        .otherwise(0)).cast("int")

  /** Same semantics in months (sql:22): completed months at `at`. */
  def ageMonths(dob: Column, at: Column): Column = {
    val raw = (year(at) - year(dob)) * 12 + (month(at) - month(dob))
    (raw - when(add_months(dob, raw) > at, 1).otherwise(0)).cast("int")
  }

  /** The member-month TVF: demo CROSS JOIN month spine (dense grid),
    * LEFT JOIN eligibility month rows, RAC benefit dim (broadcast), and
    * hospice member-months; end-month ages with exact anniversary
    * semantics.
    *
    * @param demo    (id_person, dob)
    * @param spine   (year_month, month, end_month, row_num) — the
    *                ref.perf_year_month slice, already bounded
    * @param elig    (id_person, year_month, dual, tpl, rac_code,
    *                zip_code) one row per enrolled member-month
    * @param racDim  (rac_code, full_benefit) small lookup
    * @param hospice (id_person, year_month, hospice_flag)
    */
  def memberMonths(demo: DataFrame, spine: DataFrame, elig: DataFrame,
      racDim: DataFrame, hospice: DataFrame): DataFrame = {
    val e = elig.select(col("id_person"), col("year_month"),
      lit(1).as("_enr"), col("dual"), col("tpl"), col("rac_code"),
      col("zip_code"))
    demo.crossJoin(broadcast(spine))
      .join(e, Seq("id_person", "year_month"), "left")
      .join(broadcast(racDim), Seq("rac_code"), "left")
      .join(hospice.select(col("id_person"), col("year_month"),
        col("hospice_flag")), Seq("id_person", "year_month"), "left")
      .select(col("year_month"), col("month"), col("id_person"),
        col("dob"),
        ageYears(col("dob"), col("end_month")).as("end_month_age"),
        ageMonths(col("dob"), col("end_month")).as("age_in_months"),
        coalesce(col("_enr"), lit(0)).as("enrolled_any"),
        when(col("full_benefit") === "Y", 1).otherwise(0)
          .as("full_benefit"),
        when(col("dual") === "Y", 1).otherwise(0).as("dual"),
        when(col("tpl") === "Y", 1).otherwise(0).as("tpl"),
        coalesce(col("hospice_flag"), lit(0)).as("hospice"),
        when(col("_enr").isNotNull && col("full_benefit") === "Y" &&
          col("dual") === "N" && col("tpl") === " ", 1).otherwise(0)
          .as("full_criteria"),
        col("zip_code"), col("row_num"))
  }

  /** The window battery (sp_mcaid_perf_enroll_denom.sql:36-58): for each
    * flag, trailing-12 sums; for hospice/full_criteria additionally the
    * PRIOR 12 (months -23..-12) and next-2 sums; under-21 members keep
    * age_in_months; last known ZIP within the trailing 12 months; keep
    * only in-range months with any enrollment in the trailing year. */
  def enrollDenom(mm: DataFrame, startYm: Int, endYm: Int): DataFrame = {
    val byMember = Window.partitionBy(col("id_person"))
      .orderBy(col("row_num"))
    val t12 = byMember.rowsBetween(-11, 0)
    val prior12 = byMember.rowsBetween(-23, -12)
    val next2 = byMember.rowsBetween(0, 1)
    def s(c: String, w: org.apache.spark.sql.expressions.WindowSpec) =
      sum(col(c)).over(w)
    mm.select(col("year_month"),
        when(col("month").isin(3, 6, 9, 12), 1).otherwise(0)
          .as("end_quarter"),
        col("id_person"), col("dob"), col("end_month_age"),
        when(col("end_month_age").between(0, 20), col("age_in_months"))
          .as("age_in_months"),
        // T-SQL's two-window MAX(relevant_year_month)/MAX(zip) pair is
        // exactly last-non-null over the same trailing frame
        last(col("zip_code"), ignoreNulls = true).over(t12)
          .as("last_zip_code"),
        col("enrolled_any"), s("enrolled_any", t12).as("enrolled_any_t_12_m"),
        col("full_benefit"), s("full_benefit", t12).as("full_benefit_t_12_m"),
        col("dual"), s("dual", t12).as("dual_t_12_m"),
        col("tpl"), s("tpl", t12).as("tpl_t_12_m"),
        col("hospice"), s("hospice", t12).as("hospice_t_12_m"),
        s("hospice", prior12).as("hospice_prior_t_12_m"),
        s("hospice", next2).as("hospice_p_2_m"),
        col("full_criteria"),
        s("full_criteria", t12).as("full_criteria_t_12_m"),
        s("full_criteria", prior12).as("full_criteria_prior_t_12_m"),
        s("full_criteria", next2).as("full_criteria_p_2_m"))
      .filter(col("year_month").between(startYm, endYm) &&
        col("enrolled_any_t_12_m") >= 1)
  }
}
