package graft.builds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FUA ED-index-visit feeder — the reference's table-valued function
  * (create_stage.fn_perf_fua_ed_index_visit.sql): index visits are claims
  * carrying the qualifying PRIMARY diagnosis INTERSECTed with claims that
  * are ED visits by revenue code UNION ED visits by procedure code, all
  * within the measurement window, then age-filtered against member dob
  * with exact-anniversary arithmetic (the DATEDIFF(YEAR) - CASE WHEN
  * DATEADD(YEAR, ...) > date correction).
  *
  * Output feeds [[PerfMeasures]] as a monthly per-member fact via
  * `extraFacts` — the reference materializes the same set into its
  * perf-staging table before the measure dispatch.
  */
object FuaMeasure {

  /** T-SQL whole-years-between: year-diff minus one when the anniversary
    * (DATEADD-style, Feb-29 clamps to Feb-28) has not yet passed. */
  def ageAt(dob: Column, at: Column): Column = {
    val yd = year(at) - year(dob)
    yd - when(add_months(dob, yd * 12) > at, 1).otherwise(0)
  }

  /** All frames carry (id_person, claim_id, svc_date); demo carries
    * (id_person, dob). Returns qualifying index visits with member age. */
  def indexVisits(dxClaims: DataFrame, edRevClaims: DataFrame,
      edProcClaims: DataFrame, demo: DataFrame,
      startDate: String, endDate: String, minAge: Int): DataFrame = {
    def inWindow(df: DataFrame) = df.filter(
      col("svc_date").between(to_date(lit(startDate)), to_date(lit(endDate))))
      .select(col("id_person"), col("claim_id"), col("svc_date"))
    // ED by revenue code UNION (distinct) ED by procedure code, then
    // INTERSECT with the qualifying-dx claims — the reference's exact set
    // algebra (fn_perf_fua_ed_index_visit.sql get_claims CTE)
    val ed = inWindow(edRevClaims).union(inWindow(edProcClaims)).distinct()
    val idx = inWindow(dxClaims).intersect(ed)
    idx.join(demo.select(col("id_person"), col("dob")), Seq("id_person"))
      .withColumn("age", ageAt(col("dob"), col("svc_date")))
      .filter(col("age") >= minAge)
      .select(col("id_person"), col("claim_id"), col("svc_date"), col("age"))
  }
}
