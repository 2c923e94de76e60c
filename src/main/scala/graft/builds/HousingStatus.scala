package graft.builds

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Medicaid housing-status periods — load_stage.mcaid_housing_status.R
  * (the "pha" linkage's claims-side input):
  *
  *  zcodes  housing-related ICD-10 Z-codes pulled from the dx table
  *          (exact IN list + the Z5981x prefix family);
  *  temp1   month-grain eligibility periods LEFT JOINed to z-code events
  *          landing inside the period (equi anchor on the person id +
  *          date-BETWEEN — the §2.3 range-join shape), plus the
  *          address-based flag (HOMELESS substring in either address
  *          line);
  *  temp2   status classification: z-code status wins over the address
  *          flag ('homeless' / 'unstably housed'), source recorded as
  *          homeless_address / z_codes / multiple; periods with neither
  *          signal drop;
  *  temp3   per-period distinct-count of status and source values;
  *  final   conflict collapse: >1 status → 'homeless', >1 source →
  *          'multiple'; DISTINCT to the period grain.
  *
  * Scale: the z-code sliver is tiny relative to the month table; the
  * range join shuffles both sides once on the person id, and the
  * collapse is one partial-agg shuffle on the period key.
  */
object HousingStatus {

  private val homelessZ = Seq("Z590", "Z5900", "Z5901", "Z5902")
  private val unstableZ = Seq("Z591", "Z5910", "Z5919")

  /** eligMonth: (id_mcaid, from_date, to_date, geo_add1, geo_add2).
    * icdcm: (id_mcaid, first_service_date, icdcm_norm). */
  def build(eligMonth: DataFrame, icdcm: DataFrame): DataFrame = {
    val zcodes = icdcm
      .filter(col("icdcm_norm").isin(homelessZ ++ unstableZ: _*) ||
        col("icdcm_norm").startsWith("Z5981"))
      .select(col("id_mcaid").as("z_id"),
        col("first_service_date"), col("icdcm_norm"))
    val temp1 = eligMonth
      .join(zcodes, col("id_mcaid") === col("z_id") &&
        col("first_service_date").between(col("from_date"), col("to_date")),
        "left")
      .select(col("id_mcaid"), col("from_date"), col("to_date"),
        when(col("geo_add1").contains("HOMELESS") ||
          col("geo_add2").contains("HOMELESS"), 1).otherwise(0)
          .as("is_homeless_addr"),
        when(col("icdcm_norm").isin(homelessZ: _*), "homeless")
          .when(col("icdcm_norm").isin(unstableZ: _*) ||
            col("icdcm_norm").startsWith("Z5981"), "unstably housed")
          .as("zcode_status"))
    val temp2 = temp1
      .filter(col("is_homeless_addr") === 1 || col("zcode_status").isNotNull)
      .select(col("id_mcaid"), col("from_date"), col("to_date"),
        coalesce(col("zcode_status"),
          when(col("is_homeless_addr") === 1, "homeless"))
          .as("housing_status"),
        when(col("is_homeless_addr") === 1 && col("zcode_status").isNotNull,
          "multiple")
          .when(col("is_homeless_addr") === 1 && col("zcode_status").isNull,
            "homeless_address")
          .when(col("is_homeless_addr") === 0 && col("zcode_status").isNotNull,
            "z_codes")
          .as("housing_status_source"))
    val periodKeys = Seq("id_mcaid", "from_date", "to_date")
    val temp3 = temp2.groupBy(periodKeys.map(col): _*)
      .agg(countDistinct(col("housing_status")).as("status_dcount"),
        countDistinct(col("housing_status_source")).as("source_dcount"))
    temp2.join(temp3, periodKeys, "left")
      .select(col("id_mcaid"), col("from_date"), col("to_date"),
        when(col("status_dcount") > 1, "homeless")
          .otherwise(col("housing_status")).as("housing_status"),
        when(col("source_dcount") > 1, "multiple")
          .otherwise(col("housing_status_source"))
          .as("housing_status_source"))
      .distinct()
  }
}
