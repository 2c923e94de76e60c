package graft.builds

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** AH (avoidable hospitalization) numerator — the reference's
  * create_stage.v_perf_ah_observation_stay.sql,
  * create_stage.v_perf_ah_medicine_surgery.sql,
  * create_stage.v_perf_ah_inpatient_exclusion.sql and
  * create_stage.v_perf_ah_inpatient_numerator.sql, composed over the
  * [[PcrMeasure.directTransfer]] episode stitching.
  *
  * The new shape here is the HEDIS observation-stay reclassification: an
  * observation visit "results in" an inpatient stay when an acute
  * admission lands on the observation date or one calendar day after —
  * those observation claims convert (drop out of the observation
  * discharge set), as do observation claims billed as inpatient
  * themselves. Everything else is value-set algebra and anti-joins
  * already in the engine's vocabulary.
  */
object AhMeasure {

  /** Observation discharges (v_perf_ah_observation_stay): `obs` carries
    * (id_person, claim_id, first_service_date, last_service_date,
    * patient_status); `acuteInpatient` (id_person, first_service_date)
    * are acute admissions; `inpatientBilled` (claim_id) are observation
    * claims billed as inpatient (clm_type 31/33). */
  def observationStays(obs: DataFrame, acuteInpatient: DataFrame,
      inpatientBilled: DataFrame): DataFrame = {
    val ip = acuteInpatient.select(col("id_person").as("i_id"),
      col("first_service_date").as("i_first"))
    // observation claims converting into an inpatient stay: acute
    // admission on the observation date or one day after (DATEDIFF 0/1)
    val converted = obs.join(ip,
      col("id_person") === col("i_id") &&
        datediff(col("i_first"), col("last_service_date")).between(0, 1),
      "left_semi")
    obs
      .join(converted.select(col("claim_id")), Seq("claim_id"), "left_anti")
      .join(inpatientBilled.select(col("claim_id")), Seq("claim_id"),
        "left_anti")
      .withColumn("death_during_stay",
        when(col("patient_status") === "20", 1).otherwise(0))
      .withColumn("observation_stay", lit(1))
  }

  /** Medicine/surgery classification flags
    * (v_perf_ah_medicine_surgery.sql): the value-set membership frame
    * (claim_id, value_set_name) pivoted to per-claim flag columns. */
  def medicineSurgery(valueSets: DataFrame): DataFrame =
    valueSets.groupBy(col("claim_id")).agg(
      max(when(col("value_set_name") === "Surgery", 1)).as("surgery_rev"),
      max(when(col("value_set_name") === "Surgery MS-DRG", 1))
        .as("surgery_drg"))

  /** The numerator (v_perf_ah_inpatient_numerator.sql): first stays of
    * stitched episodes UNION observation discharges (deaths excluded on
    * both sides), minus the exclusion claim set (NOT IN -> anti-join),
    * with discharge month and the medicine/surgery split — medicine is
    * the absence of both surgery flags, exactly the reference CASE. */
  def inpatientNumerator(transfers: DataFrame, obsStays: DataFrame,
      medSurg: DataFrame, exclusions: DataFrame): DataFrame = {
    val discharges = transfers
      .filter(col("stay_id") === 1 && col("death_during_stay") === 0)
      .select(col("id_person"), col("claim_id"),
        col("episode_first_service_date").as("first_service_date"),
        col("episode_last_service_date").as("last_service_date"),
        lit(0).as("observation_stay"))
      .union(obsStays.filter(col("death_during_stay") === 0)
        .select(col("id_person"), col("claim_id"),
          col("first_service_date"), col("last_service_date"),
          col("observation_stay")))
      .distinct()
    discharges
      .join(exclusions.select(col("claim_id")).distinct(), Seq("claim_id"),
        "left_anti")
      .join(medSurg, Seq("claim_id"), "left")
      .select(
        (year(col("last_service_date")) * 100 +
          month(col("last_service_date"))).as("ym"),
        col("id_person"), col("claim_id"), col("first_service_date"),
        col("last_service_date"), col("observation_stay"),
        lit(1).as("total_discharges"),
        when(col("surgery_rev").isNull && col("surgery_drg").isNull, 1)
          .otherwise(0).as("medicine"),
        when(col("surgery_rev") === 1 || col("surgery_drg") === 1, 1)
          .otherwise(0).as("surgery"))
  }
}
