package graft.builds

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** FUM (Follow-up After ED Visit for Mental Illness) feeder — the
  * reference's sproc family (create_stage.sp_perf_fum_join_step.sql,
  * create_stage.fn_perf_fum_follow_up_visit.sql,
  * create_stage.fn_perf_fua_ed_index_visit_exclusion.sql — the join step
  * reuses the FUA exclusion function with @age=6,
  * @dx_value_set_name='Mental Illness').
  *
  * The interesting operator shape is the exclusion function's WHILE loop:
  * "if a member has more than one ED visit in a 31-day period, include
  * only the first eligible ED visit" — each iteration re-ranks the kept
  * set and drops the first visit that is < 31 days after its predecessor,
  * until none remain. That fixed point IS the greedy earliest-admission
  * scan (keep a visit iff its start is >= 31 days after the last KEPT
  * start), so here it's ONE per-person sorted pass in flatMapGroups with
  * O(1) state — no driver loop, no repeated window passes over the full
  * table, bounded work per person.
  */
object FumMeasure {

  /** visit row inside the group: epoch days for calendar-safe arithmetic
    * (not private — Spark's generated encoder code cannot access private
    * members) */
  case class V(id: Long, claimId: Long, age: Int, fsd: Long, lsd: Long)
  case class VOut(id_person: Long, claim_id: Long, age: Int,
      fsd_day: Long, lsd_day: Long, ed_within_30_day: Int)

  /** The WHILE-loop fixed point (fn_perf_fua_ed_index_visit_exclusion.sql
    * :95-185): every visit keeps its row; `ed_within_30_day` = 1 marks
    * visits dropped by the 31-day greedy dedup (the [drop] column).
    * Deterministic (first, last, claim) ordering matches the reference's
    * ROW_NUMBER tie-break.
    *
    * Input: (id_person, claim_id, age, first_service_date,
    * last_service_date). */
  def greedyEdDedup(visits: DataFrame): DataFrame = {
    val s = visits.sparkSession
    import s.implicits._
    val epoch = to_date(lit("1970-01-01"))
    // fail FAST on non-numeric/null ids: a silent cast-to-null would die
    // deep inside the primitive-Long encoder (or corrupt the tie-break)
    def longOrError(c: String) = {
      val cast = col(c).cast("long")
      when(cast.isNull,
        raise_error(concat(lit(s"greedyEdDedup: non-numeric or null $c: "),
          coalesce(col(c).cast("string"), lit("null")))))
        .otherwise(cast)
    }
    val ds: Dataset[V] = visits.select(
      longOrError("id_person").as("id"),
      longOrError("claim_id").as("claimId"),
      col("age").cast("int").as("age"),
      datediff(col("first_service_date"), epoch).cast("long").as("fsd"),
      datediff(col("last_service_date"), epoch).cast("long").as("lsd")).as[V]
    ds.groupByKey(_.id)
      .flatMapGroups { (pid, it) =>
        val sorted = it.toArray.sortBy(v => (v.fsd, v.lsd, v.claimId))
        var lastKept = Long.MinValue / 2
        sorted.iterator.map { v =>
          val dropped = if (v.fsd - lastKept < 31) 1
            else { lastKept = v.fsd; 0 }
          VOut(pid, v.claimId, v.age, v.fsd, v.lsd, dropped)
        }
      }
      .toDF()
      .select(col("id_person"), col("claim_id"), col("age"),
        date_add(epoch, col("fsd_day").cast("int"))
          .as("first_service_date"),
        date_add(epoch, col("lsd_day").cast("int")).as("last_service_date"),
        col("ed_within_30_day"))
  }

  /** Inpatient-admission flag: an inpatient stay starting ON the visit's
    * last service date or within 30 days after (day-0 INCLUSIVE — unlike
    * FUH's +1 windows). `inpatient` carries (id_person,
    * first_service_date). */
  def withInpatientFlag(visits: DataFrame, inpatient: DataFrame): DataFrame = {
    val ip = inpatient.select(col("id_person").as("i_id"),
      col("first_service_date").as("i_fsd"), lit(1).as("i_flag"))
    val keys = visits.columns.map(col)
    visits.join(ip,
        col("id_person") === col("i_id") &&
        col("i_fsd").between(col("last_service_date"),
          date_add(col("last_service_date"), 30)), "left")
      .groupBy(keys.toSeq: _*)
      .agg(max(coalesce(col("i_flag"), lit(0)))
        .as("inpatient_within_30_day"))
  }

  /** FUM follow-up visits (fn_perf_fum_follow_up_visit.sql): the FUH
    * condition frames, each additionally INTERSECTed with the Mental
    * Health Diagnosis principal-dx claims (FUM requires the dx on the
    * follow-up itself; FUH does not). Frames carry (id_person, claim_id,
    * service_date). */
  def followUpVisits(conditions: Seq[DataFrame], mhdDx: DataFrame): DataFrame =
    conditions.map(_.intersect(mhdDx)).reduce(_ union _).distinct()
      .withColumn("flag", lit(1))

  /** The join step (sp_perf_fum_join_step.sql): surviving index visits
    * (both exclusion flags 0) with need_1_month_coverage, then the 7/30
    * day follow-up indicators over [last_service_date,
    * last_service_date + N] — day-0 inclusive. Sequential join+aggregate
    * per window, same scale rationale as [[FuhMeasure.joinStep]]. */
  def joinStep(indexVisits: DataFrame, followUp: DataFrame,
      startDate: String, endDate: String): DataFrame = {
    val start = to_date(lit(startDate))
    val end = to_date(lit(endDate))
    val idx = indexVisits
      .filter(col("ed_within_30_day") === 0 &&
        col("inpatient_within_30_day") === 0)
      .withColumn("need_1_month_coverage",
        FuhMeasure.need1MonthCoverage(col("last_service_date")))
      .withColumn("ym", year(col("first_service_date")) * 100 +
        month(col("first_service_date")))
    val fu = followUp.filter(col("service_date").between(start, end))
    // FUM's windows are day-0 inclusive (fromOffset = 0), unlike FUH's +1
    val with7 = FuhMeasure.attachMaxFlag(idx, fu, 0, 7,
      "last_service_date", "follow_up_7_day")
    FuhMeasure.attachMaxFlag(with7, fu, 0, 30,
        "last_service_date", "follow_up_30_day")
      .withColumnRenamed("flag", "ed_index_visit")
  }
}
