package graft.builds

import java.sql.Date
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Pregnancy-episode construction — the reference's hierarchical endpoint
  * timeline (load_stage.mcaid_claim_preg_episode.R:194-560): endpoint
  * service days are placed on each person's timeline one endpoint CLASS at
  * a time, in hierarchy order (lb → sb → deliv → …). For each class:
  *
  *   1. **Conflict filter** (:289-325, :425-482): a candidate survives only
  *      if no ALREADY-PLACED endpoint of a higher class sits within that
  *      class's window on either side — strictly before and within W days,
  *      or strictly after and within W days (a placed endpoint on the SAME
  *      day does not block; the reference's prior/next subqueries use
  *      strict inequalities).
  *   2. **Greedy spacing grouping** (:203-243 WHILE loop): walking the
  *      survivors in date order, a running day-gap accumulator admits an
  *      endpoint to the timeline when the cumulative gap since the last
  *      admission exceeds the class threshold, then resets; the
  *      first-ranked endpoint always seeds the timeline.
  *   3. **Episode ids** (:265-270): rank of the admitted dates per person
  *      within the class.
  *
  * Spark-first shape per SURVEY §2.9 (same design as
  * [[graft.operators.Timeline]]): the whole per-person pass — all classes,
  * filters, and the sequential accumulator — runs in ONE
  * `groupByKey(person).flatMapGroups` over endpoint rows. Per-person
  * endpoint-day counts are tiny (dozens), keys distribute, so the build is
  * a single shuffle on person id at any corpus size — vs the reference's
  * ~20 temp tables and per-class WHILE loops over the full table.
  */
object PregEpisode {

  /** One endpoint class: hierarchy position = position in the Seq;
    * `windowDays` is both its greedy-spacing threshold and the conflict
    * window it imposes on lower classes (lb = 182, sb/deliv = 168). */
  case class EndpointClass(name: String, windowDays: Int)

  /** The reference's first three hierarchy levels. */
  val McaidHierarchy: Seq[EndpointClass] = Seq(
    EndpointClass("lb", 182), EndpointClass("sb", 168),
    EndpointClass("deliv", 168))

  // public: Dataset encoders generate code that must see the constructors
  case class In(id: Long, epoch_day: Long, cls: String)
  case class Out(id_person: Long, preg_endpoint: String,
      endpoint_date: Date, preg_episode_id: Int)

  /** Prenatal-window assignment over the placed timeline — STEP 6-7 of the
    * reference (load_stage.mcaid_claim_preg_episode.R:1384-1480): per
    * person, each placed endpoint gets
    *
    *   - `preg_episode_seq`: position on the person's merged timeline (the
    *     reference makes a GLOBAL dense_rank id here; per SURVEY §2 row 49
    *     the scale-safe identity is the composite (person, seq) — no
    *     global total order);
    *   - `preg_start_date`: endpoint date minus the class's default
    *     gestation (lb/sb/deliv 301 d, tro 112, ect 84, ab 168, sa 133),
    *     clipped to the PRIOR pregnancy endpoint plus a buffer (28 d after
    *     a birth-class endpoint, 14 d after an early-loss class) when the
    *     prior endpoint is closer than the default gestation;
    *   - `preg_start_date_max` / `preg_start_date_min`: the earliest /
    *     latest plausible start (:1464-1477; min is -154/-140/-42/-28 by
    *     class) used by the later gestational-age correction steps.
    *
    * Ties (two classes placed the same day, which the conflict filter's
    * strict windows allow) are ordered by class name so the lag is
    * deterministic — the reference's ORDER BY date alone leaves this
    * undefined.
    *
    * One person-partitioned window pass; no shuffle beyond it. */
  def withPrenatalWindows(placed: DataFrame, idCol: String = "id_person",
      dateCol: String = "endpoint_date",
      classCol: String = "preg_endpoint"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col(idCol)).orderBy(col(dateCol), col(classCol))
    val priorDate = lag(col(dateCol), 1).over(w)
    val priorCls = lag(col(classCol), 1).over(w)
    val daysDiff = datediff(col(dateCol), priorDate)
    val buffer = when(priorCls.isin("lb", "sb", "deliv"), 28)
      .when(priorCls.isin("tro", "ect", "ab", "sa"), 14)
    val defGest = when(col(classCol).isin("lb", "sb", "deliv"), 301)
      .when(col(classCol) === "tro", 112)
      .when(col(classCol) === "ect", 84)
      .when(col(classCol) === "ab", 168)
      .when(col(classCol) === "sa", 133)
    val minGest = when(col(classCol) === "lb", 154)
      .when(col(classCol).isin("sb", "deliv"), 140)
      .when(col(classCol).isin("tro", "ect", "ab"), 42)
      .when(col(classCol) === "sa", 28)
    placed
      .withColumn("preg_episode_seq",
        row_number().over(w))
      .withColumn("preg_end_date", col(dateCol))
      .withColumn("preg_start_date",
        when(daysDiff.isNull || daysDiff >= defGest,
          date_add(col(dateCol), -defGest))
          .otherwise(date_add(col(dateCol), -daysDiff + buffer)))
      .withColumn("preg_start_date_max", date_add(col(dateCol), -defGest))
      .withColumn("preg_start_date_min", date_add(col(dateCol), -minGest))
  }

  /** @param endpoints one row per (person, endpoint class, service day)
    *                  — duplicates are collapsed
    * @param idCol     person id (castable to long)
    * @param dateCol   endpoint service date
    * @param classCol  endpoint class name column
    */
  def build(endpoints: DataFrame, idCol: String, dateCol: String,
      classCol: String,
      hierarchy: Seq[EndpointClass] = McaidHierarchy): DataFrame = {
    val s = endpoints.sparkSession
    import s.implicits._
    // epoch days inside the group: calendar-safe date arithmetic without
    // timezone-dependent java.sql.Date math
    val ds: Dataset[In] = endpoints
      .select(col(idCol).cast("long").as("id"),
        datediff(col(dateCol), to_date(lit("1970-01-01"))).cast("long")
          .as("epoch_day"),
        col(classCol).as("cls"))
      .distinct()
      .as[In]
    val classes = hierarchy // serializable local
    ds.groupByKey(_.id)
      .flatMapGroups { (pid, it) =>
        val byClass = it.toArray.groupBy(_.cls)
        val placed = scala.collection.mutable.Map.empty[String, Array[Long]]
        val out = scala.collection.mutable.ArrayBuffer.empty[Out]
        classes.zipWithIndex.foreach { case (cls, k) =>
          val higher = classes.take(k)
          val cand = byClass.getOrElse(cls.name, Array.empty)
            .map(_.epoch_day).sorted
          val survivors = cand.filter { d =>
            higher.forall { h =>
              placed.getOrElse(h.name, Array.empty).forall { p =>
                !(p < d && d - p <= h.windowDays) &&
                !(p > d && p - d <= h.windowDays)
              }
            }
          }
          // greedy cumulative-gap admission (WHILE-loop semantics: cum
          // accumulates across skipped endpoints and resets on admission)
          var cum = 0L
          var prev = Long.MinValue
          val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
          survivors.foreach { d =>
            if (prev == Long.MinValue) { admitted += d; cum = 0L }
            else {
              val diff = d - prev
              if (cum + diff > cls.windowDays) { admitted += d; cum = 0L }
              else cum += diff
            }
            prev = d
          }
          placed(cls.name) = admitted.toArray
          admitted.zipWithIndex.foreach { case (d, i) =>
            out += Out(pid, cls.name, Date.valueOf(
              java.time.LocalDate.ofEpochDay(d)), i + 1)
          }
        }
        out.iterator
      }
      .toDF()
  }
}
