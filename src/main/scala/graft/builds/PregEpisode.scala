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

  /** One endpoint class: hierarchy position = position in the Seq.
    * `greedyGapDays` is the class's own greedy-spacing threshold;
    * `conflictWindows` gives the exclusion window this CANDIDATE class
    * observes around each higher placed class — the reference's windows
    * form a matrix, not one value per placed class (lb blocks sb/deliv at
    * 182 days but tro/ect/ab/sa at only 168; sb blocks deliv at 168 but
    * the early-loss classes at 154 — :321,477-480,651-656,843-850,
    * 1053-1062,1281-1292). */
  case class EndpointClass(name: String, greedyGapDays: Int,
      conflictWindows: Seq[(String, Int)] = Seq.empty)

  /** The reference's full 7-level hierarchy (STEP 5A-5G): live birth,
    * stillbirth, delivery-unspecified, trophoblastic, ectopic, abortion,
    * spontaneous abortion. */
  val McaidHierarchy: Seq[EndpointClass] = Seq(
    EndpointClass("lb", 182),
    EndpointClass("sb", 168, Seq("lb" -> 182)),
    EndpointClass("deliv", 168, Seq("lb" -> 182, "sb" -> 168)),
    EndpointClass("tro", 56,
      Seq("lb" -> 168, "sb" -> 154, "deliv" -> 154)),
    EndpointClass("ect", 56,
      Seq("lb" -> 168, "sb" -> 154, "deliv" -> 154, "tro" -> 56)),
    EndpointClass("ab", 56,
      Seq("lb" -> 168, "sb" -> 154, "deliv" -> 154, "tro" -> 56,
        "ect" -> 56)),
    EndpointClass("sa", 42,
      Seq("lb" -> 168, "sb" -> 154, "deliv" -> 154, "tro" -> 56,
        "ect" -> 56, "ab" -> 56)))

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
    * undefined. Note a faithfully-mirrored reference quirk: when the prior
    * placed endpoint is the same day (or closer than the buffer), the
    * clipped start lands AFTER the endpoint date — an inverted window the
    * reference also produces (dateadd(-days_diff + buffer)); downstream
    * BETWEEN windows simply never match for such episodes, which is how
    * the reference's correction steps behave too.
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

  /** Gestational-age correction — STEP 8A of the reference
    * (load_stage.mcaid_claim_preg_episode.R:1484-1545): episodes whose
    * prenatal window contains a dated anchor procedure (insemination /
    * embryo-transfer codes) get a corrected start date at
    * `procedure_date - offsetDays` (13 in the reference); when several
    * anchors hit one episode the one CLOSEST to the episode end wins
    * (rank ... desc = max). Corrected episodes then carry
    *
    *   - `ga_days` / `ga_weeks` (days inclusive, weeks to 1 decimal),
    *   - `valid_start_date`: corrected start inside the
    *     [start_date_max, start_date_min] plausibility bounds,
    *   - `valid_ga`: 0 for lb < 22 weeks, sb < 20 weeks, sa >= 20 weeks
    *     (:1525-1527), else 1,
    *   - `lb_type`: 'ftb' at >= 37 weeks, 'ptb' under (:1532-1533).
    *
    * Uncorrected episodes pass through with NULL correction columns.
    * Scale: the anchor set (6 rare codes) is a filtered sliver and
    * normally broadcasts; the correction is then ONE pass over episodes —
    * left-join the broadcast anchors, fold back with a (person, episode)
    * groupBy whose max() is the closest-to-end pick. The broadcast is
    * ADAPTIVE (same pattern as Dedup.contamination): a bounded
    * `limit(n+1).count()` probes the sliver size and falls back to a
    * plain shuffle join when it exceeds `maxBroadcastAnchors` — at true
    * statewide scale nothing assumes the anchor frame fits one executor.
    * Both paths share the identical join+groupBy lineage, so results
    * cannot diverge at the switch boundary. The alternative shape
    * (aggregate a corrected frame, join it back onto episodes) references
    * the episode lineage twice and re-runs the whole upstream placement
    * pipeline — visible as two MapGroups in the physical plan. */
  def gaCorrection(episodes: DataFrame, procedures: DataFrame,
      anchorCodes: Seq[String], offsetDays: Int = 13,
      maxBroadcastAnchors: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.functions._
    val procBase = procedures
      .filter(col("procedure_code").isin(anchorCodes: _*))
      .select(col("id_person"), col("procedure_date"))
    // bounded size probe: limit(n+1) caps the scan, never a full count
    // (clamp before +1 so Long.MaxValue callers can force the broadcast)
    val probeCap = math.min(maxBroadcastAnchors, Int.MaxValue - 2L) + 1
    val small =
      procBase.limit(probeCap.toInt).count() <= maxBroadcastAnchors
    val proc = if (small) broadcast(procBase) else procBase
    val hit = when(col("procedure_date")
        .between(col("preg_start_date"), col("preg_end_date")),
      date_add(col("procedure_date"), -offsetDays))
    val keys = Seq("id_person", "preg_episode_seq")
    val carried = episodes.columns.filterNot(keys.contains).toSeq
    val aggs = carried.map(c => first(col(c)).as(c)) :+
      max(hit).as("preg_start_date_correct")
    val gaDays =
      datediff(col("preg_end_date"), col("preg_start_date_correct")) + 1
    val gaWeeks = round(gaDays * lit(1.0) / 7, 1).cast("decimal(4,1)")
    episodes
      .join(proc, Seq("id_person"), "left")
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("ga_days", gaDays)
      .withColumn("ga_weeks", gaWeeks)
      .withColumn("valid_start_date",
        when(col("preg_start_date_correct").isNull, lit(null).cast("int"))
          .when(col("preg_start_date_correct").between(
            col("preg_start_date_max"), col("preg_start_date_min")), 1)
          .otherwise(0))
      .withColumn("valid_ga",
        when(col("preg_start_date_correct").isNull, lit(null).cast("int"))
          .when(col("preg_endpoint") === "lb" && col("ga_weeks") < 22, 0)
          .when(col("preg_endpoint") === "sb" && col("ga_weeks") < 20, 0)
          .when(col("preg_endpoint") === "sa" && col("ga_weeks") >= 20, 0)
          .otherwise(1))
      .withColumn("lb_type",
        when(col("preg_endpoint") === "lb" && col("ga_weeks") >= 37, "ftb")
          .when(col("preg_endpoint") === "lb" && col("ga_weeks") < 37, "ptb"))
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
        placeTimeline(byClass.view.mapValues(_.map(_.epoch_day)).toMap,
          classes)
          .map { case (clsName, d, ep) =>
            Out(pid, clsName, Date.valueOf(
              java.time.LocalDate.ofEpochDay(d)), ep)
          }
          .iterator
      }
      .toDF()
  }

  /** The pure per-person pass (one person's endpoint days per class →
    * placed (class, epoch day, per-class episode id) rows): conflict
    * filter against already-placed higher classes, greedy cumulative-gap
    * admission, per-class episode ranks. Factored out of the
    * flatMapGroups so property tests can exercise it without Spark. */
  def placeTimeline(byClass: Map[String, Array[Long]],
      classes: Seq[EndpointClass]): Seq[(String, Long, Int)] = {
    val placed = scala.collection.mutable.Map.empty[String, Array[Long]]
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Int)]
    classes.foreach { cls =>
      val cand = byClass.getOrElse(cls.name, Array.empty[Long]).sorted
      val survivors = cand.filter { d =>
        cls.conflictWindows.forall { case (higherName, window) =>
          placed.getOrElse(higherName, Array.empty[Long]).forall { p =>
            !(p < d && d - p <= window) &&
            !(p > d && p - d <= window)
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
          if (cum + diff > cls.greedyGapDays) { admitted += d; cum = 0L }
          else cum += diff
        }
        prev = d
      }
      placed(cls.name) = admitted.toArray
      admitted.zipWithIndex.foreach { case (d, i) =>
        out += ((cls.name, d, i + 1))
      }
    }
    out.toSeq
  }
}
