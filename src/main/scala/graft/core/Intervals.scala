package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra: the temporal kernel of the engine.
  *
  * Re-expresses the reference's person-period machinery
  * (claims_db/phclaims/stage/tables/load_stage.mcaid_elig_timevar.R:282-417,
  * load_stage.apcd_elig_timevar.R:78-98, R/elig_timevar_collapse.R:251-283)
  * as reusable window/groupBy helpers.
  *
  * Scale notes: every helper partitions windows by the entity id columns, so
  * work distributes across executors with no global ordering. Rows per entity
  * are small and bounded (months x attributes), so per-partition sorts are
  * cheap and skew-free.
  */
object Intervals {

  /** True when [f1,t1] overlaps [f2,t2] (inclusive bounds). */
  def overlaps(f1: Column, t1: Column, f2: Column, t2: Column): Column =
    f1 <= t2 && t1 >= f2

  /** Days of [from,to] that fall inside [winFrom,winTo]; 0 when disjoint.
    * One expression replaces the reference's 4-branch CASE repeated ~12x
    * (load_stage.apcd_elig_plr.R:42-120, R/claims_elig.R:705-714). */
  def clipDays(from: Column, to: Column, winFrom: Column, winTo: Column): Column =
    when(overlaps(from, to, winFrom, winTo),
      datediff(least(to, winTo), greatest(from, winFrom)) + lit(1))
      .otherwise(lit(0))

  /** Assigns an `island_id` to each row such that rows of the same entity
    * whose [from,to] intervals are within `maxGapDays` of the previous
    * interval (and agree on `attrs`) share an id.
    *
    * 3-step lag/flag/running-sum formulation
    * (load_stage.mcaid_elig_timevar.R:287-385): lag the previous to-date,
    * flag island starts, running-sum the flags.
    */
  def islandIds(
      df: DataFrame,
      ids: Seq[String],
      from: String,
      to: String,
      maxGapDays: Int = 1,
      attrs: Seq[String] = Nil,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val part = (ids ++ attrs).map(col)
    val w = Window.partitionBy(part: _*)
      .orderBy(col(from) +: col(to) +: tieBreak.map(col): _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevTo = lag(col(to), 1).over(w)
    val isStart = when(prevTo.isNull || datediff(col(from), prevTo) > maxGapDays, 1)
      .otherwise(0)
    df.withColumn("island_id", sum(isStart).over(run))
  }

  /** [[islandIds]] with the gap measured against the RUNNING MAX of all
    * preceding to-dates instead of lag(to). The lag formulation (which
    * mirrors the reference's elig_timevar/direct-transfer SQL exactly)
    * mis-splits when a long interval fully contains a later-sorted short
    * one: the row after the nested interval compares against the SHORT
    * one's end and opens a new island inside the long interval's extent.
    * Running-max chaining keeps anything starting within `maxGapDays` of
    * the episode's extent in the episode — the semantically-correct
    * transfer chain. Use this where intervals can nest (inpatient stays);
    * keep [[islandIds]] where rows are guaranteed non-overlapping
    * (month-grain eligibility) or reference-exact splits are wanted. */
  def islandIdsByExtent(
      df: DataFrame,
      ids: Seq[String],
      from: String,
      to: String,
      maxGapDays: Int = 1,
      attrs: Seq[String] = Nil,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val part = (ids ++ attrs).map(col)
    val w = Window.partitionBy(part: _*)
      .orderBy(col(from) +: col(to) +: tieBreak.map(col): _*)
    val prevExtent = max(col(to))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val isStart =
      when(prevExtent.isNull || datediff(col(from), prevExtent) > maxGapDays, 1)
        .otherwise(0)
    df.withColumn("island_id", sum(isStart)
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Arithmetic gaps-and-islands over a dense integer step column (e.g. a
    * yyyymm month index): island key = step - row_number, constant within a
    * contiguous run (load_stage.apcd_elig_timevar.R:81-84). Cheaper than
    * [[islandIds]] (no lag pass) when the step is truly unit-dense. */
  def islandKeyByStep(df: DataFrame, ids: Seq[String], step: String,
      attrs: Seq[String] = Nil): DataFrame = {
    val part = (ids ++ attrs).map(col)
    val w = Window.partitionBy(part: _*).orderBy(col(step))
    df.withColumn("island_id", col(step) - row_number().over(w))
  }

  /** Collapses rows sharing (ids, attrs, island_id) to one interval row with
    * min(from)/max(to) (load_stage.mcaid_elig_timevar.R:375-385). Input must
    * already carry `island_id` (from [[islandIds]]/[[islandKeyByStep]]). */
  def collapse(df: DataFrame, ids: Seq[String], from: String, to: String,
      attrs: Seq[String] = Nil): DataFrame = {
    val keys = ids ++ attrs :+ "island_id"
    df.groupBy(keys.map(col): _*)
      .agg(min(col(from)).as(from), max(col(to)).as(to))
      .drop("island_id")
  }

  /** Full collapse pipeline: islands then min/max, preserving attribute
    * columns. Equivalent to the reference's generic collapse
    * (R/elig_timevar_collapse.R). */
  def collapseIntervals(df: DataFrame, ids: Seq[String], from: String,
      to: String, maxGapDays: Int = 1, attrs: Seq[String] = Nil): DataFrame =
    collapse(islandIds(df, ids, from, to, maxGapDays, attrs), ids, from, to, attrs)

  /** The generic elig_timevar_collapse R-API entry point
    * (R/elig_timevar_collapse.R:58-283): the caller picks which
    * time-varying columns survive; rows adjacent within the gap tolerance
    * that agree on them merge into one interval; `cov_time_day` is
    * recomputed over the merged span (the R default); an optional id list
    * restricts the pull before any shuffle (the reference's `ids`
    * parameter pushes the same filter into its extraction query). The id
    * list becomes an IN predicate pushed to the scan — right for the
    * ad-hoc cohorts the R API serves; for million-id cohorts join a
    * cohort frame instead.
    *
    * The R kernel's group_num/group_num2/group_num3 three-window dance is
    * exactly the lag/flag/running-sum island labeling of [[islandIds]]
    * partitioned by (id, chosen vars) — monotone island labels differ,
    * groups do not. */
  def collapseTimevar(
      timevar: DataFrame,
      idCol: String,
      from: String,
      to: String,
      vars: Seq[String],
      ids: Option[Seq[Any]] = None,
      covTimeDay: Boolean = true,
      maxGapDays: Int = 1): DataFrame = {
    require(vars.nonEmpty, "choose at least one column to collapse over")
    val base0 = timevar.select((idCol +: from +: to +: vars).map(col): _*)
    val base = ids match {
      case Some(l) => base0.filter(col(idCol).isin(l: _*))
      case None => base0
    }
    val out = collapseIntervals(base, Seq(idCol), from, to, maxGapDays, vars)
    if (covTimeDay)
      out.withColumn("cov_time_day", datediff(col(to), col(from)) + lit(1))
    else out
  }

  /** Two-source interval overlay via sweep-line segmentation: partitions
    * each entity's timeline into elementary segments at every interval
    * boundary of EITHER source, then labels each segment with the
    * attribute columns of its covering interval from each side (null when
    * that side doesn't cover it). Segments covered by neither side are
    * dropped.
    *
    * Re-expresses the reference's dual mcaid/mcare timeline merge
    * (load_stage.mcaid_mcare_elig_timevar.R:98-340): the reference takes
    * a per-person cartesian of the two interval sets, classifies 8
    * pairwise overlap types, expands each pair to up to 3 rows, then
    * repairs the result with ~10 lag/lead drop-and-truncate rules. The
    * reference itself validated that machinery against the "guaranteed
    * accurate" per-day expansion (:100-105); boundary-point segmentation
    * IS that per-day semantics computed at change points only, so it
    * needs none of the repair rules.
    *
    * Segments are elementary (no interval boundary strictly inside one),
    * so "segment ⊆ interval" reduces to "segment start ∈ interval" — each
    * side attaches with one equi-join on the id plus a range residual.
    *
    * Requires intervals within each side to be non-overlapping per id
    * (true for collapsed timevar tables; enforce upstream with
    * [[collapseIntervals]] or a per-(id,from,to) dedup) and attribute
    * column names disjoint between the sides (pre-rename collisions, as
    * the reference does with geo_zip → geo_zip_mcare).
    *
    * Scale: one shuffle for the boundary distinct (reused by the lead()
    * window — same id hash), then two joins co-keyed on the id; per-id
    * row counts are bounded (eligibility spans), so the range residual
    * never fans out.
    */
  def overlaySegments(left: DataFrame, right: DataFrame, idCol: String,
      from: String, to: String): DataFrame = {
    val lAttrs = left.columns.filterNot(Seq(idCol, from, to).contains)
    val rAttrs = right.columns.filterNot(Seq(idCol, from, to).contains)
    val clash = lAttrs.intersect(rAttrs)
    require(clash.isEmpty, s"attribute columns collide: ${clash.mkString(",")}")
    def bounds(df: DataFrame) =
      df.select(col(idCol), col(from).as("_pt"))
        .unionAll(df.select(col(idCol), date_add(col(to), 1).as("_pt")))
    val pts = bounds(left).unionAll(bounds(right)).distinct()
    val w = Window.partitionBy(col(idCol)).orderBy(col("_pt"))
    val segs = pts
      .withColumn("_next", lead(col("_pt"), 1).over(w))
      .filter(col("_next").isNotNull)
      .select(col(idCol), col("_pt").as(from),
        date_add(col("_next"), -1).as(to))
    def attach(acc: DataFrame, side: DataFrame, tag: String): DataFrame = {
      val s = side.withColumnRenamed(idCol, s"_id_$tag")
        .withColumnRenamed(from, s"_f_$tag")
        .withColumnRenamed(to, s"_t_$tag")
      acc.join(s, acc(idCol) === s(s"_id_$tag") &&
          acc(from) >= s(s"_f_$tag") && acc(from) <= s(s"_t_$tag"), "left")
        .drop(s"_id_$tag")
    }
    val both = attach(attach(segs, left, "l"), right, "r")
    both
      .filter(col("_f_l").isNotNull || col("_f_r").isNotNull)
      .drop("_f_l", "_t_l", "_f_r", "_t_r")
  }

  /** Pre/post coverage-gap columns via lag/lead
    * (R/claims_elig.R:715-733). Adds `pre_gap`/`post_gap` day counts
    * (null -> 0 at the person's first/last interval). */
  def gapDays(df: DataFrame, ids: Seq[String], from: String, to: String): DataFrame = {
    val w = Window.partitionBy(ids.map(col): _*).orderBy(col(from), col(to))
    df.withColumn("pre_gap",
        coalesce(datediff(col(from), lag(col(to), 1).over(w)) - lit(1), lit(0)))
      .withColumn("post_gap",
        coalesce(datediff(lead(col(from), 1).over(w), col(to)) - lit(1), lit(0)))
  }
}
