package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Intervals, WeightedMode}
import graft.functions.DateFns
import graft.queries.Q.t

/** Window-function and temporal-kernel catalog: lag/lead gaps,
  * gaps-and-islands, rolling frames, episode grouping, modal picks —
  * the reference's person-period machinery (SURVEY.md §2.5) exercised on
  * the driver testdata.
  */
object WindowQueries {

  /** §2.4 mode with deterministic tie-break (most-reported DOB —
    * load_stage.mcaid_elig_demo.R:93-118): modal event_type per user,
    * rolled up to users per winning type. */
  def q13Mode(s: SparkSession, dir: String): DataFrame =
    WeightedMode.mode(t(s, dir, "events"), Seq("user_id"), "event_type", "modal_type")
      .groupBy(col("modal_type"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("modal_type"))

  /** §2.4 coverage-weighted mode (timevar_gen_sql — claims_elig.R:788-881):
    * per user the event_type carrying the most total value, tie -> type asc. */
  def q14WeightedMode(s: SparkSession, dir: String): DataFrame =
    WeightedMode.weightedMode(t(s, dir, "events"),
      Seq("user_id"), "event_type", "value", "weighted_type")
      .orderBy(col("user_id"))

  /** §2.10 the same weighted mode through the single-shuffle typed
    * Aggregator (UDAF surface) — one partial-aggregatable exchange, no
    * window pass; must agree with q14 exactly (same oracle). */
  def q73WeightedModeAgg(s: SparkSession, dir: String): DataFrame =
    graft.core.WeightedModeAgg.weightedMode(t(s, dir, "events"),
      Seq("user_id"), "event_type", "value", "weighted_type")
      .orderBy(col("user_id"))

  /** §2.5 LAG gap computation (pre_gap/post_gap — claims_elig.R:715-733):
    * day gaps between consecutive orders per customer. */
  def q21LagGaps(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("gap", datediff(col("o_orderdate"),
        lag(col("o_orderdate"), 1).over(w)))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        max(col("gap")).as("max_gap"),
        round(avg(col("gap")), 4).as("avg_gap"))
      .filter(col("n_orders") >= 2)
      .orderBy(col("o_custkey"))
  }

  /** §2.5 gaps-and-islands A (3-step lag/flag/running-sum —
    * load_stage.mcaid_elig_timevar.R:287-385): 30-minute sessionization of
    * the event stream; sessions per user. */
  def q22Sessions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isStart = when(lag(col("ts"), 1).over(w).isNull ||
      unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)) > 1800, 1)
      .otherwise(0)
    t(s, dir, "events")
      .withColumn("session_id", sum(isStart).over(run))
      .groupBy(col("user_id"))
      .agg(max(col("session_id")).as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** §2.5 rolling frame (12-month rolling flags —
    * sp_mcaid_perf_enroll_denom.sql:52-71): 3-month rolling revenue per
    * market segment. */
  def q23Rolling(s: SparkSession, dir: String): DataFrame = {
    val monthly = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"),
        to_date(date_trunc("MONTH", col("o_orderdate"))).as("month"))
      .agg(sum(col("o_totalprice")).as("rev"))
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("month"))
      .rowsBetween(-2, 0)
    monthly
      .select(col("c_mktsegment"), col("month"),
        round(col("rev"), 2).as("rev"),
        round(sum(col("rev")).over(w), 2).as("rev_3m"))
      .orderBy(col("c_mktsegment"), col("month"))
  }

  /** §2.5 frame-bounded running fill (elig_timevar_collapse.R:256-261):
    * running order count and spend per customer. */
  def q24RunningFill(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        count(lit(1)).over(w).as("order_seq"),
        round(sum(col("o_totalprice")).over(w), 2).as("spend_to_date"),
        min(col("o_orderdate")).over(w).cast("date").as("first_order_date"))
      .orderBy(col("o_custkey"), col("order_seq"))
  }

  /** §2.5 ranked selection within a group (first e-code —
    * claim_header.R:601-614): highest-value line per order, summed by flag. */
  def q25RankSelect(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_extendedprice").desc, col("l_linenumber"))
    t(s, dir, "lineitem")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_top_lines"),
        round(sum(col("l_extendedprice")), 2).as("sum_top_price"))
      .orderBy(col("l_returnflag"))
  }

  /** §2.5 episode construction + global event ids WITHOUT the reference's
    * unpartitioned DENSE_RANK (claim_header.R:814-893, SURVEY §7.5.1):
    * 1-hour episode merge per user; globally-unique episode keys are
    * (user_id, episode_seq) composites — distinct-count semantics preserved,
    * no single-partition window. */
  def q26Episodes(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isStart = when(lag(col("ts"), 1).over(w).isNull ||
      unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)) > 3600, 1)
      .otherwise(0)
    t(s, dir, "events")
      .withColumn("episode_seq", sum(isStart).over(run))
      .groupBy(col("event_type"))
      .agg(countDistinct(concat_ws("#", col("user_id"), col("episode_seq")))
        .as("n_episodes"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))
  }

  /** §2.8 date scalar functions with T-SQL semantics (SURVEY §7.5.4):
    * yyyymm keys, month-end, boundary-count month diff. */
  def q29ScalarDates(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(DateFns.dateToYyyymm(col("o_orderdate")).as("yyyymm"),
        DateFns.monthEnd(col("o_orderdate")).cast("date").as("month_end"),
        DateFns.datediffMonth(col("o_orderdate"), to_date(lit("1998-01-01")))
          .as("months_to_1998"))
      .groupBy(col("yyyymm"), col("month_end"), col("months_to_1998"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("yyyymm"))

  /** §2.8 string scalar functions: zero-pad (ICD-9 pad idiom —
    * icdcm_header.R:76-88), substring, upper, regexp_replace, length. */
  def q30ScalarStrings(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_brand"),
        lpad(col("p_size").cast("string"), 5, "0").as("size_pad"),
        upper(substring(col("p_type"), 1, 8)).as("type_prefix"),
        length(regexp_replace(col("p_name"), "[aeiou]", "")).as("consonants"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        min(col("size_pad")).as("min_size_pad"),
        max(col("type_prefix")).as("max_type_prefix"),
        sum(col("consonants")).as("sum_consonants"))
      .orderBy(col("p_brand"))

  /** §2.8 reshape: wide->long unpivot via stack (13-dx-slot UNPIVOT —
    * icdcm_header.R:102-127). */
  def q31Unpivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_returnflag"), expr(
        """stack(4,
           'quantity', l_quantity,
           'extendedprice', l_extendedprice,
           'discount', l_discount,
           'tax', l_tax) as (measure, val)"""))
      .groupBy(col("l_returnflag"), col("measure"))
      .agg(round(sum(col("val")), 2).as("total"))
      .orderBy(col("l_returnflag"), col("measure"))

  /** §2.8 CASE bucketing (age-band idiom) + conditional counts. */
  def q32CaseBucket(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .withColumn("bal_band",
        when(col("c_acctbal") < 0, "negative")
          .when(col("c_acctbal") < 3000, "low")
          .when(col("c_acctbal") < 7000, "mid")
          .otherwise("high"))
      .groupBy(col("bal_band"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("c_acctbal")), 4).as("avg_bal"))
      .orderBy(col("bal_band"))

  /** §2.5/§1.1 the elig_timevar kernel end-to-end: distinct active days ->
    * collapse to contiguous intervals (maxGap=1) -> per-user interval stats.
    * This is Intervals.collapseIntervals, the engine's temporal core. */
  def q47IntervalCollapse(s: SparkSession, dir: String): DataFrame = {
    val days = t(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .withColumn("day_to", col("day"))
    val collapsed = Intervals.collapseIntervals(days,
      ids = Seq("user_id"), from = "day", to = "day_to", maxGapDays = 1)
    collapsed
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(datediff(col("day_to"), col("day")) + 1).as("active_days"),
        min(col("day")).as("first_day"),
        max(col("day_to")).as("last_day"))
      .orderBy(col("user_id"))
  }

  /** §2.4 coverage-days-in-window clipping (apcd_elig_plr.R:42-120 CASE x4
    * -> one clipDays expression): active days falling in Jan 2024. */
  def q48ClipDays(s: SparkSession, dir: String): DataFrame = {
    val days = t(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .withColumn("day_to", col("day"))
    val collapsed = Intervals.collapseIntervals(days,
      ids = Seq("user_id"), from = "day", to = "day_to", maxGapDays = 1)
    collapsed
      .groupBy(col("user_id"))
      .agg(sum(Intervals.clipDays(col("day"), col("day_to"),
        to_date(lit("2024-01-01")), to_date(lit("2024-01-31")))).as("days_in_jan"))
      .filter(col("days_in_jan") > 0)
      .orderBy(col("user_id"))
  }

  /** Markov transition matrix of the event stream (q273): per user in
    * (ts, event_id) order, consecutive event-type pairs counted into
    * the 5x5 transition matrix with per-source-state fixed-point
    * probabilities — the session-journey model behind next-action
    * prediction and anomaly scoring. Ordering is on MICROSECOND
    * epochs (the engine's timestamp read convention) with the unique
    * event_id as tie-break, so the lag chain is deterministic
    * cross-engine. ONE user-partitioned window, then a matrix-sized
    * rollup — at 100 TB the only exchange is the user hash. */
  def q273EventTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tsu"), col("event_id"))
    val tr = t(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tsu"), col("event_id"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
    val cnt = tr
      .groupBy(col("prev").as("from_type"),
        col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy(col("from_type")).agg(sum(col("n")).as("tot"))
    cnt.join(tot, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("n * 1000000 div tot").as("prob_fp"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Ordered funnel conversion (q274): view -> click -> purchase, each
    * step's earliest qualifying time strictly after the previous
    * step's — the product-analytics staple. Three user-grain
    * aggregations chained by equi-joins (never a window over the raw
    * stream), folded to one row of totals and stacked into step rows
    * with id-sum membership pins and fixed-point step-to-step
    * conversion. */
  def q274Funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("user_id"),
      col("event_type"), unix_micros(col("ts")).as("tsu"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("tsu")).as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id")).filter(col("tsu") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("tsu")).as("t2"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id")).filter(col("tsu") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("tsu")).as("t3"))
    val a = v.agg(count(lit(1)).as("n1"), sum(col("user_id")).as("s1"))
    val b = c.agg(count(lit(1)).as("n2"), sum(col("user_id")).as("s2"))
    val d = p.agg(count(lit(1)).as("n3"), sum(col("user_id")).as("s3"))
    a.crossJoin(broadcast(b)).crossJoin(broadcast(d))
      .select(expr(
        """stack(3,
           '1_view', n1, s1, cast(1000000 as bigint),
           '2_click', n2, s2,
             case when n1 = 0 then null else n2 * 1000000 div n1 end,
           '3_purchase', n3, s3,
             case when n2 = 0 then null else n3 * 1000000 div n2 end)
           as (step, n_users, id_sum, conv_from_prev_fp)"""))
      .orderBy(col("step"))
  }
}
