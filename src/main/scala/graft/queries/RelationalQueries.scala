package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{Predicates, Tabloop}
import graft.queries.Q.t

/** Relational operator catalog: scans, predicate assembly, every join kind,
  * aggregation patterns, set ops, scalar functions — each the Spark-first
  * re-expression of a reference operator (SURVEY.md §2 citations inline).
  * Each query is paired with DuckDB oracle SQL in [[graft.SparkEntry]].
  */
object RelationalQueries {

  /** §2.4 hash group-by with sum/avg/count(+distinct) — TPC-H Q1 shape.
    * Partial aggregation (map-side combine) keeps the shuffle tiny. */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        count(lit(1)).as("count_order"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** §2.2 parameter-driven predicate assembly (claims_elig.R:441-523):
    * equality + IN + range + case-insensitive IN, all pushed to the scan. */
  def q2FilterPred(s: SparkSession, dir: String): DataFrame = {
    val filtered = Predicates.applyAll(t(s, dir, "orders"),
      Predicates.eqOpt("o_orderstatus", Some("O")),
      Predicates.inOptCI("o_orderpriority", Some(Seq("1-urgent", "2-high"))),
      Predicates.geOpt("o_totalprice", Some(1000.0)),
      Predicates.leOpt("o_orderdate", Some("1997-12-31")))
    filtered
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"), col("o_orderpriority"))
      .orderBy(col("o_orderkey"))
  }

  /** §2.3 inner equi-joins with broadcast dims: revenue per nation.
    * nation/region are broadcast (no shuffle of the fact side beyond the
    * orders join, which AQE plans as sort-merge on orderkey). */
  def q3JoinInner(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("n_name"))
  }

  /** §2.3 left outer join preserving zero-order customers
    * (header<-line flag joins, elig<-geocode). */
  def q4JoinLeft(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("spend"))
      .orderBy(col("c_custkey"))

  /** §2.3 semi join (claim_header_id IN (SELECT ...) —
    * load_stage.mcaid_claim_header.R:750-768). */
  def q5JoinSemi(s: SparkSession, dir: String): DataFrame = {
    val deepDisc = t(s, dir, "lineitem").filter(col("l_discount") > 0.05)
      .select(col("l_orderkey"))
    t(s, dir, "orders")
      .join(deepDisc, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("o_orderstatus"))
  }

  /** §2.3 anti join (CCW exclusion LEFT JOIN ... IS NULL — load_ccw.R:411-434). */
  def q6JoinAnti(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers_no_orders"))
      .orderBy(col("c_nationkey"))

  /** §2.3 full outer join + coalesced keys (OUD diag FULL JOIN rx —
    * claim_bh.R:232-309): per-nation customer count vs supplier count. */
  def q7JoinFull(s: SparkSession, dir: String): DataFrame = {
    val cn = t(s, dir, "customer").groupBy(col("c_nationkey").as("nk_c"))
      .agg(count(lit(1)).as("n_cust"))
    val sn = t(s, dir, "supplier").groupBy(col("s_nationkey").as("nk_s"))
      .agg(count(lit(1)).as("n_supp"))
    cn.join(sn, col("nk_c") === col("nk_s"), "full")
      .select(coalesce(col("nk_c"), col("nk_s")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  /** §2.3 range join with an equi anchor (per-person individualized date
    * windows — top_causes.R:173-179): lines shipped within 30 days of their
    * order's date. Equi key keeps it a shuffled hash/sort-merge join; the
    * range predicate is a post-join filter, never a cross product. */
  def q8JoinRange(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    li.join(o, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") >= col("o_orderdate") &&
        col("l_shipdate") <= date_add(col("o_orderdate"), 30))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_lines_shipped_30d"),
        round(sum(col("l_extendedprice")), 2).as("value_shipped_30d"))
      .orderBy(col("o_orderstatus"))
  }

  /** §2.3 theta join on LIKE prefix (icdcm_norm LIKE ref.icdcm+'%' —
    * load_stage.mcaid_claim_header.R:556-579). The prefix dim is tiny ->
    * BroadcastNestedLoopJoin, bounded work per row. */
  def q9JoinThetaPrefix(s: SparkSession, dir: String): DataFrame = {
    val part = t(s, dir, "part")
    val prefixes = part.select(substring(col("p_type"), 1, 6).as("prefix")).distinct()
    part.join(broadcast(prefixes), col("p_type").startsWith(col("prefix")))
      .groupBy(col("prefix"))
      .agg(count(lit(1)).as("n_parts"), round(avg(col("p_retailprice")), 4).as("avg_price"))
      .orderBy(col("prefix"))
  }

  /** §2.3 cross join month spine + zero-fill (member universe x months —
    * create_stage.sp_perf_measures.sql:89): 1996 order counts per
    * (mktsegment, month), zero months included. */
  def q10CrossSpine(s: SparkSession, dir: String): DataFrame = {
    val segs = t(s, dir, "customer").select(col("c_mktsegment")).distinct()
    val months = s.range(1).select(explode(sequence(
      to_date(lit("1996-01-01")), to_date(lit("1996-12-01")),
      expr("interval 1 month"))).as("month"))
    val spine = segs.crossJoin(broadcast(months))
    val counts = t(s, dir, "orders")
      .filter(year(col("o_orderdate")) === 1996)
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"),
        to_date(date_trunc("MONTH", col("o_orderdate"))).as("month"))
      .agg(count(lit(1)).as("n_orders"))
    spine.join(counts, Seq("c_mktsegment", "month"), "left")
      .na.fill(0, Seq("n_orders"))
      .orderBy(col("c_mktsegment"), col("month"))
  }

  /** §2.4 conditional aggregation MAX(CASE WHEN) flag rollups
    * (load_stage.mcaid_claim_header.R:240-263). */
  def q11AggCond(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(
        max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("has_return"),
        max(when(col("l_discount") >= 0.08, 1).otherwise(0)).as("has_deep_discount"))
      .groupBy(col("has_return"), col("has_deep_discount"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("has_return"), col("has_deep_discount"))

  /** §2.4 exact COUNT(DISTINCT) (tabloop.R:179, QA key-distinctness). */
  def q12CountDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("n_suppliers"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy(col("l_returnflag"))

  /** §2.4 top-N with deterministic tie handling (top_causes.R:337-343).
    * Two-phase, scale-safe (VERDICT r2 #3): TakeOrderedAndProject prune +
    * bounded windowless rank — see [[graft.core.TopN.topNByRank]]. */
  def q15TopN(s: SparkSession, dir: String): DataFrame = {
    val totals = t(s, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
    graft.core.TopN.topNByRank(totals, "total_qty", "l_partkey", 10)
      .orderBy(col("rnk"))
  }

  /** §2.4 GREATEST/LEAST across columns (load_ccw.R:627-629). */
  def q16GreatestLeast(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_returnflag"),
        greatest(col("l_tax"), col("l_discount")).as("g"),
        least(col("l_tax"), col("l_discount")).as("l"))
      .groupBy(col("l_returnflag"))
      .agg(round(avg(col("g")), 6).as("avg_greatest"),
        round(avg(col("l")), 6).as("avg_least"))
      .orderBy(col("l_returnflag"))

  /** §2.4 mean/median/percentile (tabloop.R:413,491) — exact percentile
    * for oracle parity, as the survey prescribes. */
  def q17Median(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(round(avg(col("l_quantity")), 4).as("mean_qty"),
        round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"),
        round(expr("percentile(l_quantity, 0.9)"), 4).as("p90_qty"))
      .orderBy(col("l_returnflag"))

  /** §2.4 zero-filled tabulation (tabloop_f — R/tabloop.R): fixed
    * o_orderstatus x loop vars (priority, year). */
  def q18Tabloop(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .withColumn("o_year", year(col("o_orderdate")).cast("string"))
    Tabloop.tabloop(o,
      fixed = Seq("o_orderstatus"),
      loops = Seq("o_orderpriority", "o_year"),
      aggs = Seq(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("amt")),
      zeroFill = Seq("n", "amt"))
      .orderBy(col("o_orderstatus"), col("group_cat"), col("group_value"))
  }

  /** §2.4 small-cell suppression (helper_functions.R:143-175). */
  def q19Suppress(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "customer")
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
    Tabloop.suppress(counts, Seq("n"), lower = 1, upper = 5)
      .orderBy(col("c_nationkey"), col("c_mktsegment"))
  }

  /** §2.4 percent-of-group (cov_pct idiom — claims_elig.R:755-769) via a
    * window over the aggregate. */
  def q20PctOfGroup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .withColumn("pct", round(col("n") * 100.0 /
        sum(col("n")).over(Window.partitionBy(col("o_orderstatus"))), 4))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))
  }

  /** §2.7 set operations: EXCEPT / INTERSECT / UNION-distinct over customer
    * id sets (HEDIS EXCEPT — claim_header.R:321-354; FUA INTERSECT). */
  def q28SetOps(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val openCust = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    val bigCust = o.filter(col("o_totalprice") > 150000).select(col("o_custkey"))
    def counted(name: String, df: DataFrame): DataFrame =
      df.distinct().agg(lit(name).as("op"), count(lit(1)).as("n"))
    counted("except", openCust.except(bigCust))
      .unionByName(counted("intersect", openCust.intersect(bigCust)))
      .unionByName(counted("union", openCust.union(bigCust).distinct()))
      .orderBy(col("op"))
  }

  /** §2.7 UNION ALL with schema-drift NULL-padding
    * (load_table.R:408-429 year-table combine). */
  def q27UnionNullpad(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val y95 = o.filter(year(col("o_orderdate")) === 1995)
      .select(col("o_orderkey"), col("o_totalprice"))
    val y96 = o.filter(year(col("o_orderdate")) === 1996)
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderpriority")) // "new column" only in the later year-table
    y95.unionByName(y96, allowMissingColumns = true)
      .agg(count(lit(1)).as("n_rows"),
        count(col("o_orderpriority")).as("n_with_priority"),
        round(sum(col("o_totalprice")), 2).as("total"))
  }

  /** §2.4 at 100 TB the exact COUNT(DISTINCT)/exact-percentile paths have
    * sketch-based siblings: HyperLogLog++ (`approx_count_distinct`) and
    * KLL/GK quantiles (`percentile_approx`) aggregate in fixed memory with
    * map-side combine and no expand. The sketches are engine-specific, so
    * the oracle checks the EXACT columns by hash and the sketch columns as
    * within-tolerance BOOLEANS (the oracle expects `true`): a sketch
    * drifting out of its error bound fails the hash compare. */
  def q76ApproxSketches(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("n_exact"),
        approx_count_distinct(col("l_suppkey")).as("_hll"),
        expr("percentile(l_extendedprice, 0.5)").as("_med_exact"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
          .as("_med_approx"))
      .select(col("l_returnflag"), col("n_exact"),
        (abs(col("_hll") - col("n_exact")) <=
          col("n_exact") * 0.05).as("hll_ok"),
        round(col("_med_exact"), 2).as("median_exact"),
        (abs(col("_med_approx") - col("_med_exact")) <=
          col("_med_exact") * 0.01).as("quantile_ok"))
      .orderBy(col("l_returnflag"))
  }

  /** §2.1 incremental refresh kernel: archive WHERE date < cut UNION new
    * WHERE date >= cut (load_table.R:615-708,782-793). */
  def q33IncrementalMerge(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val cut = lit("1997-01-01")
    val archive = o.filter(col("o_orderdate") < cut)
    val fresh = o.filter(col("o_orderdate") >= cut)
    archive.unionByName(fresh)
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("yr"))
  }

  /** §2.8 semi-structured column extraction (q117): a JSON properties
    * column parsed with a declared schema (Catalyst JsonToStructs — a
    * codegen-adjacent expression, no UDF, prunable to the one requested
    * field) and aggregated per event type. The 100-TB point: the schema
    * is DECLARED, so the scan never runs schema inference over the
    * corpus, and extraction stays inside whole-stage codegen. */
  def q117JsonExtract(s: SparkSession, dir: String): DataFrame =
    Q.t(s, dir, "events")
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        round(avg(col("k")), 4).as("avg_k"),
        sum(when(col("k").isNull, 1).otherwise(0)).as("n_null_k"))
      .orderBy(col("event_type"))
}
