package graft.builds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.DateFns

/** HEDIS-style performance-measure pipeline: the reference's
  * sp_mcaid_perf_enroll_denom (rolling-window enrollment denominator,
  * create_stage.sp_mcaid_perf_enroll_denom.sql:43-71) feeding a
  * per-measure dynamic dispatch (create_stage.sp_perf_measures.sql:44-239
  * — `IF @measure_name = ... BEGIN ... END` per measure, re-expressed as a
  * config-driven Scala loop over shared staging DataFrames).
  *
  * Scale shape: ONE member x month grid (cross join of the distinct-member
  * universe with the month spine — sp_perf_measures.sql:89), one shuffle to
  * attach monthly facts, then every measure reuses the same
  * person-partitioned rolling window — the staging reuse the reference gets
  * from its persisted perf_staging table.
  */
object PerfMeasures {

  /** One measure = a flag expression over the monthly fact columns plus
    * its rolling numerator window — the dispatch config. */
  case class MeasureDef(name: String, monthlyFlag: Column)

  def defaultMeasures: Seq[MeasureDef] = Seq(
    MeasureDef("order_any", (col("n_orders") > 0).cast("int")),
    MeasureDef("high_value", (col("max_price") > 150000.0).cast("int")))

  /** @param rollingMonths window width in months (12 in the reference;
    *                      parameterized for the short testdata spine)
    * @param denomMinMonths months-with-activity required in the window for
    *                       the member to count in the denominator
    * @param extraFacts    additional per-member monthly fact frames, each
    *                      (o_custkey, month, counts...) with the count
    *                      columns to zero-fill — how measure feeders like
    *                      [[FuaMeasure]] land on the staging grid (the
    *                      reference persists the same into perf_staging)
    * @param denomExclusion (o_custkey, month) member-months removed from
    *                      the denominator regardless of activity — the
    *                      [[HospiceMemberMonth]] hook
    *                      (v_mcaid_perf_hospice_member_month feeding the
    *                      measure denominators)
    */
  def run(orders: DataFrame, fromMonth: String, toMonth: String,
      rollingMonths: Int = 3, denomMinMonths: Int = 2,
      measures: Seq[MeasureDef] = defaultMeasures,
      extraFacts: Seq[(DataFrame, Seq[String])] = Seq.empty,
      denomExclusion: Option[DataFrame] = None): DataFrame = {
    val s = orders.sparkSession
    // member universe x month spine (perf_distinct_member CROSS JOIN)
    val members = orders.select(col("o_custkey")).distinct()
    val months = s.range(1).select(explode(sequence(
      to_date(lit(fromMonth)), to_date(lit(toMonth)),
      expr("interval 1 month"))).as("month"))
    val grid = members.crossJoin(broadcast(months))
    // monthly facts, zero-filled onto the grid so rolling frames stay dense
    val facts = orders
      .groupBy(col("o_custkey"),
        to_date(date_trunc("MONTH", col("o_orderdate"))).as("month"))
      .agg(count(lit(1)).as("n_orders"), max(col("o_totalprice")).as("max_price"))
    val staged0 = grid.join(facts, Seq("o_custkey", "month"), "left")
      .na.fill(0, Seq("n_orders")).na.fill(0.0, Seq("max_price"))
    val staged1 = extraFacts.foldLeft(staged0) { case (df, (ef, cols)) =>
      df.join(ef, Seq("o_custkey", "month"), "left").na.fill(0, cols)
    }
    // denominator exclusion months (hospice): a left join + null test, so
    // the exclusion frame never widens the grid
    val staged = denomExclusion match {
      case Some(ex) => staged1.join(
        ex.select(col("o_custkey"), col("month"), lit(1).as("_denom_excl"))
          .distinct(),
        Seq("o_custkey", "month"), "left")
      case None => staged1.withColumn("_denom_excl", lit(null).cast("int"))
    }
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("month"))
      .rowsBetween(-(rollingMonths - 1), 0)
    // enroll denominator: rolling months-with-activity >= threshold
    // (sp_mcaid_perf_enroll_denom.sql:52-71), minus excluded months
    val denom = staged
      .withColumn("active_months",
        sum((col("n_orders") > 0).cast("int")).over(w))
      .withColumn("in_denom",
        (col("active_months") >= denomMinMonths &&
          col("_denom_excl").isNull).cast("int"))
    // per-measure dispatch: every measure's rolling numerator rides the
    // SAME person-partitioned window pass (one WindowExec evaluating k+1
    // frames), and one month aggregation carries all measures — the
    // per-measure union runs over the tiny aggregated frame, never the
    // staging. A measures.map-over-staging formulation recomputes the
    // grid+facts+window pipeline per config (~31x for the reference set).
    val withNums = measures.foldLeft(denom) { (df, m) =>
      df.withColumn(s"_num_${m.name}",
        (sum(m.monthlyFlag).over(w) > 0 && col("in_denom") === 1).cast("int"))
    }
    val aggs = sum(col("in_denom")).as("n_denom") +:
      measures.map(m => sum(col(s"_num_${m.name}")).as(s"_n_${m.name}"))
    val byMonth = withNums.groupBy(col("month")).agg(aggs.head, aggs.tail: _*)
    // wide -> long via one explode-of-structs, NOT a union of per-measure
    // selects: union branches each re-plan the whole staging lineage (k x
    // the window pass in the printed plan, reuse left to the scheduler);
    // the unpivot keeps one lineage regardless of measure count. Column
    // API rather than a stack(...) SQL string so measure names never pass
    // through the SQL parser (quotes/backticks in a config name are data,
    // not syntax).
    val stacked = byMonth.select(col("month"), col("n_denom"),
      explode(array(measures.map(m =>
        struct(lit(m.name).as("measure"), col(s"_n_${m.name}").as("n_num"))): _*)).as("_m"))
      .select(col("month"), col("n_denom"),
        col("_m.measure").as("measure"), col("_m.n_num").as("n_num"))
    stacked.select(col("measure"),
      DateFns.dateToYyyymm(col("month")).as("ym"),
      col("n_denom"), col("n_num"),
      when(col("n_denom") > 0,
        round(col("n_num") * 100.0 / col("n_denom"), 2)).as("rate"))
  }
}
