package graft

import graft.queries.{RelationalQueries => R}

/** Physical-plan contracts: the at-scale properties the engine is designed
  * around, pinned so a regression (lost pushdown, dropped broadcast, a
  * global window sneaking back in) fails the build — not just the bench.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q02 predicates push down to the parquet scan") {
    val p = plan(R.q2FilterPred(spark, sf))
    assert(p.contains("PushedFilters:"), "no pushed filters section")
    assert(p.contains("IsNotNull(o_orderstatus)") ||
      p.contains("EqualTo(o_orderstatus"), s"status filter not pushed:\n$p")
  }

  test("q03 joins the dims via broadcast, not shuffle") {
    val p = plan(R.q3JoinInner(spark, sf))
    assert(p.contains("BroadcastHashJoin"), "nation dim not broadcast")
  }

  test("q01 scan prunes to the referenced columns only") {
    val p = plan(R.q1Agg(spark, sf))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_quantity") && !readSchema.contains("l_comment")
      && !readSchema.contains("l_suppkey"),
      s"column pruning lost: $readSchema")
  }

  test("q15 top-N plans TakeOrderedAndProject, no global-window exchange") {
    val p = plan(R.q15TopN(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), s"two-phase top-N lost:\n$p")
  }

  test("no unpartitioned windows anywhere in the catalog") {
    // WindowExec warns 'No Partition Defined' when partitionSpec is empty;
    // statically: every Window node must carry a partition spec. The lit(0)
    // constant partitions (bounded post-limit ranks) count as partitioned.
    val offenders = SparkEntry.queries.keys.filterNot { name =>
      // streaming + write-path queries spin up real jobs; plan-only here
      Set("q48_stream_hourly", "q57_config_csv_orc", "q58_incremental_refresh",
        "q59_qa_suite")(name)
    }.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      val bad = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => name
      }
      bad.headOption
    }
    assert(offenders.isEmpty, s"unpartitioned windows in: $offenders")
  }
}
