package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-safe top-N with RANK semantics (top_causes.R:337-343 top_n), for
  * the (value desc, unique key asc) orderings the reference uses.
  *
  * Phase 1: `orderBy().limit(n)` — Spark plans TakeOrderedAndProject, a
  * per-partition top-n merge with no global sort and no single-partition
  * exchange. Because the ordering includes a unique key, rank is total and
  * the limit keeps exactly the RANK <= n set.
  *
  * Phase 2: rank the <= n survivors WITHOUT a window — an unpartitioned
  * window (even one keyed on a constant — the optimizer folds it away)
  * funnels through one task and trips WindowExec's 'No Partition Defined'
  * hazard. Instead: a broadcast self-join counting strict predecessors,
  * bounded at n^2 comparisons by construction.
  */
object TopN {

  def topNByRank(df: DataFrame, valueCol: String, keyCol: String, n: Int): DataFrame = {
    val pruned = df.orderBy(col(valueCol).desc, col(keyCol)).limit(n)
    val others = pruned.select(col(valueCol).as("_v2"), col(keyCol).as("_k2"))
    pruned
      .join(broadcast(others),
        col("_v2") > col(valueCol) ||
          (col("_v2") === col(valueCol) && col("_k2") < col(keyCol)),
        "left")
      .groupBy(pruned.columns.toIndexedSeq.map(col): _*)
      .agg((count(col("_k2")) + 1).cast("int").as("rnk"))
  }
}
