package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph measures beyond connected components
  * ([[Components]]): PageRank in PURE INTEGER arithmetic, so every
  * iteration is bit-reproducible on any engine — float PageRank depends
  * on per-node accumulation order, which no distributed engine pins.
  *
  * Formulation (damping d = 85/100, total mass S a large integer):
  *
  *   contrib(u)  = (r(u) * 85 div 100) div outdeg(u)      [per edge]
  *   dangling    = sum over outdeg-0 nodes of r(u)*85 div 100
  *   r'(v)       = (S * 15 div 100) div n
  *               + dangling div n
  *               + sum of contribs into v
  *
  * Integer division discards remainders deterministically (total mass
  * decays by the lost remainders — documented; rank ORDER, the thing
  * PageRank is for, is unaffected). Sums are integer, hence
  * order-independent.
  *
  * Scale shape: each iteration is one edge-keyed join (ranks onto
  * edges, shuffled by src) + one dst-keyed aggregation — the standard
  * Pregel-free PageRank plan; `localCheckpoint` truncates lineage per
  * round (the [[Components]] discipline). Dangling and teleport masses
  * ride 1-row broadcasts.
  */
object Graphs {

  /** @param edges (src, dst) — deduped directed edges
    * @return (node, rank) after `iters` iterations from a uniform
    *         S div n start; nodes = union of endpoints */
  def pageRankInt(edges: DataFrame, iters: Int,
      totalMass: Long = 1000000000000L): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct().localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct()
    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg"))
    val nRow = nodes.agg(count(lit(1)).as("_n"))
    var r = nodes.crossJoin(broadcast(nRow))
      .select(col("node"), expr(s"${totalMass}L div _n").as("rank"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val withDeg = r.join(outdeg, Seq("node"), "left")
      val dangling = withDeg.filter(col("outdeg").isNull)
        .agg(coalesce(sum(expr("(rank * 85) div 100")), lit(0L))
          .as("_dang"))
      val contribs = e
        .join(withDeg.filter(col("outdeg").isNotNull)
          .select(col("node").as("src"),
            expr("((rank * 85) div 100) div outdeg").as("_c")),
          Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("_c")).as("_in"))
      r = nodes
        .join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(nRow))
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (expr(s"((${totalMass}L * 15) div 100) div _n") +
            expr("_dang div _n") +
            coalesce(col("_in"), lit(0L))).as("rank"))
        .localCheckpoint(true)
    }
    r
  }
}
