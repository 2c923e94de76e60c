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

  /** SYNCHRONOUS label propagation (the RAK community-detection
    * kernel, deterministic variant) — the near-dup cluster refiner
    * that, unlike [[Components]], respects edge DENSITY: a bridge edge
    * between two dense communities doesn't merge them the way
    * connected components must.
    *
    * Labels start as node ids; each round every node adopts the MOST
    * FREQUENT label among its neighbors (edges treated undirected),
    * ties to the SMALLEST label. All updates read the PREVIOUS round's
    * labels (synchronous), so the trajectory is a pure function of the
    * graph — the textbook asynchronous variant is visit-order
    * dependent, which no distributed engine (or oracle) can pin.
    * Fixed `iters` rounds rather than convergence detection: the
    * driver-side loop stays data-independent and each round's output
    * is replayable.
    *
    * Scale shape: per round ONE label-onto-edges hash join (shuffled
    * by the neighbor key) + one (node, label) partial-agg count + one
    * node-keyed argmax via `max(struct(cnt, -label))` — no window over
    * anything global; `localCheckpoint` truncates lineage per round. */
  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    val e0 = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .filter(col("src") =!= col("dst"))
    val und = e0
      .union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    var labels = und.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      labels = und
        .join(labels.select(col("node").as("dst"), col("label")),
          Seq("dst"))
        .groupBy(col("src").as("node"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("node"))
        .agg(max(struct(col("cnt"), (-col("label")).as("_nl"))).as("_b"))
        .select(col("node"), (-col("_b._nl")).as("label"))
        .localCheckpoint(true)
    }
    labels
  }
}
