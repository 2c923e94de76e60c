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

  /** Per-node TRIANGLE COUNTS via degree-ordered wedge join — the
    * standard scale-safe formulation: orient every undirected edge
    * from the (degree, id)-smaller endpoint to the larger, so each
    * node's oriented out-degree is O(sqrt(m)) regardless of raw skew
    * (a celebrity node's million neighbors orient INTO it, not out);
    * wedges enumerate only oriented out-pairs, every triangle closes
    * through exactly one wedge-apex, and the close probe is one
    * LEFT SEMI-style join of wedges against oriented edges. Each
    * triangle credits all three corners once.
    *
    * Scale shape: degree = one edge-keyed partial agg; orientation a
    * row-local comparison; the wedge self-join shuffles oriented
    * adjacency on the apex (bounded fan-out); the close is a
    * (v, w)-keyed equi-join. No windows, no driver state. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val e0 = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .filter(col("src") =!= col("dst"))
    val und = e0.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
    val oriented = withDeg.select(
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("a"))
        .otherwise(col("b")).as("u"),
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("b"))
        .otherwise(col("a")).as("v"))
    val l = oriented.select(col("u"), col("v").as("x"))
    val r = oriented.select(col("u"), col("v").as("y"))
    val wedges = l.join(r, Seq("u")).filter(col("x") < col("y"))
    // close: wedge pairs are id-ordered (x < y), so the third edge is
    // exactly a canonical undirected edge (a, b) = (x, y)
    val tris = wedges.join(
      und.select(col("a").as("x"), col("b").as("y")), Seq("x", "y"))
    tris.select(col("u").as("node"))
      .union(tris.select(col("x").as("node")))
      .union(tris.select(col("y").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
  }


  /** Fixed-round k-CORE PEELING: each round drops every node whose
    * degree in the SURVIVING subgraph is below `k` (synchronous — all
    * removals of a round see the previous round's survivor set, so
    * the trajectory is a pure function of the graph, the
    * [[labelPropagation]] discipline). After enough rounds the
    * survivor set is exactly the k-core; fixed `rounds` keeps the
    * driver loop data-independent and each round replayable by a
    * generated oracle CTE. Returns survivors with their final-round
    * degree.
    *
    * Scale shape per round: two semi-joins prune the edge list to
    * surviving endpoints (node-keyed), one partial-agg degree count —
    * no windows; `localCheckpoint` truncates lineage. */
  def kcorePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    val e0 = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .filter(col("src") =!= col("dst"))
    val both = e0
      .union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    var alive = both.select(col("src").as("node")).distinct()
      .localCheckpoint(true)
    var deg = alive.select(col("node"), lit(0L).as("dg"))
    for (_ <- 1 to rounds) {
      val e = both
        .join(alive.select(col("node").as("src")), Seq("src"), "left_semi")
        .join(alive.select(col("node").as("dst")), Seq("dst"), "left_semi")
      deg = e.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("dg")).localCheckpoint(true)
      alive = deg.filter(col("dg") >= k).select(col("node"))
        .localCheckpoint(true)
    }
    deg.filter(col("dg") >= k)
  }

}
