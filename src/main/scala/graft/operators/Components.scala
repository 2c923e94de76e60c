package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate pair edges — the step that
  * turns pairwise near-dup output ([[Dedup.minhashNearDups]],
  * [[Dedup.simhashNearDups]], [[Dedup.embeddingNearDups]]) into duplicate
  * CLUSTERS with one keeper per cluster. Pairs alone under-dedup: if A~B
  * and B~C but A!~C, pairwise keep-min retains both A and C's cluster
  * rows inconsistently; the transitive closure is what "keep one copy per
  * duplicate group" actually means.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014) — the
  * standard shuffle-based formulation that converges in O(log n) rounds
  * on any graph, unlike naive min-label propagation whose round count is
  * the graph DIAMETER (a 10M-node chain would need 10M rounds; star
  * operations contract it in ~25). Each round is two grouped aggregations
  * and two self-joins on the node id — no driver-side state, no collect;
  * `localCheckpoint` truncates lineage each round so the plan doesn't
  * grow with iteration count (the classic iterative-Spark failure mode).
  *
  * At 100 TB: near-dup components are overwhelmingly tiny (pairs/triples)
  * with a few boilerplate monsters; star rounds contract the monsters
  * logarithmically while leaving the tiny ones fixed after round one, and
  * the convergence check is a cheap count+checksum aggregate, not a
  * full-edge-set comparison.
  */
object Components {

  /** Large-star: for every node u, hang its LARGER neighbors off the
    * minimum of its neighborhood (including u). Operates on the
    * symmetrized edge list. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u")
      .agg(min(col("v")).as("_mn"))
      .select(col("u"), least(col("_mn"), col("u")).as("m"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  /** Small-star: orient edges large->small; hang each node's smaller
    * neighbors (and itself) off the neighborhood minimum. */
  private def smallStar(e: DataFrame): DataFrame = {
    val dir = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
    val mins = dir.groupBy("u").agg(min(col("v")).as("m"))
    dir.join(mins, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .union(mins.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** (count, checksum) fingerprint of an edge set — equality across one
    * round is the fixed-point test. XOR of per-edge hashes is
    * order-independent and overflow-free (ANSI-safe); a collision would
    * need two distinct edge sets agreeing on both count and the 64-bit
    * XOR in the same round of a provably-converging iteration. */
  private def fingerprint(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)),
      coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Transitive closure of a pair list into component labels.
    *
    * @param edges pair frame; endpoints must be numeric ids
    * @param srcCol,dstCol endpoint columns
    * @param maxIter safety bound — star alternation converges in
    *                O(log n) rounds, so 50 covers any realistic graph;
    *                hitting the bound throws rather than returning a
    *                partial closure
    * @return (id, component) — component is the minimum node id reachable
    *         from id; every endpoint appears exactly once
    */
  def connectedComponents(edges: DataFrame, srcCol: String,
      dstCol: String, maxIter: Int = 50): DataFrame = {
    var e = edges
      .select(col(srcCol).cast("long").as("u"),
        col(dstCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    var fp = fingerprint(e)
    var converged = e.isEmpty
    var it = 0
    while (!converged && it < maxIter) {
      e = smallStar(largeStar(e)).localCheckpoint(true)
      val fp2 = fingerprint(e)
      converged = fp2 == fp
      fp = fp2
      it += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    // fixed point is a star forest child->root; roots label themselves
    e.select(col("u").as("id"), col("v").as("component"))
      .union(e.select(col("v").as("id"), col("v").as("component")))
      .distinct()
  }

  /** Duplicate clusters from a near-dup PAIR frame: transitive closure,
    * labeled by the minimum doc id (the keeper), with cluster size — the
    * "keep one per group" driver for any of the Dedup pair generators. */
  def dupClusters(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b"): DataFrame =
    connectedComponents(pairs, idA, idB)
      .groupBy(col("component").as("keep_id"))
      .agg(count(lit(1)).as("n_docs"),
        sort_array(collect_list(col("id"))).as("doc_ids"))
}
