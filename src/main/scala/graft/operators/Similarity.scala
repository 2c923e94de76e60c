package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFns

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query set
  * against a full scan of the corpus; embarrassingly parallel, no shuffle
  * until the final per-query top-k (tiny). This is the exact-recall path.
  *
  * Scale path: IVF — k-means-lite coarse quantizer (deterministic seeded
  * centroids refined by a few Lloyd iterations), corpus partitioned by
  * nearest centroid, queries probe only `nProbe` cells. Recall trades off
  * against the fraction of the corpus scanned; at 100 TB the cell
  * assignment is a write-once layout (partitioned parquet), and each query
  * batch touches nProbe/nCells of the data.
  */
object Similarity {

  /** Exact brute-force cosine top-k.
    * @param queries frame with (qid, qvec) — expected small, broadcast
    * @param corpus  frame with (id, vec) — the big side, scanned once
    */
  def bruteForceTopK(queries: DataFrame, qid: String, qvec: String,
      corpus: DataFrame, id: String, vec: String, k: Int): DataFrame = {
    val q = queries.select(col(qid).as("query_id"), col(qvec).as("_qv"))
    val c = corpus.select(col(id).as("neighbor_id"), col(vec).as("_cv"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("query_id"), col("neighbor_id"),
        VectorFns.cosineSim(col("_qv"), col("_cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"),
        col("_rk").as("rank"))
  }

  /** Deterministic IVF index: pick nCells seeded corpus vectors as initial
    * centroids, run `iters` Lloyd rounds, return corpus tagged with cell id.
    * All steps are DataFrame ops (centroids collected only — nCells rows). */
  def ivfAssign(corpus: DataFrame, id: String, vec: String,
      nCells: Int, iters: Int = 2, seed: Long = 42L): (DataFrame, Array[(Int, Seq[Float])]) = {
    val c = corpus.select(col(id).as("_id"), col(vec).as("_v"))
    // init: deterministic sample (hash-ordered first nCells ids)
    var centroids: Array[(Int, Seq[Float])] = c
      .orderBy(xxhash64(col("_id"), lit(seed))).limit(nCells)
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](1)) }
    if (centroids.isEmpty)  // empty corpus: nothing to index
      return (c.withColumn("_cell", lit(null).cast("int")), centroids)
    var assigned: DataFrame = null
    for (_ <- 0 until iters) {
      assigned = assignToNearest(c, centroids)
      val dim = centroids.head._2.length
      centroids = assigned.groupBy(col("_cell"))
        .agg(array((0 until dim).map(d => avg(col("_v").getItem(d))): _*).as("_cen"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).map(_.toFloat)))
    }
    (assignToNearest(c, centroids), centroids)
  }

  private def assignToNearest(c: DataFrame,
      centroids: Array[(Int, Seq[Float])]): DataFrame = {
    val scored = centroids.map { case (cid, cen) =>
      struct(VectorFns.cosineSim(col("_v"), typedlit(cen)).as("sim"),
        lit(cid).as("cell"))
    }
    c.withColumn("_cell",
      array_max(array(scored.toIndexedSeq: _*)).getField("cell").cast("int"))
  }

  /** IVF query: probe the nProbe nearest cells per query, exact cosine
    * within probed cells only. */
  def ivfTopK(queries: DataFrame, qid: String, qvec: String,
      assigned: DataFrame, centroids: Array[(Int, Seq[Float])],
      k: Int, nProbe: Int = 2): DataFrame = {
    if (centroids.isEmpty)  // empty index: no neighbors, keep the schema
      return queries.select(col(qid).as("query_id"),
        lit(null).cast("long").as("neighbor_id"),
        lit(null).cast("double").as("cosine"),
        lit(null).cast("int").as("rank")).limit(0)
    val probes = centroids.map { case (cid, cen) =>
      struct(VectorFns.cosineSim(col("_qv"), typedlit(cen)).as("sim"),
        lit(cid).as("cell"))
    }
    val q = queries.select(col(qid).as("query_id"), col(qvec).as("_qv"))
      .withColumn("_cells",
        slice(reverse(array_sort(array(probes.toIndexedSeq: _*))), 1, nProbe))
      .withColumn("_cell", explode(transform(col("_cells"), _.getField("cell").cast("int"))))
      .drop("_cells")
    val scored = assigned.join(broadcast(q), Seq("_cell"))
      .select(col("query_id"), col("_id").as("neighbor_id"),
        VectorFns.cosineSim(col("_qv"), col("_v")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("_rk").as("rank"))
  }
}
