package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequency sketches for corpus statistics at 100 TB — fixed-size
  * summaries where the exact histogram would be vocabulary-sized.
  *
  * Count-Min (Cormode & Muthukrishnan 2005): a depth x width count grid;
  * each item adds its weight to one bucket per row, a point estimate is
  * the MIN over its depth cells. Estimates never underestimate, and
  * overestimate by at most the collision mass (eps = e/width with
  * probability 1 - e^-depth). Row hashes use the catalog's
  * engine-portable md5 double hashing (pos_r = (h1 + r*h2) mod width —
  * the same Kirsch-Mitzenmacher discipline as the Bloom filter), so the
  * whole grid is reproducible in any engine.
  *
  * Scale shape: the build is ONE partial-aggregatable shuffle on
  * (row, bucket) — depth*width cells total regardless of corpus size, so
  * the finished grid broadcasts anywhere (depth 4 x width 2048 = 64 KB).
  * Callers should collapse occurrences to (item, count) first (Zipf-
  * bounded) so the explode multiplies the VOCABULARY by depth, not the
  * corpus.
  */
object Sketches {

  // first/second 32 bits of md5 — same portable halves as Dedup's Bloom
  private def h1(item: Column): Column =
    conv(substring(md5(item), 1, 8), 16, 10).cast("long")
  private def h2(item: Column): Column =
    conv(substring(md5(item), 9, 8), 16, 10).cast("long")

  private def bucketOf(item: Column, row: Column, width: Int): Column =
    pmod(h1(item) + row * h2(item), lit(width.toLong))

  /** Build the depth x width grid from weighted items:
    * (row, bucket, cnt), absent cells implicitly 0. */
  def countMinGrid(items: DataFrame, itemCol: Column, weightCol: Column,
      depth: Int, width: Int): DataFrame =
    items.select(itemCol.as("_it"), weightCol.as("_w"))
      .select(col("_it"), col("_w"),
        explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .select(col("row"),
        bucketOf(col("_it"), col("row"), width).as("bucket"), col("_w"))
      .groupBy(col("row"), col("bucket"))
      .agg(sum(col("_w")).as("cnt"))

  /** Per-item (row, bucket) cell explode as a STATELESS projection —
    * composes into Structured Streaming unchanged (only the downstream
    * windowed count is stateful), the same way the hash-split kernel
    * rides q180's stream. */
  def withCells(df: DataFrame, itemCol: Column, depth: Int,
      width: Int): DataFrame =
    df.withColumn("row", explode(sequence(lit(0), lit(depth - 1))))
      .withColumn("bucket", bucketOf(itemCol, col("row"), width))

  /** Point estimates for `probes`: min over each probe's depth cells
    * (missing cell = 0). Returns (item, cms_est). */
  def cmsEstimate(grid: DataFrame, probes: DataFrame, itemCol: Column,
      depth: Int, width: Int): DataFrame =
    probes.select(itemCol.as("item"))
      .select(col("item"),
        explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .withColumn("bucket", bucketOf(col("item"), col("row"), width))
      .join(grid, Seq("row", "bucket"), "left")
      .groupBy(col("item"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
}
