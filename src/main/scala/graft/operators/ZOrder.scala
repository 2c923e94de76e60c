package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout — multi-dimensional data skipping for
  * the lake: a table range-partitioned on ONE column prunes scans only
  * for predicates on that column; interleaving the bits of two
  * columns' values into one sort key makes each file's (min, max) box
  * TIGHT in both dimensions, so a two-sided predicate skips files in
  * both. The reference's single-column analog is its clustered
  * B-tree/(id, from_date) index choice (claims_elig.R:748-751); at
  * lake scale the curve does what the index order did.
  *
  * Everything here is pure Column arithmetic (shifts/masks — codegen'd,
  * no UDF): `interleaveBits` builds the Morton code, `bucketStats`
  * simulates the file layout (bucket = code prefix) and computes each
  * bucket's per-dimension min/max — exactly the footer statistics a
  * Parquet reader prunes with — and `probeTouch` counts the
  * buckets/rows a rectangle predicate must touch. Writing the real
  * layout is `df.repartitionByRange(n, col("zcode"))` +
  * `sortWithinPartitions("zcode")` on the same code.
  *
  * Scale: code assignment is row-local; bucket stats are one
  * partial-agg shuffle on the bucket id; the probe is a filter over
  * the BUCKET frame (one row per file — bounded metadata, the same
  * cardinality the driver's scan planner handles).
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of x (even positions)
    * and y (odd positions). Inputs must be non-negative longs. */
  def interleaveBits(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Per-bucket footer statistics under a layout: rows, and each
    * dimension's min/max (the pruning boxes). `bucketOf` maps a row to
    * its file — for z-order, the Morton-code prefix; for a
    * single-column sort, the leading column's prefix. */
  def bucketStats(df: DataFrame, xCol: String, yCol: String,
      bucketOf: Column): DataFrame =
    df.groupBy(bucketOf.as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(xCol)).as("min_x"), max(col(xCol)).as("max_x"),
        min(col(yCol)).as("min_y"), max(col(yCol)).as("max_y"))

  /** Buckets whose stat box intersects the probe rectangle — the files
    * a min/max-pruning scan must read. */
  def probeTouch(stats: DataFrame, x0: Long, x1: Long, y0: Long,
      y1: Long): DataFrame =
    stats.filter(col("min_x") <= x1 && col("max_x") >= x0 &&
      col("min_y") <= y1 && col("max_y") >= y0)
}
