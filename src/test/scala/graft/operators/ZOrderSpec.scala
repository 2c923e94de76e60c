package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  test("interleaveBits puts x on even and y on odd bit positions") {
    val s = spark
    import s.implicits._
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 0L), (0L, 3L),
      (3L, 3L), (5L, 2L))
      .toDF("x", "y")
      .select(ZOrder.interleaveBits(col("x"), col("y"), 4).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // x=5 (101), y=2 (010): z = 1<<0 + 1<<3 + 1<<4 = 25
    assert(got === Seq(0L, 1L, 2L, 5L, 10L, 15L, 25L))
  }

  test("morton prefix buckets are contiguous 2^k x 2^k boxes; probe " +
    "touches only intersecting boxes") {
    val s = spark
    import s.implicits._
    // full 16x16 grid, 4-bit interleave, bucket = top 4 bits -> each
    // bucket is a 4x4 box
    val grid = (for { x <- 0L until 16L; y <- 0L until 16L }
      yield (x, y)).toDF("x", "y")
    val stats = ZOrder.bucketStats(grid, "x", "y",
      shiftright(ZOrder.interleaveBits(col("x"), col("y"), 4), 4))
    val boxes = stats.collect()
    assert(boxes.length == 16)
    assert(boxes.forall { r =>
      r.getAs[Long]("max_x") - r.getAs[Long]("min_x") == 3 &&
        r.getAs[Long]("max_y") - r.getAs[Long]("min_y") == 3 &&
        r.getAs[Long]("n_rows") == 16
    })
    // point probe: exactly one 4x4 box contains it
    assert(ZOrder.probeTouch(stats, 5, 5, 9, 9).count() == 1)
    assert(ZOrder.probeTouch(stats, 0, 3, 0, 3).count() == 1)
    // probe straddling both box boundaries: 2x2 boxes intersect
    assert(ZOrder.probeTouch(stats, 3, 4, 3, 4).count() == 4)
    // full-range probe touches everything
    assert(ZOrder.probeTouch(stats, 0, 15, 0, 15).count() == 16)
  }
}
