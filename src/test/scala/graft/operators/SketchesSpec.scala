package graft.operators

import scala.util.Random
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-Min sketch contracts: never-undershoot, exactness without
  * collisions, zero for absent items under a wide grid. */
class SketchesSpec extends SparkSpec {

  test("estimates never undershoot, even under heavy collisions") {
    import spark.implicits._
    val rng = new Random(11L)
    val items = (0 until 500).map(i => (s"item$i", 1L + rng.nextInt(100)))
    val df = items.toDF("it", "w")
    // width 64 forces collisions on 500 items
    val grid = Sketches.countMinGrid(df, col("it"), col("w"), 4, 64)
    val est = Sketches.cmsEstimate(grid, df, col("it"), 4, 64)
      .as[(String, Long)].collect().toMap
    val truth = items.toMap
    assert(items.forall { case (it, w) => est(it) >= w })
    // and with width 64 something actually collided (est > true somewhere)
    assert(items.exists { case (it, w) => est(it) > w })
    assert(truth.size == 500)
  }

  test("wide grid with few items is exact; absent items estimate 0") {
    import spark.implicits._
    val df = Seq(("a", 10L), ("b", 3L), ("c", 7L)).toDF("it", "w")
    val grid = Sketches.countMinGrid(df, col("it"), col("w"), 4, 1 << 16)
    val est = Sketches.cmsEstimate(grid,
        Seq("a", "b", "c", "zzz-not-there").toDF("it"), col("it"),
        4, 1 << 16)
      .as[(String, Long)].collect().toMap
    assert(est == Map("a" -> 10L, "b" -> 3L, "c" -> 7L,
      "zzz-not-there" -> 0L))
  }

  test("grids are mergeable: cell-sum of partition grids == whole grid") {
    import spark.implicits._
    val partA = (0 until 300).map(i => (s"i${i % 80}", 1L)).toDF("it", "w")
    val partB = (0 until 200).map(i => (s"i${i % 50}", 2L)).toDF("it", "w")
    val whole = partA.unionAll(partB)
    val merged = Sketches.countMinGrid(partA, col("it"), col("w"), 4, 64)
      .unionAll(Sketches.countMinGrid(partB, col("it"), col("w"), 4, 64))
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    val direct = Sketches.countMinGrid(whole, col("it"), col("w"), 4, 64)
    val m = merged.as[(Int, Long, Long)].collect().toSet
    val d = direct.as[(Int, Long, Long)].collect().toSet
    assert(m == d)
  }

  test("grid size is bounded by depth*width regardless of item count") {
    import spark.implicits._
    val df = (0 until 2000).map(i => (s"i$i", 1L)).toDF("it", "w")
    val grid = Sketches.countMinGrid(df, col("it"), col("w"), 4, 32)
    assert(grid.count() <= 4L * 32)
    // total mass conserved per row
    val rowMass = grid.groupBy("row").agg(sum("cnt").as("m"))
      .select("m").as[Long].collect().toSet
    assert(rowMass == Set(2000L))
  }
}
