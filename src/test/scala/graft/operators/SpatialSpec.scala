package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpatialSpec extends SparkSpec {

  private def polyCol(pts: Seq[(Double, Double)]) =
    array(pts.map { case (x, y) =>
      struct(lit(x).as("x"), lit(y).as("y")) }: _*)

  private def inside(px: Double, py: Double,
                     poly: Seq[(Double, Double)]): Boolean =
    spark.range(1)
      .select(Spatial.pointInPoly(lit(px), lit(py), polyCol(poly))
        .as("r")).head.getBoolean(0)

  test("pointInPoly: square, triangle, concave L-shape") {
    val sq = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))
    assert(inside(2.0, 2.0, sq))
    assert(!inside(5.0, 2.0, sq))
    assert(!inside(-1.0, 2.0, sq))
    val tri = Seq((0.0, 0.0), (4.0, 0.0), (2.0, 4.0))
    assert(inside(2.0, 1.0, tri))
    assert(!inside(0.2, 3.0, tri))
    // L-shape: the notch [2,4]x[2,4] is OUTSIDE — even-odd must see it
    val ell = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 2.0), (2.0, 2.0),
      (2.0, 4.0), (0.0, 4.0))
    assert(inside(1.0, 3.0, ell))
    assert(inside(3.0, 1.0, ell))
    assert(!inside(3.0, 3.0, ell))
  }

  test("gridJoin matches the brute-force cross-join containment at " +
    "several cell sizes") {
    import spark.implicits._
    val pts = (0 until 200).map { i =>
      (i.toLong, i % 17 * 0.61 + 0.13, i % 13 * 0.79 + 0.07)
    }.toDF("pid", "px", "py")
    val polys = Seq(
      ("A", Seq((0.0, 0.0), (5.0, 0.0), (5.0, 5.0), (0.0, 5.0))),
      ("B", Seq((3.0, 3.0), (9.5, 0.5), (9.5, 9.5))),
      ("C", Seq((0.0, 6.0), (4.0, 6.0), (4.0, 8.0), (2.0, 8.0),
        (2.0, 9.9), (0.0, 9.9))))
    val polyDf = polys.map { case (id, ps) =>
      spark.range(1).select(lit(id).as("zone"), polyCol(ps).as("poly"))
    }.reduce(_ unionByName _)
    val brute = pts.crossJoin(polyDf)
      .filter(Spatial.pointInPoly(col("px"), col("py"), col("poly")))
      .select("pid", "zone").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(brute.nonEmpty)
    for (cell <- Seq(0.7, 2.0, 11.0)) {
      val grid = Spatial.gridJoin(pts, "px", "py", polyDf, cell)
        .select("pid", "zone").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(grid === brute, s"cellSize=$cell")
    }
  }

  test("overlay keeps out-of-coverage points with NULL attrs") {
    import spark.implicits._
    val pts = Seq((1L, 0.5, 0.5), (2L, 99.0, 99.0))
      .toDF("pid", "px", "py")
    val layer = spark.range(1)
      .select(lit("Z").as("zone"),
        polyCol(Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)))
          .as("poly"))
    val out = Spatial.overlay(pts, "pid", "px", "py", Seq(layer), 2.0)
      .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("zone")))
      .toMap
    assert(out(1L) === Some("Z"))
    assert(out(2L) === None)
  }
}
