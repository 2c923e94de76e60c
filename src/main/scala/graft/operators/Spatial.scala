package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-polygon spatial join — the kernel behind the reference's
  * address_geocode stage (load_stage.address_geocode_partial.R:440-520,
  * load_stage.address_geocode.R), where every geocoded address is
  * st_join'ed against nine polygon layers (census block, PUMA, ZCTA,
  * HRA, region, school district, council districts) to attach the
  * geo_* columns every downstream tabulation uses.
  *
  * Representation: a polygon is an `array<struct<x:double,y:double>>`
  * of vertices (closing edge implied last->first). Containment is the
  * standard even-odd ray cast — for each edge (a, b), a rightward ray
  * from the point crosses iff (a.y > py) != (b.y > py) and px is left
  * of the edge's x at py; odd crossing count = inside. Strict
  * inequalities make the test deterministic; it is pure double
  * arithmetic in one fixed evaluation order, so Spark and an external
  * engine agree bit-for-bit. Expressed entirely with higher-order
  * array functions — no UDF.
  *
  * Scale: the naive formulation is a cross join (every point against
  * every polygon — R's st_join gets away with it because it runs on
  * one machine and the polygon sets are small). [[gridJoin]] is the
  * 100-TB shape: points map to ONE grid cell each (no point
  * amplification), polygons replicate to the cells their bbox covers
  * (bounded by polygon extent / cell size), and the join is a plain
  * EQUI join on the cell key that Catalyst hash-partitions or
  * broadcasts like any other — followed by the exact containment
  * filter. No all-pairs anywhere; skew only if one cell holds a huge
  * polygon count, which cellSize controls.
  */
object Spatial {

  /** Even-odd ray-cast containment test (point strictly inside; points
    * on an edge get boundary-rule results — callers should not place
    * data exactly on polygon borders). */
  def pointInPoly(px: Column, py: Column, poly: Column): Column = {
    val n = size(poly)
    val crossings = aggregate(
      transform(sequence(lit(1), n), i => {
        val a = element_at(poly, i)
        val b = element_at(poly, when(i === n, lit(1)).otherwise(i + 1))
        val (ax, ay) = (a.getField("x"), a.getField("y"))
        val (bx, by) = (b.getField("x"), b.getField("y"))
        when((ay > py) =!= (by > py) &&
          px < (bx - ax) * (py - ay) / (by - ay) + ax, 1).otherwise(0)
      }),
      lit(0), (acc, v) => acc + v)
    crossings % 2 === 1
  }

  /** Grid-partitioned point-in-polygon join: returns `points` columns
    * plus the polygon frame's non-geometry columns for every (point,
    * containing polygon) pair. `polys` must carry `poly`; both frames
    * keep their other columns. One equi-join on (cell_x, cell_y); the
    * polygon side is exploded to its bbox's covered cells first.
    */
  def gridJoin(points: DataFrame, px: String, py: String,
               polys: DataFrame, cellSize: Double): DataFrame = {
    val cs = lit(cellSize)
    val pts = points
      .withColumn("_cx", floor(col(px) / cs))
      .withColumn("_cy", floor(col(py) / cs))
    val xs = transform(col("poly"), v => v.getField("x"))
    val ys = transform(col("poly"), v => v.getField("y"))
    val cells = polys
      .withColumn("_cx", explode(sequence(
        floor(array_min(xs) / cs), floor(array_max(xs) / cs))))
      .withColumn("_cy", explode(sequence(
        floor(array_min(ys) / cs), floor(array_max(ys) / cs))))
    pts.join(cells, Seq("_cx", "_cy"))
      .filter(pointInPoly(col(px), col(py), col("poly")))
      .drop("_cx", "_cy", "poly")
  }

  /** The st_join chain: left-attach each named layer's attribute
    * columns to every point, keeping points that fall outside a layer
    * (NULL attrs) — load_stage.address_geocode_partial.R's nine
    * sequential st_joins. `layers` maps layer frames (poly + attr
    * columns); each layer is one gridJoin plus one left equi-join back
    * on the point id. */
  def overlay(points: DataFrame, pid: String, px: String, py: String,
              layers: Seq[DataFrame], cellSize: Double): DataFrame =
    layers.foldLeft(points) { (acc, layer) =>
      val hits = gridJoin(points.select(pid, px, py), px, py,
        layer, cellSize).drop(px, py)
      acc.join(hits, Seq(pid), "left")
    }
}
