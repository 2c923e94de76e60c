package graft.operators

import graft.SparkSpec

/** Triangle counting on hand graphs: K4, a square, direction/dup
  * insensitivity. */
class TriangleSpec extends SparkSpec {

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    Graphs.triangleCounts(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("K4 has 4 triangles, every node in 3; a square has none") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    assert(counts(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(counts(square).isEmpty)
  }

  test("direction, duplicates, and self-loops do not change counts") {
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val messy = tri ++ Seq((2L, 1L), (3L, 2L), (1L, 3L), (2L, 2L),
      (1L, 2L), (3L, 1L))
    assert(counts(tri) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(counts(messy) == counts(tri))
  }

  test("two triangles sharing an edge: shared nodes count both") {
    // {1,2,3} and {2,3,4}
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 4L), (3L, 4L))
    assert(counts(g) == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }
}
