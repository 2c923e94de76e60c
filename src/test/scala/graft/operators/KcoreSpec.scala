package graft.operators

import graft.SparkSpec

/** k-core peeling: hand graphs where the core is known, including the
  * cascade a one-round filter would miss. */
class KcoreSpec extends SparkSpec {

  private def core(edges: Seq[(Long, Long)], k: Int,
      rounds: Int): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    Graphs.kcorePeel(edges.toDF("src", "dst"), k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("K4 with a pendant chain: the 3-core is exactly the K4, and " +
    "peeling CASCADES down the chain") {
    // 1-2-3-4 complete; 5 hangs off 4; 6 hangs off 5. Degree-3 filter
    // alone would keep nothing of the chain but needs TWO rounds to
    // finish: removing 6 first drops 5's degree.
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    val got = core(g, k = 3, rounds = 3)
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got.values.forall(_ == 3L))
  }

  test("a cycle is its own 2-core; the 3-core of a cycle is empty") {
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(core(cyc, 2, 3).keySet == Set(1L, 2L, 3L, 4L))
    assert(core(cyc, 3, 3).isEmpty)
  }
}
