package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integer PageRank: hand-computed trajectories (cycle invariance,
  * dangling-mass redistribution) and rank ordering. */
class GraphsSpec extends SparkSpec {

  test("2-cycle is a fixed point of the integer update") {
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = Graphs.pageRankInt(edges, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 500000000000L, 2L -> 500000000000L))
  }

  test("dangling mass redistributes (hand-computed two iterations)") {
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L)).toDF("src", "dst") // node 2 dangles
    val it1 = Graphs.pageRankInt(edges, iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(it1 == Map(1L -> 287500000000L, 2L -> 712500000000L))
    val it2 = Graphs.pageRankInt(edges, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(it2 == Map(1L -> 377812500000L, 2L -> 622187500000L))
  }

  test("a star hub outranks its spokes") {
    val s = spark
    import s.implicits._
    val edges = (2L to 6L).map(i => (i, 1L)).toDF("src", "dst")
    val ranked = Graphs.pageRankInt(edges, iters = 5)
      .orderBy(col("rank").desc, col("node"))
      .as[(Long, Long)].collect()
    assert(ranked.head._1 == 1L)
    assert(ranked.head._2 > ranked(1)._2)
  }
}
