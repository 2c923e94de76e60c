package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StableIdsSpec extends SparkSpec {
  import spark.implicits._

  private def emptyPrior =
    Seq.empty[(String, Long)].toDF("id", "id_uw")

  test("first assignment numbers densely in id order") {
    val cur = Seq("c", "a", "b", "a").toDF("id")
    val out = StableIds.assign(cur, "id", emptyPrior)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a" -> 1L, "b" -> 2L, "c" -> 3L))
  }

  test("re-run keeps prior surrogates, numbers newcomers after the " +
    "kept block") {
    val prior = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("id", "id_uw")
    val cur = Seq("a", "b", "c", "x", "d").toDF("id")
    val out = StableIds.assign(cur, "id", prior)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 3 kept rows -> newcomers d, x get 4, 5 in id order
    assert(out === Map("a" -> 1L, "b" -> 2L, "c" -> 3L,
      "d" -> 4L, "x" -> 5L))
  }

  test("the reference's shrink quirk: dropped prior people can make a " +
    "newcomer collide with a surviving surrogate — probes surface it") {
    // prior assigned a..d = 1..4; current keeps only c, d and adds e.
    // Kept rows = 2, so e gets surrogate 3 — colliding with NOTHING
    // here (c=3 survives!) -> c and e both carry 3.
    val prior = Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L))
      .toDF("id", "id_uw")
    val cur = Seq("c", "d", "e").toDF("id")
    val out = StableIds.assign(cur, "id", prior)
    val m = out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("c") === 3L && m("e") === 3L) // the documented hazard
    val probes = StableIds.surrogateProbes(out, "id").head
    assert(probes.getLong(0) === 1L) // one surrogate with >1 row
    assert(probes.getLong(1) === 1L) // one surrogate with >1 id
  }

  test("probes are zero on a clean assignment") {
    val out = StableIds.assign(Seq("a", "b").toDF("id"), "id", emptyPrior)
    val probes = StableIds.surrogateProbes(out, "id").head
    assert(probes.getLong(0) === 0L && probes.getLong(1) === 0L)
  }
}
