package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TabloopCubeSpec extends SparkSpec {

  test("cubeCard: cells + margins + grand total match direct group-bys; " +
    "grouping flags split margin NULL from NULL dimension value") {
    val s = spark
    import s.implicits._
    // one genuinely-NULL lang value to collide with the margin NULL
    val docs = Seq(
      (Some("en"), "a", 10L), (Some("en"), "b", 20L),
      (Some("de"), "a", 5L), (None, "a", 2L))
      .toDF("lang", "src", "n")
    val cube = Tabloop.cubeCard(docs, Seq("lang", "src"),
      Seq(sum(col("n")).as("total")))
    // 2^2 grouping sets over 3 langs (incl. NULL) x 2 srcs
    val byFlags = cube.collect().map { r =>
      ((r.getAs[Int]("g_lang"), r.getAs[Int]("g_src")),
        (Option(r.getAs[String]("lang")), Option(r.getAs[String]("src")),
          r.getAs[Long]("total")))
    }.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // grand total
    assert(byFlags((1, 1)) === Set((None, None, 37L)))
    // lang margin: NULL-valued lang is its own row, flag 0 — not the
    // g_lang=1 margin
    assert(byFlags((0, 1)) === Set(
      (Some("en"), None, 30L), (Some("de"), None, 5L), (None, None, 2L)))
    // src margin
    assert(byFlags((1, 0)) === Set(
      (None, Some("a"), 17L), (None, Some("b"), 20L)))
    // cells match a direct group-by
    val direct = docs.groupBy("lang", "src").agg(sum(col("n")).as("t"))
      .collect().map(r => (Option(r.getAs[String]("lang")),
        Option(r.getAs[String]("src")), r.getAs[Long]("t"))).toSet
    assert(byFlags((0, 0)) === direct)
  }

  test("cubeCard plans as ONE aggregation over Expand, not a union of " +
    "group-bys") {
    val s = spark
    import s.implicits._
    val docs = Seq(("en", "a", 1L)).toDF("lang", "src", "n")
    val plan = Tabloop.cubeCard(docs, Seq("lang", "src"),
      Seq(sum(col("n")).as("t"))).queryExecution.executedPlan.toString
    assert(plan.contains("Expand"))
    assert(!plan.contains("Union"))
  }
}
