package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkSpec {

  test("diff classifies added/removed/changed/unchanged with null-safe " +
    "payload equality") {
    val s = spark
    import s.implicits._
    val prev = Seq(
      (1L, Some("A"), "hi"),   // unchanged
      (2L, Some("B"), "hi"),   // changed (payload flips)
      (3L, Some("C"), "hi"),   // removed
      (4L, None, "hi"),        // NULL payload on both sides: unchanged
      (5L, Some("E"), "hi")    // NULL appears on one side: changed
    ).toDF("k", "status", "pri")
    val cur = Seq(
      (1L, Some("A"), "hi"),
      (2L, Some("Bx"), "hi"),
      (4L, None, "hi"),
      (5L, None, "hi"),
      (6L, Some("F"), "hi")    // added
    ).toDF("k", "status", "pri")
    val got = SnapshotDiff.diff(prev, cur, Seq("k"),
        Seq("status", "pri"))
      .select("k", "diff_status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "unchanged", 5L -> "changed",
      6L -> "added"))
  }

  test("diff carries both sides' payloads for changed-row inspection") {
    val s = spark
    import s.implicits._
    val prev = Seq((1L, "A")).toDF("k", "v")
    val cur = Seq((1L, "B")).toDF("k", "v")
    val row = SnapshotDiff.diff(prev, cur, Seq("k"), Seq("v"))
      .select("diff_status", "prev_v", "cur_v").collect().head
    assert(row.getString(0) === "changed")
    assert(row.getString(1) === "A" && row.getString(2) === "B")
  }

  test("a NULL-key row is classified by the side it came from, " +
    "not mislabeled via key-null tests") {
    val s = spark
    import s.implicits._
    val prev = Seq((Option.empty[Long], "P"), (Some(1L), "A"))
      .toDF("k", "v")
    val cur = Seq((Option.empty[Long], "C"), (Some(1L), "A"))
      .toDF("k", "v")
    val got = SnapshotDiff.diff(prev, cur, Seq("k"), Seq("v"))
      .select("diff_status").collect().map(_.getString(0)).sorted.toSeq
    // NULL keys never equi-join: prev's NULL-key row is "removed",
    // cur's is "added"; the shared k=1 row is unchanged.
    assert(got === Seq("added", "removed", "unchanged"))
  }

  test("seeded properties: self-diff is all-unchanged, statuses " +
    "partition the key union, swap flips added/removed") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val prevRows = (1L to 60L)
        .filter(_ => rnd.nextBoolean()).map(k => (k, rnd.nextInt(3)))
      val curRows = (1L to 60L)
        .filter(_ => rnd.nextBoolean()).map(k => (k, rnd.nextInt(3)))
      val prev = prevRows.toDF("k", "v")
      val cur = curRows.toDF("k", "v")
      // self-diff: everything unchanged
      val self = SnapshotDiff.diff(prev, prev, Seq("k"), Seq("v"))
      assert(self.filter(col("diff_status") =!= "unchanged").count() == 0)
      assert(self.count() == prevRows.size)
      // statuses partition the key union
      val d = SnapshotDiff.diff(prev, cur, Seq("k"), Seq("v"))
        .select("k", "diff_status").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(d.keySet == (prevRows.map(_._1).toSet ++
        curRows.map(_._1).toSet))
      val pk = prevRows.map(_._1).toSet
      val ck = curRows.map(_._1).toSet
      assert(d.filter(_._2 == "added").keySet == ck.diff(pk))
      assert(d.filter(_._2 == "removed").keySet == pk.diff(ck))
      // swap: added <-> removed, changed stable
      val sw = SnapshotDiff.diff(cur, prev, Seq("k"), Seq("v"))
        .select("k", "diff_status").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(sw.filter(_._2 == "added").keySet ==
        d.filter(_._2 == "removed").keySet)
      assert(sw.filter(_._2 == "changed").keySet ==
        d.filter(_._2 == "changed").keySet)
    }
  }
}
