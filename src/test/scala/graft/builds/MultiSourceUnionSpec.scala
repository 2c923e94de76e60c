package graft.builds

import org.apache.spark.sql.types._
import graft.SparkSpec

/** Drift-resolution fixtures for the multi-source union build: absent
  * columns NULL-fill, int->long widening, declared column order, distinct
  * collapse, and the column-absent-everywhere edge. */
class MultiSourceUnionSpec extends SparkSpec {

  private val target = StructType(Seq(
    StructField("id", LongType), StructField("amt", DecimalType(10, 2)),
    StructField("note", StringType)))

  test("missing columns NULL-fill, ints widen, duplicates collapse") {
    val s = spark
    import s.implicits._
    val a = Seq((1, 10.5), (1, 10.5), (2, 7.0)) // int ids, double amts, dup row
      .toDF("id", "amt")
    val b = Seq((3L, "x")).toDF("id", "note")   // long ids, no amt
    val out = MultiSourceUnion.build(target, Seq("a" -> a, "b" -> b))
    assert(out.columns.toSeq === Seq("id", "amt", "note", "filetype"))
    assert(out.schema("id").dataType === LongType)
    assert(out.schema("amt").dataType === DecimalType(10, 2))
    val rows = out.collect().map(r => (r.getLong(0),
      Option(r.getDecimal(1)).map(_.toString).orNull, r.getString(2),
      r.getString(3))).toSet
    assert(rows === Set(
      (1L, "10.50", null, "a"),
      (2L, "7.00", null, "a"),
      (3L, null, "x", "b")))
  }

  test("column absent from every source still lands as typed NULL") {
    val s = spark
    import s.implicits._
    val a = Seq(1L).toDF("id")
    val out = MultiSourceUnion.build(target, Seq("only" -> a))
    assert(out.schema("note").dataType === StringType)
    assert(out.schema("amt").dataType === DecimalType(10, 2))
    val r = out.collect().head
    assert(r.getLong(0) === 1L && r.isNullAt(1) && r.isNullAt(2))
  }
}
