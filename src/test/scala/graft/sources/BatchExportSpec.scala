package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Batched-export kernel (export_apcd_tables.R / cdr 99_export_tables.R):
  * format-file derivation, the round(n/batches) plan, the BETWEEN windows
  * of batch_size + 1 rows, naming, and the tab strip. */
class BatchExportSpec extends SparkSpec {

  test("formatFile keeps declared order, excludes etl_batch_id") {
    val cfg = TableConfig.parse("""
table: final.t
vars:
    a: BIGINT
    etl_batch_id: INT
    b: varchar(4)
""")
    assert(BatchExport.formatFile(cfg) ==
      Seq(("a", "BIGINT", 1), ("b", "VARCHAR(4)", 2)))
  }

  test("batch windows carry batch_size + 1 rows; last takes the rest") {
    import spark.implicits._
    // 100 rows, 7 batches -> bs = round(100/7) = 14, window = 15 rows:
    // files 1-6 have 15 rows, file 7 the remaining 10 (the reference's
    // inclusive BETWEEN + step-by-bs+1 quirk, export_apcd_tables.R:136-139)
    val df = (1 to 100).toDF("id")
    val n = df.agg(count(lit(1)).as("_n"))
    val got = BatchExport.rowNumbers(df, Seq("id"))
      .crossJoin(broadcast(n))
      .withColumn("bs", BatchExport.batchSizeCol(col("_n"), 7))
      .withColumn("fno", BatchExport.fileNumberOf(col("rownum"), col("bs")))
      .groupBy("fno").count().orderBy("fno")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 15L), (2L, 15L), (3L, 15L), (4L, 15L),
      (5L, 15L), (6L, 15L), (7L, 10L)))
  }

  test("rowNumbers are 1-based, dense, and follow the declared order") {
    import spark.implicits._
    val df = Seq(30, 10, 20).toDF("id")
    val got = BatchExport.rowNumbers(df, Seq("id"))
      .orderBy("rownum").as[(Int, Long)].collect().toSeq
    assert(got == Seq((10, 1L), (20, 2L), (30, 3L)))
  }

  test("zero batch estimate degrades to one whole-table file") {
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("id")
    val n = df.agg(count(lit(1)).as("_n"))
    val got = BatchExport.rowNumbers(df, Seq("id"))
      .crossJoin(broadcast(n))
      .withColumn("bs", BatchExport.batchSizeCol(col("_n"), 0))
      .withColumn("fno", BatchExport.fileNumberOf(col("rownum"), col("bs")))
      .select(countDistinct(col("fno")))
      .first().getLong(0)
    assert(got == 1L)
  }

  test("export naming and tab strip") {
    import spark.implicits._
    val named = Seq(1L, 12L).toDF("fno")
      .select(BatchExport.fileName("stg", "claims", col("fno"), "20260318")
        .as("f"))
      .as[String].collect().toSeq
    assert(named == Seq("stg.claims.001_20260318.csv.gz",
      "stg.claims.012_20260318.csv.gz"))
    val stripped = Seq("a\tb\tc").toDF("v")
      .select(BatchExport.exportCol(col("v")).as("v"))
      .as[String].first()
    assert(stripped == "abc")
  }
}
