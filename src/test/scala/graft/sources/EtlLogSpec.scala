package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ETL-log kernels (apcd_import_functions.R + etl_log.R): the file-name
  * parser, scan-order id assignment, lifecycle status precedence, the
  * row-count gate string, and batch-id match-reuse. */
class EtlLogSpec extends SparkSpec {

  test("file-name parser: dot-split table/number, fixed-position date") {
    import spark.implicits._
    val got = Seq("stg_claims.apcd_claim.012_20241217.csv.gz")
      .toDF("file_name")
      .select(EtlLog.parsedCols(col("file_name")): _*)
      .as[(String, Int, String)].first()
    assert(got == (("apcd_claim", 12, "2024-12-17")))
  }

  test("file-name parser: plain .csv (no .gz) parses the same date") {
    import spark.implicits._
    val got = Seq("stg_claims.apcd_claim.012_20241217.csv")
      .toDF("file_name")
      .select(EtlLog.parsedCols(col("file_name")): _*)
      .as[(String, Int, String)].first()
    assert(got == (("apcd_claim", 12, "2024-12-17")))
  }

  test("new etl ids: prior max + directory scan order (ref<stage<final)") {
    import spark.implicits._
    val newFiles = Seq(
      ("final.orders.002_20260318.csv.gz", "final"),
      ("ref.nation.001_20260318.csv.gz", "ref"),
      ("stage.customer.002_20260318.csv.gz", "stage"),
      ("final.orders.001_20260318.csv.gz", "final"))
      .toDF("file_name", "file_schema")
    val log = Seq(7L).toDF("etl_id")
    val got = EtlLog.assignEtlIds(newFiles, log)
      .select("file_name", "etl_id")
      .as[(String, Long)].collect().toMap
    assert(got == Map(
      "ref.nation.001_20260318.csv.gz" -> 8L,
      "stage.customer.002_20260318.csv.gz" -> 9L,
      "final.orders.001_20260318.csv.gz" -> 10L,
      "final.orders.002_20260318.csv.gz" -> 11L))
  }

  test("empty log starts ids at 1") {
    import spark.implicits._
    val newFiles = Seq(("a.b.001_20260318.csv.gz", "ref"))
      .toDF("file_name", "file_schema")
    val log = Seq.empty[Long].toDF("etl_id")
    assert(EtlLog.assignEtlIds(newFiles, log)
      .select("etl_id").as[Long].first() == 1L)
  }

  test("status precedence: most-advanced lifecycle stage wins") {
    import spark.implicits._
    val ts = lit("2026-01-01 00:00:00").cast("timestamp")
    val nul = lit(null).cast("timestamp")
    def st(dl: Boolean, ld: Boolean, ar: Boolean, de: Boolean): String =
      spark.range(1).select(EtlLog.statusCol(
        if (dl) ts else nul, if (ld) ts else nul,
        if (ar) ts else nul, if (de) ts else nul).as("s"))
        .as[String].first()
    assert(st(true, true, true, true) == "deleted")
    assert(st(true, true, true, false) == "archived")
    assert(st(true, true, false, false) == "loaded")
    assert(st(true, false, false, false) == "downloaded")
    assert(st(false, false, false, false) == "created")
  }

  test("row-count gate: OK / NULL / the reference's error string") {
    import spark.implicits._
    val got = Seq(("f.gz", 10L, Some(10L)), ("g.gz", 10L, Some(7L)),
        ("h.gz", 10L, None))
      .toDF("file_name", "rows_file", "rows_loaded")
      .select(col("file_name"), EtlLog.loadResultCol(col("file_name"),
        col("rows_file"), col("rows_loaded")).as("r"))
      .as[(String, Option[String])].collect().toMap
    assert(got("f.gz").contains("OK"))
    assert(got("g.gz").contains("ERROR: Row Count of File g.gz (10) " +
      "does NOT MATCH Rows Loaded to SQL Table (7)!!!"))
    assert(got("h.gz").isEmpty)
  }

  test("batch ids: match-reuse, sequential new keys, same-run repeats") {
    import spark.implicits._
    val log = Seq(
      (3L, "Full refresh", "APCD", "2024-01-15"),
      (5L, "Full refresh", "APCD", "2024-01-15"), // same key twice: max wins
      (4L, "Incremental refresh", "Medicaid", "2024-02-15"))
      .toDF("etl_batch_id", "batch_type", "data_source", "delivery_date")
    val req = Seq(
      (1, "Full refresh", "APCD", "2024-01-15"),     // match -> 5
      (2, "Full refresh", "Medicare", "2025-01-15"), // new -> 6
      (3, "Incremental refresh", "APCD", "2025-02-15"), // new -> 7
      (4, "Full refresh", "Medicare", "2025-01-15")) // repeat of #2 -> 6
      .toDF("request_order", "batch_type", "data_source", "delivery_date")
    val got = EtlLog.assignBatchIds(req, log)
      .select("request_order", "etl_batch_id", "reused")
      .as[(Int, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1, 5L, true), (2, 6L, false), (3, 7L, false),
      (4, 6L, true)))
  }

  test("batchTypeLabel maps the caller form before matching") {
    import spark.implicits._
    val got = Seq("incremental", "full").toDF("v")
      .select(EtlLog.batchTypeLabel(col("v")).as("l"))
      .as[String].collect().toSeq
    assert(got == Seq("Incremental refresh", "Full refresh"))
  }

  test("withMaxFileNum annotates each group's highest file number") {
    import spark.implicits._
    val log = Seq(
      ("2024-12-17", "final", "orders", 1),
      ("2024-12-17", "final", "orders", 3),
      ("2024-12-17", "stage", "customer", 2))
      .toDF("file_date", "file_schema", "file_table", "file_number")
    val got = EtlLog.withMaxFileNum(log)
      .select("file_table", "file_number", "max_file_num")
      .as[(String, Int, Int)].collect().toSet
    assert(got == Set(("orders", 1, 3), ("orders", 3, 3),
      ("customer", 2, 2)))
  }
}
