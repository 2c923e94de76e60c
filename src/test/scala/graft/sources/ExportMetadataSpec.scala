package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExportMetadataSpec extends SparkSpec {

  test("renderType lowercases and strips interior whitespace like the " +
    "INFORMATION_SCHEMA reassembly") {
    assert(ExportMetadata.renderType("VARCHAR(255)") === "varchar(255)")
    assert(ExportMetadata.renderType("NUMERIC(38, 2)") === "numeric(38,2)")
    assert(ExportMetadata.renderType(" DATE ") === "date")
  }

  test("fixName applies both str_replace_all fixups, any occurrence") {
    assert(ExportMetadata.fixName("tmp_ek_mcaid_claim_header")
      === "mcaid_claim_header")
    assert(ExportMetadata.fixName("icdcm_codes") === "ref_icdcm_codes")
    // unanchored, like str_replace_all — and ref_date passes through
    assert(ExportMetadata.fixName("tmp_ek_icdcm_codes")
      === "ref_icdcm_codes")
    assert(ExportMetadata.fixName("ref_date") === "ref_date")
  }

  test("manifest: column sheet carries declaration-order ordinals; " +
    "row sheet carries live counts and declared col_count") {
    import spark.implicits._
    val cfg = TableConfig("t1", Seq(
      "a" -> "VARCHAR(10)", "b" -> "BIGINT"), Seq.empty)
    val df = Seq(1, 2, 3).toDF("x")
    val m = ExportMetadata.manifest(spark,
      Seq(ExportMetadata.ExportTable("claims", "tmp_ek_t1", cfg, df)),
      queryDate = "2026-01-15")
    val cols = m.filter(col("sheet") === "table_column_formats")
      .orderBy("ordinal_position")
      .select("table_name", "column_name", "ordinal_position",
        "data_type")
      .collect().map(_.toSeq)
    assert(cols.toSeq === Seq(
      Seq("t1", "a", 1, "varchar(10)"),
      Seq("t1", "b", 2, "bigint")))
    val rows = m.filter(col("sheet") === "table_row_counts")
      .select("table_name", "col_count", "row_count")
      .collect().map(_.toSeq)
    assert(rows.toSeq === Seq(Seq("t1", 2, 3L)))
  }
}
