package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partner-export metadata manifest — the reference prepares every data
  * handoff with a two-sheet metadata workbook: per-column format rows
  * (schema, table, column, ordinal position, rendered SQL type) and
  * per-table row counts (dugan_p1_export/metadata_prep.R:29-70;
  * uw_fresh_export/uw_fresh_cdr_prep_metadata.sql:8-111 adds a per-table
  * column count and a query date to the same shape).
  *
  * The reference reads INFORMATION_SCHEMA / sys.partitions; here the
  * column sheet comes from the YAML-declared [[TableConfig]] schemas
  * (the same declarations that created the tables — there is no separate
  * catalog to drift from) and row counts are one distributed 1-row
  * aggregate per table. Two name fixups ride along exactly as the R
  * does them (metadata_prep.R:46-48,67-69): the `tmp_ek_` working-table
  * prefix is stripped and `icdcm_codes` gains its `ref_` prefix — both
  * via str_replace_all semantics (any occurrence, not just anchored).
  *
  * Scale: the column sheet is bounded metadata (a few hundred rows per
  * export); the row-count arm is table scans reduced to one row each —
  * on Parquet, count(*) is answered from footer statistics.
  */
object ExportMetadata {

  /** One exported table: catalog schema, physical name (before the
    * fixups), declared config, and the live frame to count. */
  case class ExportTable(schema: String, name: String, cfg: TableConfig,
      df: DataFrame)

  /** INFORMATION_SCHEMA-style rendering of a declared SQL type: the
    * reference re-assembles `varchar(n)` / `numeric(p,s)` from the
    * catalog's parts (metadata_prep.R:33-38), which lowercases the
    * type keyword and carries no interior whitespace. */
  def renderType(sqlType: String): String =
    sqlType.trim.toLowerCase.replaceAll("\\s+", "")

  /** metadata_prep.R:46-48: `str_replace_all(name, "tmp_ek_", "")` then
    * `str_replace_all(name, "icdcm_codes", "ref_icdcm_codes")`. */
  def fixName(name: String): String =
    name.replace("tmp_ek_", "").replace("icdcm_codes", "ref_icdcm_codes")

  /** Sheet 1 — `table_column_formats`: one row per declared column. */
  def colMeta(spark: SparkSession, tables: Seq[ExportTable]): DataFrame = {
    import spark.implicits._
    tables.flatMap { tr =>
      tr.cfg.vars.zipWithIndex.map { case ((colName, sqlType), i) =>
        (tr.schema, fixName(tr.name), colName, i + 1, renderType(sqlType))
      }
    }.toDF("table_schema", "table_name", "column_name",
      "ordinal_position", "data_type")
  }

  /** Sheet 2 — `table_row_counts` (with the UW variant's col_count):
    * one distributed count per table, never a collect of data rows. */
  def rowMeta(tables: Seq[ExportTable]): DataFrame =
    tables.map { tr =>
      tr.df.agg(count(lit(1)).as("row_count"))
        .select(lit(tr.schema).as("table_schema"),
          lit(fixName(tr.name)).as("table_name"),
          lit(tr.cfg.vars.size).as("col_count"),
          col("row_count"))
    }.reduce(_ unionByName _)

  /** Both sheets in one frame (the workbook), tagged by sheet name;
    * columns inapplicable to a sheet are NULL. `queryDate` replaces the
    * reference's GETDATE() so the manifest is reproducible. */
  def manifest(spark: SparkSession, tables: Seq[ExportTable],
      queryDate: String): DataFrame = {
    val cols = colMeta(spark, tables)
      .select(lit("table_column_formats").as("sheet"),
        col("table_schema"), col("table_name"), col("column_name"),
        col("ordinal_position"), col("data_type"),
        lit(null).cast("int").as("col_count"),
        lit(null).cast("long").as("row_count"),
        to_date(lit(queryDate)).as("query_date"))
    val rows = rowMeta(tables)
      .select(lit("table_row_counts").as("sheet"),
        col("table_schema"), col("table_name"),
        lit(null).cast("string").as("column_name"),
        lit(null).cast("int").as("ordinal_position"),
        lit(null).cast("string").as("data_type"),
        col("col_count"), col("row_count"),
        to_date(lit(queryDate)).as("query_date"))
    cols.unionByName(rows)
  }
}
