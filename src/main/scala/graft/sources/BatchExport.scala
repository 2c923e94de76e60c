package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Batched table export — the partner-data-exchange write path shared by
  * the reference's APCD and CDR export drivers
  * (apcd_export_import/export_apcd_tables.R:109-176 and
  * db_loader/cdr/99_export_tables.R): a table too large for one extract
  * file is split into numbered batch files. The reference's kernel is
  *
  *  1. a format file derived from INFORMATION_SCHEMA (column name, SQL
  *     type string, ordinal position; `etl_batch_id` excluded),
  *  2. a batch plan — `batches` estimated from storage pages,
  *     `batch_size = round(row_count / batches)`,
  *  3. `ALTER TABLE ... ADD rownum IDENTITY(1,1)`, then batch x exports
  *     `WHERE rownum BETWEEN cur_row AND cur_row + batch_size` with
  *     `cur_row` stepping by `batch_size + 1` — each file carries
  *     batch_size + 1 rows (the reference's BETWEEN is inclusive on both
  *     ends), the last file the remainder,
  *  4. every column exported through `REPLACE(col, CHAR(9), '')` (the
  *     extract is tab-separated, so in-field tabs must go), and
  *  5. files named `{schema}.{table}.{NNN}_{batch_date}.csv` and gzipped.
  *
  * Deviations, both documented: the reference's IDENTITY rownum follows
  * physical row order (nondeterministic); here the caller declares an
  * explicit unique ordering, which is what the batch files need anyway to
  * be reproducible. And `round` here is half-away-from-zero (Spark and
  * DuckDB agree) where R's is half-to-even — they differ only when
  * row_count / batches lands exactly on .5.
  *
  * Scale: the rownum is the [[graft.operators.StableIds]] discipline —
  * range-repartition + in-partition sort + `zipWithIndex` (one extra job
  * over partition SIZES, no unpartitioned window, no driver collect); the
  * batch size rides a 1-row broadcast, and the write is one pass
  * partitioned by file number. Nothing in the path holds more than a
  * partition in memory, so the same plan exports a 100 TB table.
  */
object BatchExport {

  /** Format-file rows from a declared config: (column_name, column_type,
    * 1-based ordinal position), `etl_batch_id` excluded
    * (export_apcd_tables.R:28-63 — the INFORMATION_SCHEMA query keeps
    * declared SQL type strings; positions are post-exclusion, matching
    * the reference's ORDER BY ordinal with the column filtered out). */
  def formatFile(cfg: TableConfig): Seq[(String, String, Int)] =
    cfg.vars.filter(_._1 != "etl_batch_id").zipWithIndex.map {
      case ((name, sqlType), i) => (name, sqlType.trim.toUpperCase, i + 1)
    }

  /** `round(row_count / batches)` as an in-plan column (the scalar rides
    * a 1-row broadcast; no driver round-trip). `batches <= 0` degrades to
    * one whole-table file (export_apcd_tables.R:99-104). */
  def batchSizeCol(rowCount: Column, batches: Int): Column =
    if (batches <= 0) rowCount
    else round(rowCount.cast("double") / batches, 0).cast("long")

  /** Deterministic 1-based row numbers in `orderCols` order — the
    * scale-safe IDENTITY replacement: range-partition on the order key,
    * sort within partitions, fold partition sizes into offsets via
    * `zipWithIndex`. */
  def rowNumbers(df: DataFrame, orderCols: Seq[String],
      outCol: String = "rownum"): DataFrame = {
    val sorted = df.repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val schema = sorted.schema.add(outCol, LongType)
    df.sparkSession.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) =>
        Row.fromSeq(r.toSeq :+ (i + 1L)) }, schema)
  }

  /** File number for a row: the BETWEEN windows step by batch_size + 1,
    * so file x (1-based) covers rownums (x-1)(bs+1)+1 .. x(bs+1). */
  def fileNumberOf(rownum: Column, batchSize: Column): Column =
    floor((rownum - 1) / (batchSize + 1)).cast("long") + 1

  /** `{schema}.{table}.{NNN}_{date}.csv[.gz]`
    * (export_apcd_tables.R:143). */
  def fileName(schemaOut: String, tableOut: String, fileNumber: Column,
      batchDate: String, gz: Boolean = true): Column =
    concat(lit(s"$schemaOut.$tableOut."),
      lpad(fileNumber.cast("string"), 3, "0"),
      lit(s"_$batchDate.csv" + (if (gz) ".gz" else "")))

  /** The per-column export projection: string-cast + in-field tab strip
    * (`REPLACE(col, CHAR(9), '')` over every exported column). */
  def exportCol(c: Column): Column =
    regexp_replace(c.cast("string"), "\t", "")
}
