package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Medicare raw-file normalization
  * (db_loader/mcare/00_master_mcare_raw_file_processing.R:40-210) —
  * the dictionary-driven schema-drift repair every CMS delivery goes
  * through before load:
  *
  *  - delimiter SNIFF (:68-73, :131-137): a file whose first line
  *    contains a comma is comma-separated, otherwise pipe;
  *  - file→table mapping: the first dictionary table whose file_name
  *    fragment appears in the (lowercased) file name (:75-79);
  *  - header rename (:145-159): a lowercased file header equal to a
  *    dictionary column's column_name_long or column_name_alt is
  *    renamed to the canonical column_name;
  *  - reorder + NULL pad (:160-161): plyr::rbind.fill against the
  *    dictionary's declared column order — the output carries every
  *    declared column in order, missing ones NULL, and (faithfully)
  *    DROPS file columns the dictionary does not know;
  *  - NEW-column detection (:86-111): file headers not found in the
  *    dictionary are proposed as VARCHAR(255) additions with
  *    column_order continuing from the table's max. The reference's
  *    membership test is R's `any(tcols == col)` — an elementwise
  *    compare against EVERY CELL of the dictionary frame, so a
  *    header equal to any long/alt name (or, absurdly, any other
  *    cell value) counts as known; re-expressed as membership in the
  *    set of all name cells (the type/order cells never collide with
  *    real headers);
  *  - batch year (:190-194): the 4 digits at filename positions
  *    -8..-5, and the maxyear QUIRK — a year beyond the configured
  *    max is reduced by 2 (future-labeled refresh files);
  *  - etl_log entry per file (:196-206): full-year date_min/date_max
  *    from the batch year, the file's row count, the gz name.
  *
  * Scale: the dictionary is vocabulary-sized (broadcast); each file
  * reads once with its declared schema (all-VARCHAR — CMS raw); the
  * sniff is one head() on the text source. The per-file loop is over
  * a DELIVERY's file list (dozens), not data. */
object McareRawNormalize {

  /** One dictionary column row (claims.ref_mcare_files_data_dictionary). */
  case class DictCol(table: String, name: String, nameLong: String,
      nameAlt: Option[String], order: Int)

  /** The :68-73 sniff. */
  def sniffSep(firstLine: String): String =
    if (firstLine.contains(",")) "," else "|"

  /** Canonical name for a lowercased file header (:145-159). */
  def canonical(header: String, dict: Seq[DictCol]): String =
    dict.find(c => c.nameLong == header || c.nameAlt.contains(header))
      .map(_.name).getOrElse(header)

  /** Headers the dictionary does not know, as proposed additions
    * (:86-111): (column_name, column_type, column_order). */
  def newColumns(headers: Seq[String],
      dict: Seq[DictCol]): Seq[(String, String, Int)] = {
    val known = dict.flatMap(c =>
      Seq(c.table, c.name, c.nameLong) ++ c.nameAlt).toSet
    var next = dict.map(_.order).max + 1
    headers.filterNot(known.contains).map { h =>
      val r = (h, "VARCHAR(255)", next); next += 1; r
    }
  }

  /** The :190-194 batch year with the maxyear-2 quirk. */
  def batchYear(fileName: String, maxYear: Int): Int = {
    val y = fileName.takeRight(8).take(4).toInt
    if (y > maxYear) y - 2 else y
  }

  /** Normalize one delivery file: read with the sniffed separator,
    * lowercase + canonicalize headers, project the dictionary's
    * declared columns in order (missing → NULL, unknown dropped).
    * Returns the normalized frame plus the raw header list (for the
    * proposal arm). */
  def normalizeFile(s: SparkSession, path: String,
      dict: Seq[DictCol]): (DataFrame, Seq[String]) = {
    val ordered = dict.sortBy(_.order)
    val firstLine = s.read.text(path).take(1)
    if (firstLine.isEmpty) {
      // an empty delivery (no header line to sniff or read) — the
      // dictionary-shaped empty frame, no headers to propose
      import org.apache.spark.sql.types.{StringType, StructField,
        StructType}
      val empty = s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(ordered.map(c => StructField(c.name, StringType))))
      (empty, Nil)
    } else {
      val sep = sniffSep(firstLine(0).getString(0))
      val raw = s.read.option("header", true).option("sep", sep)
        .csv(path)
      val headers = raw.columns.map(_.toLowerCase).toSeq
      val renamed = raw.toDF(headers.map(h => canonical(h, dict)): _*)
      val have = renamed.columns.toSet
      val out = renamed.select(ordered.map { c =>
        (if (have.contains(c.name)) col(c.name)
         else lit(null).cast("string")).as(c.name)
      }: _*)
      (out, headers)
    }
  }
}
