package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ETL load-log bookkeeping — the reference's two metadata logs:
  *
  *  - the APCD/CDR per-FILE log
  *    (apcd_export_import/apcd_import_functions.R): each extract file gets
  *    a log row keyed by an assigned `etl_id`; lifecycle datetimes
  *    (create → download → load → archive → delete) advance as the file
  *    moves through the import, `max_file_num` per (date, schema, table)
  *    marks a table's last file (apcd_etl_get_list:81-101), and after a
  *    load the row count in the file must equal the rows that landed
  *    (apcd_data_load:451-461 — mismatch produces the ERROR string).
  *
  *  - the claims per-BATCH log (scripts_general/etl_log.R): a load request
  *    keyed by (batch_type, data_source, delivery_date) reuses the highest
  *    matching `etl_batch_id` if one exists, else registers latest + 1
  *    (the auto_proceed = T path; interactive confirmation is a driver
  *    concern, not query semantics).
  *
  * Scale: id assignment is the [[graft.operators.StableIds]] discipline —
  * new entries numbered by range-sort + `zipWithIndex` with the prior max
  * riding a 1-row broadcast; everything else is per-key joins and
  * conditional projections on log-sized frames (a log row per FILE of a
  * 100 TB lake is millions of rows at most — but nothing here would care
  * if it were more).
  */
object EtlLog {

  /** Directory scan order of the reference's FTP sweep
    * (apcd_ftp_get_file_list: ref, then stage, then final) — the loop
    * order that makes sequential id assignment deterministic. */
  def schemaRank(schemaCol: Column): Column =
    when(schemaCol === "ref", 0)
      .when(schemaCol === "stage", 1)
      .otherwise(2)

  /** Parse `{schema}.{table}.{NNN}_{yyyymmdd}.csv[.gz]` names: dot-split
    * element 2 is the table and element 3 is `NNN_yyyymmdd` — the first
    * 3 chars the file number, chars 5-12 the date (dashed on the way
    * out). The reference (apcd_ftp_get_file_list:281-293) takes the date
    * at fixed from-end offsets that assume the '.csv.gz' suffix; the
    * dot-split parse is identical for those names and stays correct for
    * plain '.csv' (BatchExport.fileName gz=false), where from-end
    * offsets would silently shift by 3. The schema comes from the
    * directory, not the name — callers supply it. */
  def parsedCols(name: Column): Seq[Column] = Seq(
    element_at(split(name, "\\."), 2).as("file_table"),
    substring(element_at(split(name, "\\."), 3), 1, 3).cast("int")
      .as("file_number"),
    concat_ws("-",
      substring(element_at(split(name, "\\."), 3), 5, 4),
      substring(element_at(split(name, "\\."), 3), 9, 2),
      substring(element_at(split(name, "\\."), 3), 11, 2))
      .as("file_date"))

  /** etl_get_list's max-file join: annotate each row with the highest
    * file number of its (file_date, file_schema, file_table) group. */
  def withMaxFileNum(log: DataFrame): DataFrame = {
    val m = log.groupBy("file_date", "file_schema", "file_table")
      .agg(max(col("file_number")).as("max_file_num"))
    log.join(m, Seq("file_date", "file_schema", "file_table"))
  }

  /** Sequential etl_id for unlogged files: prior max + rank in directory
    * scan order (schema rank, then file name — the reference numbers
    * them one dbExecute at a time in exactly this loop order). `newFiles`
    * must carry `file_name` and `file_schema`. */
  def assignEtlIds(newFiles: DataFrame, log: DataFrame): DataFrame = {
    val prior = log.agg(coalesce(max(col("etl_id")), lit(0L)).as("_mx"))
    val ranked = BatchExport.rowNumbers(
      newFiles.withColumn("_rk", schemaRank(col("file_schema"))),
      Seq("_rk", "file_name"), "_rn")
    ranked.crossJoin(broadcast(prior))
      .withColumn("etl_id", col("_mx") + col("_rn"))
      .drop("_rk", "_rn", "_mx")
  }

  /** Lifecycle status from the datetime columns, most-advanced wins. */
  def statusCol(dtDownload: Column, dtLoad: Column, dtArchive: Column,
      dtDelete: Column): Column =
    when(dtDelete.isNotNull, "deleted")
      .when(dtArchive.isNotNull, "archived")
      .when(dtLoad.isNotNull, "loaded")
      .when(dtDownload.isNotNull, "downloaded")
      .otherwise("created")

  /** The post-load row-count gate (apcd_data_load:451-461): NULL until
    * loaded, 'OK' on match, else the reference's error string verbatim. */
  def loadResultCol(fileName: Column, rowsFile: Column,
      rowsLoaded: Column): Column =
    when(rowsLoaded.isNull, lit(null).cast("string"))
      .when(rowsFile === rowsLoaded, lit("OK"))
      .otherwise(concat(
        lit("ERROR: Row Count of File "), fileName,
        lit(" ("), rowsFile.cast("string"),
        lit(") does NOT MATCH Rows Loaded to SQL Table ("),
        rowsLoaded.cast("string"), lit(")!!!")))

  /** The composed auto-import run — apcd_import_auto.R STEP 2-4 as one
    * transform chain over the log state:
    *
    *  - STEP 2: incoming files not yet logged get entries ('created',
    *    sequential ids in directory-scan order, parsed name fields);
    *  - STEP 3: every entry with no download timestamp (status
    *    'created') downloads → 'downloaded';
    *  - STEP 4: every downloaded-but-unloaded entry loads → 'loaded',
    *    `rows_loaded` = what the load landed (simulated via
    *    `shortBy(file_name)` rows short), and the row-count gate
    *    stamps `load_result` ('OK' or the reference's ERROR string).
    *
    * Entries already loaded/archived/deleted pass through untouched —
    * the selection filters are exactly the reference's
    * `is.na(datetime_download)` / `is.na(datetime_load)` predicates
    * restated on lifecycle status. Returns the post-run log with
    * `max_file_num`, the frame `apcd_etl_get_list` would hand the next
    * run. Pure per-key joins + conditional projections; nothing
    * collects.
    *
    * @param shortBy file_name → rows the simulated load fell short */
  def importChain(log: DataFrame, incoming: DataFrame,
      shortBy: Column => Column): DataFrame = {
    val newFiles = incoming
      .join(log.select("file_name"), Seq("file_name"), "left_anti")
      .select(Seq(col("file_name"), col("file_schema"),
        col("rows_file")) ++ parsedCols(col("file_name")): _*)
    val created = assignEtlIds(newFiles, log)
      .select(col("etl_id"), col("file_name"), col("file_schema"),
        col("file_table"), col("file_number"), col("file_date"),
        lit("created").as("status"), col("rows_file"),
        lit(null).cast("long").as("rows_loaded"),
        lit(null).cast("string").as("load_result"))
    val all = log.unionByName(created)
    val afterDownload = all.withColumn("status",
      when(col("status") === "created", "downloaded")
        .otherwise(col("status")))
    val afterLoad = afterDownload
      .withColumn("rows_loaded",
        when(col("status") === "downloaded",
          col("rows_file") - shortBy(col("file_name")))
          .otherwise(col("rows_loaded")))
      .withColumn("status",
        when(col("status") === "downloaded", "loaded")
          .otherwise(col("status")))
      .withColumn("load_result", loadResultCol(col("file_name"),
        col("rows_file"), col("rows_loaded")))
    withMaxFileNum(afterLoad)
      .select(col("etl_id"), col("file_name"), col("file_schema"),
        col("file_table"), col("file_number"), col("file_date"),
        col("status"), col("max_file_num"), col("rows_file"),
        col("rows_loaded"), col("load_result"))
  }

  /** The caller-facing 'incremental'/'full' argument → the stored label
    * (etl_log.R:93-95 — the comparison against existing entries runs on
    * the MAPPED form, so the mapping is part of the match semantics). */
  def batchTypeLabel(raw: Column): Column =
    when(raw === "incremental", "Incremental refresh")
      .otherwise("Full refresh")

  /** Batch-id assignment with match-reuse (etl_log.R, auto_proceed = T):
    * requests carrying a (batch_type, data_source, delivery_date) already
    * in the log reuse the highest matching etl_batch_id; new keys get
    * latest + 1, + 2, ... in request order, and a repeat of a new key
    * later in the same run reuses the id its first occurrence registered
    * (the sequential loop inserts as it goes, so the second sees the
    * first). `requests` needs the key columns + `request_order`;
    * `log` needs the key columns + `etl_batch_id`. */
  def assignBatchIds(requests: DataFrame, log: DataFrame): DataFrame = {
    val key = Seq("batch_type", "data_source", "delivery_date")
    val logIds = log.groupBy(key.map(col): _*)
      .agg(max(col("etl_batch_id")).as("_log_id"))
    val latest = log.agg(coalesce(max(col("etl_batch_id")), lit(0L))
      .as("_mx"))
    val j = requests.join(logIds, key, "left")
    val newKeys = j.filter(col("_log_id").isNull)
      .groupBy(key.map(col): _*)
      .agg(min(col("request_order")).as("_first"))
    val numbered = BatchExport.rowNumbers(newKeys, Seq("_first"), "_rn")
      .crossJoin(broadcast(latest))
      .select(key.map(col) :+ (col("_mx") + col("_rn")).as("_new_id") :+
        col("_first"): _*)
    j.join(numbered, key, "left")
      .withColumn("etl_batch_id", coalesce(col("_log_id"), col("_new_id")))
      .withColumn("reused", col("_log_id").isNotNull ||
        col("request_order") > col("_first"))
      .drop("_log_id", "_new_id", "_first")
  }
}
