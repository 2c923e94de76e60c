package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{BatchExport, Bucketing, EtlLog, LoadTable, Scd2, TableConfig}
import graft.queries.Q.t

/** Table-lifecycle catalog: YAML-declared schemas, CSV/ORC source+sink
  * roundtrips, create-table shell, and the incremental-refresh write path
  * (SURVEY §2.1 rows 1, 2, 4, 7, 8). */
object LifecycleQueries {

  /** Per-application scratch root under java.io.tmpdir, cleaned up on JVM
    * exit (shutdown hook) — plus an age-guarded sweep of stale siblings
    * left by crashed runs. The applicationId tag keeps two concurrent
    * same-user sessions from racing on one path (r4); without cleanup each
    * run leaked a fresh tree forever (ADVICE r5).
    *
    * Liveness: each session TOUCHES its root's mtime on every access
    * (files written deep inside a tree do not update the root's mtime, so
    * the root's own timestamp would otherwise go stale under a live
    * long-running query), and the sweep only removes siblings whose root
    * has not been touched for > 6 h — a crashed run's leak is bounded at
    * hours while a live concurrent session refreshing per query is never
    * yanked out from under. */
  private val hooked = scala.collection.mutable.Set.empty[String]
  private def scratchRoot(s: SparkSession, kind: String): String = {
    val tmp = System.getProperty("java.io.tmpdir")
    val prefix = s"graft_${kind}_${sys.props("user.name")}_"
    val cur = s"$prefix${s.sparkContext.applicationId}"
    val staleBefore = System.currentTimeMillis() - 6L * 60 * 60 * 1000
    // a sibling is live if EITHER its root mtime or its fallback
    // heartbeat file is fresh (see below: some filesystems ignore
    // setLastModified on directories)
    def liveStamp(f: java.io.File): Long = math.max(f.lastModified(),
      new java.io.File(f, ".heartbeat").lastModified())
    Option(new java.io.File(tmp).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(prefix) && f.getName != cur &&
        liveStamp(f) < staleBefore)
      .foreach(deleteRecursively)
    val root = new java.io.File(tmp, cur)
    root.mkdirs()
    // liveness heartbeat: setLastModified silently returns false on some
    // filesystems — fall back to touching a heartbeat file inside the
    // root (ordinary file writes update mtime everywhere), so a live
    // session is never swept as stale by a concurrent one
    if (!root.setLastModified(System.currentTimeMillis())) {
      val hb = new java.io.File(root, ".heartbeat")
      java.nio.file.Files.write(hb.toPath, Array.emptyByteArray)
      root.setLastModified(System.currentTimeMillis())
    }
    hooked.synchronized {
      if (hooked.add(root.getPath))
        sys.addShutdownHook(deleteRecursively(root))
    }
    root.getPath
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }

  private val ordersYaml = """
table: stage.orders_export
partition_by: yr
vars:
    o_orderkey: BIGINT
    o_custkey: BIGINT
    o_orderstatus: VARCHAR(1)
    o_totalprice: NUMERIC(12,2)
    o_orderdate: DATE
    o_orderpriority: VARCHAR(15)
"""

  /** §2.1 rows 1/7/8 + §1.4: YAML config -> declared StructType ->
    * create-table shell, CSV export + bcp-style reload, ORC roundtrip —
    * all three paths re-aggregated and compared against the source table.
    * A lossy export/reload (type drift, date formatting, decimal rounding)
    * would break the oracle hash. */
  def q57ConfigCsvOrc(s: SparkSession, dir: String): DataFrame = {
    val cfg = TableConfig.parse(ordersYaml)
    require(cfg.table == "stage.orders_export" && cfg.partitionBy == Seq("yr"))
    val typed = t(s, dir, "orders").select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice").cast("decimal(12,2)").as("o_totalprice"),
      to_date(col("o_orderdate")).as("o_orderdate"),
      col("o_orderpriority"))
    // shell: declared-schema empty frame (create_table.R) — unioning it in
    // proves schema parity between the shell and both reloads
    val shell = TableConfig.emptyFrame(s, cfg).withColumn("fmt", lit("shell"))
    val base = scratchRoot(s, "lifecycle")
    LoadTable.exportCsv(typed, s"$base/csv")
    LoadTable.exportOrc(typed, s"$base/orc")
    val fromCsv = LoadTable.loadCsv(s, s"$base/csv", cfg).withColumn("fmt", lit("csv"))
    val fromOrc = LoadTable.loadLake(s, s"$base/orc", "orc", cfg).withColumn("fmt", lit("orc"))
    shell.unionByName(fromCsv).unionByName(fromOrc)
      .groupBy(col("fmt"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")).cast("double"), 2).as("total"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy(col("fmt"), col("o_orderstatus"))
  }

  private val yearYaml = """
table: stage.claims_by_year
partition_by: yr
vars:
    claim_id: BIGINT
    svc_date: DATE
    charge: NUMERIC(12,2)
table_1996:
    file_path: ignored_1996.txt
    row_count: 999
    vars_1996:
        legacy_flag: VARCHAR(1)
table_1997:
    vars_1997:
        drg_code: VARCHAR(8)
        legacy_flag: VARCHAR(1)
table_1998:
"""

  /** §2.1 year-partitioned config sections (q86): `table_YYYY:`/`vars_YYYY:`
    * blocks declare per-year extra columns; the combine projects each year
    * to the union column list with typed NULLs for the columns that year
    * lacks (load_table.R:290-324,396-416). 1996 carries legacy_flag only,
    * 1997 adds drg_code, 1998 has no extras — so every output column has
    * both populated and NULL-padded years, and a mis-resolved pad moves a
    * count. */
  def q86YearSections(s: SparkSession, dir: String): DataFrame = {
    val cfg = TableConfig.parse(yearYaml)
    require(cfg.yearSections.map(_.year) == Seq(1996, 1997, 1998),
      s"year sections mis-parsed: ${cfg.yearSections}")
    require(cfg.combinedSchema.fieldNames.toSeq ==
      Seq("claim_id", "svc_date", "charge", "legacy_flag", "drg_code"))
    val orders = t(s, dir, "orders")
      .withColumn("svc_date", to_date(col("o_orderdate")))
    def base(y: Int) = orders.filter(year(col("svc_date")) === y)
    val f1996 = base(1996).select(
      col("o_orderkey").as("claim_id"), col("svc_date"),
      col("o_totalprice").as("charge"),
      substring(col("o_orderstatus"), 1, 1).as("legacy_flag"))
    val f1997 = base(1997).select(
      col("o_orderkey").as("claim_id"), col("svc_date"),
      col("o_totalprice").as("charge"),
      concat(lit("D"), (col("o_orderkey") % 9).cast("string")).as("drg_code"),
      substring(col("o_orderstatus"), 1, 1).as("legacy_flag"))
    val f1998 = base(1998).select(
      col("o_orderkey").as("claim_id"), col("svc_date"),
      col("o_totalprice").as("charge"))
    TableConfig.combineYears(cfg,
        Seq(1996 -> f1996, 1997 -> f1997, 1998 -> f1998))
      .groupBy(year(col("svc_date")).as("yr"))
      .agg(count(lit(1)).as("n"),
        count(col("legacy_flag")).as("n_legacy"),
        count(col("drg_code")).as("n_drg"),
        countDistinct(col("drg_code")).as("n_drg_kinds"),
        round(sum(col("charge")).cast("double"), 2).as("total"))
      .orderBy(col("yr"))
  }

  /** §2.1 row 4 + §7.5.6: the monthly incremental-refresh heartbeat.
    * Seed a lake table whose post-cut partitions hold STALE rows
    * (price = -1), then refresh with the true extract (duplicated, to
    * exercise the mcaid UNION-distinct variant) — only the partitions
    * intersecting the refresh window are archived and rewritten. The final
    * aggregate must equal the source table exactly: any unreplaced stale
    * row, lost pre-cut row, or survived duplicate breaks the oracle. */
  def q58IncrementalRefresh(s: SparkSession, dir: String): DataFrame = {
    val cut = "1997-07-01"
    val ordersD = t(s, dir, "orders")
      .withColumn("o_orderdate", to_date(col("o_orderdate")))
    val base = scratchRoot(s, "refresh")
    val stale = ordersD.filter(col("o_orderdate") >= cut)
      .withColumn("o_totalprice", lit(-1.0))
    val initial = ordersD.filter(col("o_orderdate") < cut)
      .unionByName(stale)
      .withColumn("yr", year(col("o_orderdate")))
    LoadTable.fullLoad(initial, s"$base/table", "yr")
    val fresh = ordersD.filter(col("o_orderdate") >= cut)
    LoadTable.incrementalRefresh(s, s"$base/table", s"$base/archive",
      newData = fresh.unionByName(fresh), // duplicate extract
      dateCol = "o_orderdate", partitionCol = "yr", partitionOf = year,
      cutDate = cut, distinctUnion = true)
    s.read.schema(initial.schema).parquet(s"$base/table")
      .groupBy(col("yr"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"),
        countDistinct(col("o_orderkey")).as("n_keys"))
      .orderBy(col("yr"))
  }

  /** §4 co-located join layout: both fact tables written bucketed on the
    * join key, then joined EXCHANGE-FREE (bucket i zips with bucket i; the
    * only shuffle in the plan is the small post-join rollup). The merge
    * hint keeps the demo on the sort-merge path even when one side would
    * broadcast at test scale. */
  def q74BucketedJoin(s: SparkSession, dir: String): DataFrame = {
    // Fixed per-application base dir, overwritten on re-runs within the
    // session, swept + shutdown-hooked by scratchRoot (DROP TABLE leaves
    // external paths behind, and a fresh temp dir per invocation would
    // leak one tree per run).
    val base = scratchRoot(s, "bucketed")
    val tag = Integer.toHexString(base.hashCode)
    Bucketing.writeBucketed(t(s, dir, "orders"),
      s"graft_b_orders_$tag", s"$base/orders", "o_orderkey", 8)
    Bucketing.writeBucketed(t(s, dir, "lineitem"),
      s"graft_b_lineitem_$tag", s"$base/lineitem", "l_orderkey", 8)
    Bucketing.table(s, s"graft_b_lineitem_$tag")
      .join(Bucketing.table(s, s"graft_b_orders_$tag").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice")), 2).as("total"))
      .orderBy(col("o_orderpriority"))
  }

  /** §2.1 CDR multi-char-delimited raw ingestion (q201,
    * db_loader/cdr/00_raw_file_processing.R): a `|@|`-separated extract
    * with a `~@~`-noised HeaderOnly companion is round-tripped — header
    * names sanitized through the reference's replacement chain into the
    * declared all-VARCHAR schema, data read with the multi-char
    * separator, then re-aggregated against the source table (a lossy
    * parse or a mis-sanitized column breaks the oracle hash). */
  def q201CdrRawLoad(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = scratchRoot(s, "cdr_raw")
    t(s, dir, "customer")
      .select(concat_ws("|@|",
        col("c_custkey").cast("string"), col("c_name"),
        col("c_acctbal").cast("string"), col("c_mktsegment"))
        .as("value"))
      .coalesce(1).write.mode("overwrite").text(s"$base/data")
    Seq("Cust Key|@|Name (Legal)|@|Acct-Bal|@|Mkt/Segment, Name~@~")
      .toDF("value").coalesce(1)
      .write.mode("overwrite").text(s"$base/header")
    val loaded = LoadTable.loadCdrRaw(s, s"$base/header", s"$base/data")
    require(loaded.columns.toSeq ==
      Seq("cust_key", "name_legal", "acct_bal", "mkt_segment_name"))
    loaded.groupBy(col("mkt_segment_name"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("acct_bal").cast("double")), 2).as("total_bal"),
        min(col("cust_key").cast("long")).as("min_key"),
        max(col("cust_key").cast("long")).as("max_key"))
      .orderBy(col("mkt_segment_name"))
  }

  private val exportYaml = """
table: final.orders
vars:
    o_orderkey: BIGINT
    o_totalprice: NUMERIC(12,2)
    o_orderdate: DATE
    o_orderpriority: VARCHAR(15)
    etl_batch_id: INT
"""

  /** §2.1 batched table export (q204, export_apcd_tables.R:109-176 /
    * cdr/99_export_tables.R — the shared partner-exchange write path):
    * format file from the declared config (etl_batch_id excluded), batch
    * plan `round(rows / batches)`, deterministic rownum, the reference's
    * BETWEEN windows (batch_size + 1 rows per file), per-column tab
    * strip, numbered gzipped tab-separated files — actually written and
    * re-read, then summarized per file. A wrong batch boundary, a
    * surviving in-field tab, or a lossy csv.gz roundtrip each move a
    * per-file count or checksum. The in-field tab is planted
    * (`priority + TAB + X`) so the strip has something to do. */
  def q204BatchExport(s: SparkSession, dir: String): DataFrame = {
    val cfg = TableConfig.parse(exportYaml)
    val fmt = BatchExport.formatFile(cfg)
    require(fmt == Seq(
      ("o_orderkey", "BIGINT", 1), ("o_totalprice", "NUMERIC(12,2)", 2),
      ("o_orderdate", "DATE", 3), ("o_orderpriority", "VARCHAR(15)", 4)),
      s"format file mis-derived: $fmt")
    val typed = t(s, dir, "orders").select(
      col("o_orderkey"),
      col("o_totalprice").cast("decimal(12,2)").as("o_totalprice"),
      to_date(col("o_orderdate")).as("o_orderdate"),
      concat(col("o_orderpriority"), lit("\t"), lit("X"))
        .as("o_orderpriority"))
    val n = typed.agg(count(lit(1)).as("_n"))
    val staged = BatchExport.rowNumbers(typed, Seq("o_orderkey"))
      .crossJoin(broadcast(n))
      .withColumn("_bs", BatchExport.batchSizeCol(col("_n"), 7))
      .withColumn("file_number",
        BatchExport.fileNumberOf(col("rownum"), col("_bs")))
    val base = scratchRoot(s, "batch_export")
    staged
      .select(col("file_number") +:
        fmt.map { case (c, _, _) => BatchExport.exportCol(col(c)).as(c) }: _*)
      .write.mode("overwrite").partitionBy("file_number")
      .option("sep", "\t").option("compression", "gzip")
      .csv(s"$base/export")
    val backRaw = s.read
      .schema("o_orderkey STRING, o_totalprice STRING, " +
        "o_orderdate STRING, o_orderpriority STRING")
      .option("sep", "\t").csv(s"$base/export")
    // an empty export writes no partition dirs, so the discovered
    // file_number column vanishes — restore it for the empty-slice case
    val back =
      if (backRaw.columns.contains("file_number")) backRaw
      else backRaw.withColumn("file_number", lit(null).cast("long"))
    back
      .withColumn("file_name", BatchExport.fileName("final", "orders",
        col("file_number"), "20260318"))
      .groupBy(col("file_name"))
      .agg(count(lit(1)).as("n"),
        min(col("o_orderkey").cast("long")).as("min_key"),
        max(col("o_orderkey").cast("long")).as("max_key"),
        round(sum(col("o_totalprice").cast("decimal(12,2)"))
          .cast("double"), 2).as("total"),
        sum(length(col("o_orderpriority"))).as("prio_chars"))
      .orderBy(col("file_name"))
  }

  /** One delivery's file series for a table: file numbers 1..k with the
    * batch plan's per-file row counts — file x of the BETWEEN windows
    * carries min(n, x(bs+1)) - (x-1)(bs+1) rows (clamped at 0: a
    * generous plan can run out of rows before files). */
  private def fileSeries(tbl: DataFrame, schemaOut: String,
      tableOut: String, k: Int, date: String): DataFrame =
    tbl.agg(count(lit(1)).as("_n"))
      .withColumn("_bs", BatchExport.batchSizeCol(col("_n"), k))
      .select(col("_n"), col("_bs"),
        explode(sequence(lit(1), lit(k))).as("file_number"))
      .select(
        BatchExport.fileName(schemaOut, tableOut, col("file_number"), date)
          .as("file_name"),
        lit(schemaOut).as("file_schema"), lit(tableOut).as("file_table"),
        col("file_number"),
        lit(s"${date.take(4)}-${date.slice(4, 6)}-${date.drop(6)}")
          .as("file_date"),
        greatest(lit(0L), least(col("_n"),
          col("file_number").cast("long") * (col("_bs") + 1))
          - (col("file_number").cast("long") - 1) * (col("_bs") + 1))
          .as("rows_file"))

  /** §2.1 APCD extract-file ETL log (q205,
    * apcd_export_import/apcd_import_functions.R): a synthetic mid-import
    * moment — two fully retired deliveries (one deleted, one archived),
    * the current delivery partially loaded with one planted row-count
    * mismatch — reconciled against the incoming FTP file list. Pins the
    * file-name parser (dot-split + fixed-position date, dashed), the
    * directory-scan-order sequential etl_id assignment for unlogged
    * files, max_file_num per (date, schema, table), lifecycle status
    * precedence, and the post-load row-count gate incl. the reference's
    * ERROR string verbatim. */
  /** Shared q205/q248 fixture: the mid-import ETL log (two retired
    * deliveries, the current one partially loaded with a planted 5-row
    * shortfall) and the incoming 2026-03-18 FTP list. Returns
    * (log-with-status, incoming). */
  private def apcdEtlFixture(s: SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    val orders = t(s, dir, "orders")
    val customer = t(s, dir, "customer")
    val nation = t(s, dir, "nation")
    // incoming FTP list for delivery 2026-03-18
    val r26 = fileSeries(nation, "ref", "nation", 1, "20260318")
    val c26 = fileSeries(customer, "stage", "customer", 3, "20260318")
    val o26 = fileSeries(orders, "final", "orders", 7, "20260318")
    val incoming = r26.unionByName(c26).unionByName(o26)
    // log fixture: ids follow each section's scan order
    val tsNull = lit(null).cast("timestamp")
    def ts(x: String) = to_timestamp(lit(x))
    def entry(series: DataFrame, idBase: Long, dl: Column, ld: Column,
        ar: Column, de: Column, loadedDelta: Column = lit(0L)) =
      series
        .withColumn("etl_id", lit(idBase) + col("file_number").cast("long"))
        .withColumn("rows_loaded",
          when(ld.isNotNull, col("rows_file") + loadedDelta))
        .withColumn("_dl", dl).withColumn("_ld", ld)
        .withColumn("_ar", ar).withColumn("_de", de)
    val log =
      // 2024-06-01 delivery: loaded, later archived, later deleted
      entry(fileSeries(orders, "final", "orders", 3, "20240601"), 0L,
        ts("2024-06-01 02:00:00"), ts("2024-06-01 03:00:00"),
        ts("2024-12-17 02:00:00"), ts("2026-03-18 02:00:00"))
      // 2024-12-17 delivery: loaded, archived when the new one began
      .unionByName(entry(fileSeries(nation, "ref", "nation", 1, "20241217"),
        3L, ts("2024-12-17 02:00:00"), ts("2024-12-17 03:00:00"),
        ts("2026-03-18 02:00:00"), tsNull))
      .unionByName(entry(
        fileSeries(customer, "stage", "customer", 3, "20241217"), 4L,
        ts("2024-12-17 02:00:00"), ts("2024-12-17 03:00:00"),
        ts("2026-03-18 02:00:00"), tsNull))
      .unionByName(entry(fileSeries(orders, "final", "orders", 7, "20241217"),
        7L, ts("2024-12-17 02:00:00"), ts("2024-12-17 03:00:00"),
        ts("2026-03-18 02:00:00"), tsNull))
      // current delivery, first files already loaded; the customer file
      // landed 5 rows short (the planted row-count-gate failure)
      .unionByName(entry(c26.filter(col("file_number") === 1), 14L,
        ts("2026-03-18 03:00:00"), ts("2026-03-18 04:00:00"),
        tsNull, tsNull, lit(-5L)))
      .unionByName(entry(o26.filter(col("file_number") === 1), 15L,
        ts("2026-03-18 03:00:00"), ts("2026-03-18 04:00:00"),
        tsNull, tsNull))
    val logOut = log.select(col("etl_id"), col("file_name"),
      col("file_schema"), col("file_table"), col("file_number"),
      col("file_date"),
      EtlLog.statusCol(col("_dl"), col("_ld"), col("_ar"), col("_de"))
        .as("status"),
      col("rows_file"), col("rows_loaded"),
      EtlLog.loadResultCol(col("file_name"), col("rows_file"),
        col("rows_loaded")).as("load_result"))
    (logOut, incoming)
  }

  def q205ApcdEtlLog(s: SparkSession, dir: String): DataFrame = {
    val (logOut, incoming) = apcdEtlFixture(s, dir)
    // unlogged incoming files: entries created with sequential ids; the
    // table / number / date come from the PARSER, not the generator
    val newFiles = incoming
      .join(logOut.select("file_name"), Seq("file_name"), "left_anti")
      .select(Seq(col("file_name"), col("file_schema"), col("rows_file"))
        ++ EtlLog.parsedCols(col("file_name")): _*)
    val newOut = EtlLog.assignEtlIds(newFiles, logOut)
      .select(col("etl_id"), col("file_name"), col("file_schema"),
        col("file_table"), col("file_number"), col("file_date"),
        lit("created").as("status"), col("rows_file"),
        lit(null).cast("long").as("rows_loaded"),
        lit(null).cast("string").as("load_result"))
    EtlLog.withMaxFileNum(logOut.unionByName(newOut))
      .select(col("etl_id"), col("file_name"), col("file_schema"),
        col("file_table"), col("file_number"), col("file_date"),
        col("status"), col("max_file_num"), col("rows_file"),
        col("rows_loaded"), col("load_result"))
      .orderBy(col("etl_id"))
  }

  /** The composed APCD auto-import chain (q248,
    * apcd_export_import/apcd_import_auto.R STEP 2-4): starting from the
    * q205 mid-import state, register the remaining incoming files,
    * download everything pending, load everything downloaded, and
    * stamp the row-count gate — one run to completion under one
    * oracle, the q210 chain discipline. A SECOND shortfall is planted
    * on the newly loaded stage.customer file 002 (3 rows short), so
    * the final state carries both the pre-existing ERROR row and one
    * produced by THIS run's load loop. */
  def q248ApcdImportChain(s: SparkSession, dir: String): DataFrame = {
    val (logOut, incoming) = apcdEtlFixture(s, dir)
    val shortBy = (name: Column) =>
      when(name === "stage.customer.002_20260318.csv.gz", 3L)
        .otherwise(0L)
    EtlLog.importChain(logOut, incoming, shortBy)
      .orderBy(col("etl_id"))
  }

  /** §2.1 claims metadata etl_log batch ids (q206,
    * scripts_general/etl_log.R, auto_proceed = T): five load requests —
    * two whose (batch_type, data_source, delivery_date) already exist in
    * the log (reuse the highest matching id), two new keys (latest + 1,
    * + 2 in request order), and a same-run repeat of a new key (reuses
    * the id its first occurrence registered — the sequential loop sees
    * its own inserts). Also pins the 'incremental' → 'Incremental
    * refresh' mapping, which happens BEFORE the match compare. The log
    * derives from the orders table's delivery years, so ids shift with
    * real data. */
  def q206EtlBatchIds(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def src(yr: Column) = when(yr % 3 === 0, "APCD")
      .when(yr % 3 === 1, "Medicaid").otherwise("Medicare")
    def rawType(yr: Column) =
      when(yr % 2 === 0, "full").otherwise("incremental")
    val years = t(s, dir, "orders")
      .select(year(to_date(col("o_orderdate"))).as("yr"))
      .filter(col("yr") <= 1996).distinct()
    val log = years.select(
      (col("yr") - 1991).cast("long").as("etl_batch_id"),
      EtlLog.batchTypeLabel(rawType(col("yr"))).as("batch_type"),
      src(col("yr")).as("data_source"),
      make_date(col("yr"), lit(1), lit(15)).as("delivery_date"))
    val requests = Seq((1, 1995), (2, 1996), (3, 1997), (4, 1997),
        (5, 1998)).toDF("request_order", "yr")
      .select(col("request_order"),
        EtlLog.batchTypeLabel(rawType(col("yr"))).as("batch_type"),
        src(col("yr")).as("data_source"),
        make_date(col("yr"), lit(1), lit(15)).as("delivery_date"))
    EtlLog.assignBatchIds(requests, log)
      .select(col("request_order"), col("batch_type"), col("data_source"),
        col("delivery_date"), col("etl_batch_id"), col("reused"))
      .orderBy(col("request_order"))
  }

  /** §2.1 CDR raw-byte sanitize + record-terminator accounting (q208,
    * db_loader/cdr/file_prep.R): the reference streams gzipped blobs,
    * counts `~@~` record terminators byte-wise, and replaces every byte
    * outside printable ASCII (0x20-0x7E) with a space before loading.
    * Here: records with PLANTED control bytes (BEL/LF via translate) are
    * assembled into per-bucket blobs with the `~@~` terminator, the
    * terminator count is checked against the record count (the
    * reference's row-count QA), the blob is sanitized with the same
    * [^\x20-\x7E] -> space rule, split back into records and fields, and
    * re-aggregated. The space-count column catches a sanitize that
    * leaves control bytes in place (lengths alone would not move).
    *
    * Blob assembly is the harness's stand-in for the byte stream —
    * per-bucket kilobytes here; the sanitize/split/parse pipeline itself
    * is one pass, no shuffle before the final rollup. */
  def q208CdrFilePrep(s: SparkSession, dir: String): DataFrame = {
    val recs = t(s, dir, "customer").select(
      (col("c_custkey") % 50).as("blob_id"),
      concat_ws("|@|",
        col("c_custkey").cast("string"),
        translate(col("c_name"), "er", "\u0007\n"),
        col("c_acctbal").cast("decimal(12,2)").cast("string"),
        col("c_mktsegment")).as("rec"))
    val blobs = recs.groupBy(col("blob_id"))
      .agg(concat_ws("~@~", collect_list(col("rec"))).as("_b"),
        count(lit(1)).as("_n"))
      .select(col("blob_id"), concat(col("_b"), lit("~@~")).as("blob"),
        col("_n"))
    val terms = (length(col("blob")) -
      length(expr("replace(blob, '~@~', '')"))) / 3
    val ok = blobs.agg(
      (sum(when(terms.cast("long") === col("_n"), 0L).otherwise(1L)) === 0L)
        .as("terminators_ok"))
    val parsed = blobs
      .select(explode(split(
        regexp_replace(col("blob"), "[^\\x20-\\x7E]", " "), "~@~"))
        .as("rec"))
      .filter(length(col("rec")) > 0)
      .select(split(col("rec"), "\\|@\\|").as("f"))
      .select(element_at(col("f"), 1).cast("long").as("custkey"),
        element_at(col("f"), 2).as("name"),
        element_at(col("f"), 3).cast("decimal(12,2)").as("bal"),
        element_at(col("f"), 4).as("seg"))
    parsed.groupBy(col("seg"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("bal")).cast("double"), 2).as("total"),
        sum(length(col("name"))).as("name_chars"),
        sum(length(col("name")) -
          length(expr("replace(name, ' ', '')"))).as("name_spaces"),
        min(col("custkey")).as("min_key"),
        max(col("custkey")).as("max_key"))
      .crossJoin(broadcast(ok))
      .orderBy(col("seg"))
  }

  /** §2.1 incremental SCD type-2 merge (q218): the *_timevar history
    * shape updated IN PLACE from a delta extract instead of the
    * reference's from-scratch monthly rebuild. Fixture: every customer
    * has an open segment version (some with closed history), the delta
    * changes the odd-key customers' segment, re-states the even keys
    * unchanged (must NOT version), skips every third id (absence is not
    * a change), and introduces brand-new ids. Every branch lands rows
    * whose dates pin it. */
  def q218Scd2Merge(s: SparkSession, dir: String): DataFrame =
    mergedDim(s, dir).orderBy(col("id"), col("from_date"))

  /** The q218/q222 shared post-merge versioned dimension. */
  private def mergedDim(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "customer").select(
      col("c_custkey").as("id"), col("c_mktsegment").as("seg"))
    val openRows = base.select(col("id"), col("seg"),
      to_date(lit("1997-01-01")).as("from_date"),
      lit(null).cast("date").as("to_date"))
    val closedRows = base.filter(col("id") % 4 === 0)
      .select(col("id"), concat(lit("OLD_"), col("seg")).as("seg"),
        to_date(lit("1995-01-01")).as("from_date"),
        to_date(lit("1996-12-31")).as("to_date"))
    val dim = closedRows.unionByName(openRows)
    val delta = base.filter(col("id") % 3 =!= 0)
      .select(col("id"),
        when(col("id") % 2 === 1, concat(lit("NEW_"), col("seg")))
          .otherwise(col("seg")).as("seg"))
      .unionByName(base.filter(col("id") % 10 === 0)
        .select((col("id") + 1000000L).as("id"), col("seg")))
      .withColumn("eff_date", to_date(lit("1998-06-01")))
    Scd2.merge(dim, delta, "id", Seq("seg"), "eff_date")
  }

  /** Versioned-dim point-in-time enrichment (q222): orders enriched
    * with the segment version VALID AT their date against the q218
    * merged dimension — the SCD-2 consumer. For a well-formed history
    * at most one version matches, so this is a plain id equi-join with
    * the interval predicate in the ON clause (no argmax, no window);
    * events before any version keep NULL. The CHAIN (merge -> enrich)
    * is pinned under one oracle. */
  def q222VersionedEnrich(s: SparkSession, dir: String): DataFrame = {
    val dim = mergedDim(s, dir)
    val events = t(s, dir, "orders").select(
      col("o_orderkey").as("event_id"), col("o_custkey").as("id"),
      to_date(col("o_orderdate")).as("edate"))
    events.join(dim,
        events("id") === dim("id") &&
          col("from_date") <= col("edate") &&
          (col("to_date").isNull || col("edate") <= col("to_date")),
        "left")
      .groupBy(coalesce(col("seg"), lit("NO_VERSION")).as("seg_at_date"))
      .agg(count(lit(1)).as("n_events"),
        min(col("edate")).as("first_event"),
        max(col("edate")).as("last_event"))
      .orderBy(col("seg_at_date"))
  }

  /** Data-year delete audit (q237,
    * db_loader/mcaid/mcaid_delete_data_year.R): the expiring-DUA
    * delete run over a four-table manifest — an elig-style table keyed
    * on int-yyyymm CLNDR_YEAR_MNTH, two claim-style tables keyed on
    * DATE columns (FROM_SRVC_DATE / first_service_date), and one table
    * whose date column the script does not recognize and therefore
    * SKIPS (the reference's `next` branch, :60-66). One audit row per
    * table mirrors the script's old-vs-new row-count bookkeeping
    * (:109-131), extended with kept-row pins (min/max surviving date
    * rendering + key sum) so the hash verifies WHICH rows survived,
    * not just how many.
    *
    * Scale: per table one scan + two 1-row aggregates (broadcast
    * cross of the before/after counts); the delete itself is the
    * row-local prefix filter — partition-prunable on a
    * year-partitioned layout. */
  def q237DeleteDataYear(s: SparkSession, dir: String): DataFrame = {
    val deleteYear = 1995
    val elig = t(s, dir, "orders").select(
      col("o_orderkey").as("key"),
      (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
        .cast("int").as("CLNDR_YEAR_MNTH"))
    val claims = t(s, dir, "lineitem").select(
      col("l_orderkey").as("key"),
      to_date(col("l_shipdate")).as("FROM_SRVC_DATE"))
    val header = t(s, dir, "orders").select(
      col("o_orderkey").as("key"),
      to_date(col("o_orderdate")).as("first_service_date"))
    val other = t(s, dir, "orders").select(
      col("o_orderkey").as("key"),
      to_date(col("o_orderdate")).as("etl_batch_date"))

    def audit(name: String, df: DataFrame, dateCol: String): DataFrame = {
      val kept = LoadTable.deleteDataYear(df, dateCol, deleteYear)
      val action = if (kept.isDefined) "deleted" else "skipped"
      val after = kept.getOrElse(df)
      val oldCnt = df.agg(count(lit(1)).as("old_rows"))
      val newAgg = after.agg(count(lit(1)).as("new_rows"),
        min(col(dateCol).cast("string")).as("kept_min"),
        max(col(dateCol).cast("string")).as("kept_max"),
        sum(col("key")).as("kept_key_sum"))
      oldCnt.crossJoin(broadcast(newAgg))
        .select(lit(name).as("table_name"),
          lit(dateCol).as("date_column"), lit(action).as("action"),
          col("old_rows"), col("new_rows"), col("kept_min"),
          col("kept_max"), col("kept_key_sum"))
    }

    audit("mcaid_elig", elig, "CLNDR_YEAR_MNTH")
      .unionByName(audit("mcaid_claim", claims, "FROM_SRVC_DATE"))
      .unionByName(audit("mcaid_claim_header", header,
        "first_service_date"))
      .unionByName(audit("mcaid_other", other, "etl_batch_date"))
      .orderBy(col("table_name"))
  }

  /** Partner-export metadata manifest (q238,
    * dugan_p1_export/metadata_prep.R + uw_fresh_export/
    * uw_fresh_cdr_prep_metadata.sql): the two-sheet export workbook —
    * per-column format rows rendered INFORMATION_SCHEMA-style from the
    * YAML-declared schemas, and per-table row/column counts — with the
    * reference's name fixups (tmp_ek_ prefix strip, icdcm_codes →
    * ref_icdcm_codes) and a pinned query date standing in for
    * GETDATE(). */
  def q238ExportMetadata(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.ExportMetadata
    import graft.sources.ExportMetadata.ExportTable
    val claimCfg = TableConfig("mcaid_claim_header", Seq(
      "id_mcaid" -> "VARCHAR(255)",
      "claim_header_id" -> "BIGINT",
      "first_service_date" -> "DATE",
      "claim_type_id" -> "TINYINT",
      "paid_amount" -> "NUMERIC(38, 2)"), Seq.empty)
    val icdcmCfg = TableConfig("icdcm_codes", Seq(
      "icdcm" -> "VARCHAR(255)",
      "icdcm_version" -> "SMALLINT",
      "ccw_heart_failure" -> "TINYINT"), Seq.empty)
    val dateCfg = TableConfig("ref_date", Seq(
      "date" -> "DATE",
      "first_day_month" -> "DATE",
      "last_day_month" -> "DATE"), Seq.empty)
    ExportMetadata.manifest(s, Seq(
        ExportTable("claims", "tmp_ek_mcaid_claim_header", claimCfg,
          t(s, dir, "orders")),
        ExportTable("ref", "icdcm_codes", icdcmCfg,
          t(s, dir, "region")),
        ExportTable("ref", "ref_date", dateCfg,
          t(s, dir, "nation"))),
      queryDate = "2026-01-15")
      .orderBy(col("sheet"), col("table_schema"), col("table_name"),
        col("ordinal_position"))
  }

  /** Snapshot diff (q240, the row-level generalization of the
    * reference's prior-load QA — qa_stage.mcaid_claim_header.R:150-199
    * count monotonicity, qa_load_file.R:384-415 load reconciliation):
    * the prior orders snapshot vs a mutated current one — every 97th
    * key removed, every 13th surviving key's status flipped (changed),
    * a shifted-key slice appended (added) — classified by ONE
    * key-partitioned full-outer join with null-safe payload equality.
    * Output: per-status counts + key-sum/min/max membership pins. */
  def q240SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val prev = t(s, dir, "orders").select(col("o_orderkey"),
      col("o_orderstatus"), col("o_orderpriority"))
    val survivors = prev.filter(col("o_orderkey") % 97 =!= 0)
    val cur = survivors
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 13 === 0, lit("X"))
          .otherwise(col("o_orderstatus")))
      .unionByName(prev.filter(col("o_orderkey") % 101 === 0)
        .select((col("o_orderkey") + 30000000L).as("o_orderkey"),
          col("o_orderstatus"), col("o_orderpriority")))
    graft.operators.SnapshotDiff.diff(prev, cur, Seq("o_orderkey"),
        Seq("o_orderstatus", "o_orderpriority"))
      .groupBy(col("diff_status"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_orderkey")).as("key_sum"),
        min(col("o_orderkey")).as("key_min"),
        max(col("o_orderkey")).as("key_max"))
      .orderBy(col("diff_status"))
  }

  /** Z-order layout skipping audit (q242, operators/ZOrder): the same
    * 1024-file budget laid out two ways over (x, y) = (l_partkey,
    * l_suppkey) mod 1024 — Morton-code prefix buckets vs a
    * single-column (x-prefix) sort — then a 100x100 rectangle probe
    * counts the files and rows a min/max-pruning scan must touch under
    * each. The z-layout's boxes are tight in BOTH dimensions, so it
    * touches ~16 files where the single-column layout touches ~100
    * and reads every y for them. */
  def q242ZorderLayout(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.ZOrder
    val pts = t(s, dir, "lineitem").select(
      (col("l_partkey") % 1024).as("x"),
      (col("l_suppkey") % 1024).as("y"))
    val zcode = ZOrder.interleaveBits(col("x"), col("y"), 10)
    val zStats = ZOrder.bucketStats(pts, "x", "y",
      shiftright(zcode, 10))
    val lexStats = ZOrder.bucketStats(pts, "x", "y", col("x"))
    val (x0, x1, y0, y1) = (100L, 199L, 300L, 399L)
    def audit(name: String, stats: DataFrame): DataFrame = {
      val touched = ZOrder.probeTouch(stats, x0, x1, y0, y1)
        .agg(count(lit(1)).as("buckets_touched"),
          sum(col("n_rows")).as("rows_touched"))
      val all = stats.agg(count(lit(1)).as("n_buckets"),
        sum(col("n_rows")).as("total_rows"))
      all.crossJoin(broadcast(touched))
        .select(lit(name).as("layout"), col("n_buckets"),
          col("buckets_touched"), col("rows_touched"),
          col("total_rows"))
    }
    audit("zorder", zStats).unionByName(audit("lex_x", lexStats))
      .orderBy(col("layout"))
  }

  /** §2.1 ICD-10-CM master refresh (q282,
    * ref/tables/combine_icdcm_codes.R:1-61): five CMS order files
    * (2019-2023) written as REAL fixed-width text and read back, the
    * fixed-position parse (code at 7-12, short description at 17-77,
    * order number / valid flag / long-description tail skipped), the
    * pre-trim exact-duplicate drop in year order, str_trim + ver = 10,
    * and the keep-first combine against the existing master (old rows
    * beat new; among new, the earliest year's description wins). The
    * fixture plants per-year membership gaps, per-year description
    * drift (pk % 5), ICD-9 old rows, and old ICD-10 rows colliding
    * with new-year codes so every keep-first branch lands rows. */
  def q282IcdcmRefresh(s: SparkSession, dir: String): DataFrame =
    icdcmMaster(s, dir, plantD = false)
      .orderBy(col("ver"), col("icdcode"))

  /** The q282 combine, reusable as q326's input stage. `plantD` adds
    * the enrichment fixture's D-code families to the `old` arm —
    * 6-char siblings D…A/D…B (pk%20==5) and 7-char siblings
    * D…XA/D…XB (pk%20==15) — so the CCS neighbor fill has codes whose
    * lexicographic neighbor shares a 5- resp. 6-digit prefix (the
    * load_ref.icdcm_codes.R:596-603 cascade's longest branches, which
    * the ≤6-char A/B/C shapes alone can never fire). */
  private[queries] def icdcmMaster(s: SparkSession, dir: String,
      plantD: Boolean): DataFrame = {
    val pk = col("pk")
    val base = t(s, dir, "part")
      .select((col("p_partkey") % 400).as("pk")).distinct()
    val code = when(pk % 3 === 0,
        concat(lit("A"), lpad(pk.cast("string"), 4, "0")))
      .when(pk % 3 === 1,
        concat(lit("B"), lpad(pk.cast("string"), 4, "0"), lit("X")))
      .otherwise(concat(lit("C"), lpad(pk.cast("string"), 3, "0")))
    val work = java.nio.file.Files.createTempDirectory("graft_icd")
    val years = (2019 to 2023).map { y =>
      val desc = when(pk % 5 === 0,
          concat(lit("DESC "), code, lit(" REV "), lit(y - 2019)))
        .otherwise(concat(lit("DESC "), code))
      // 1-5 order number, 6 space, 7-12 code (space-padded), 13 space,
      // 14 HIPAA flag, 15-16 spaces, 17-77 description, 78+ long tail
      val line = concat(lpad(pk.cast("string"), 5, "0"), lit(" "),
        rpad(code, 6, " "), lit(" "), (pk % 2).cast("string"), lit("  "),
        rpad(desc, 61, " "), lit("LONGTAIL9"))
      val path = s"$work/icd10cm_order_$y.txt"
      base.filter((pk + y) % 7 =!= 0).select(line.as("value"))
        .coalesce(1).write.mode("overwrite").text(path)
      y -> s.read.text(path)
    }
    val old9 = base.filter(pk % 2 === 0).select(
      concat(lit("9"), lpad(pk.cast("string"), 3, "0")).as("icdcode"),
      concat(lit("ICD9 "), lpad(pk.cast("string"), 3, "0"))
        .as("dx_description"),
      lit(9).as("ver"))
    val old10 = base.filter(pk % 6 === 0).select(
      code.as("icdcode"),
      concat(lit("OLD "), code).as("dx_description"),
      lit(10).as("ver"))
    def dRows(m: Int, sfxs: Seq[String]): DataFrame = sfxs.map { sf =>
      base.filter(pk % 20 === m).select(
        concat(lit("D"), lpad(pk.cast("string"), 4, "0"), lit(sf))
          .as("icdcode"),
        concat(lit("DX D"), lpad(pk.cast("string"), 4, "0"), lit(sf))
          .as("dx_description"),
        lit(10).as("ver"))
    }.reduce(_ unionByName _)
    val old = old9.unionByName(old10)
    val oldAll = if (plantD)
        old.unionByName(dRows(5, Seq("A", "B")))
          .unionByName(dRows(15, Seq("XA", "XB")))
      else old
    graft.sources.RefTables.combineIcdcm(years, oldAll)
  }

  /** Shared q283/q285 fixture: the APCD provider_master table (ids
    * divisible by 10, with a PLANTED bad-length NPI on ids divisible
    * by 50 — provider_master NPIs are NOT charclass-gated in the
    * reference, so the QA battery must catch them) and the provider
    * table (seven orig_npi shapes: too-short, leading-zero, NULL,
    * alphabetic, a rarer valid '1…' NPI — the reference's NPI-typo QA
    * provider — and the common valid '2…' NPI built on pid % 60 so
    * two providers SHARE one NPI, the reference's other QA plant). */
  private def providerNpiFrames(s: SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    val ck = col("c_custkey")
    val cust = t(s, dir, "customer")
    val master = cust.select((ck % 120).as("provider_id_apcd")).distinct()
      .filter(col("provider_id_apcd") % 10 === 0)
      .select(col("provider_id_apcd"),
        when(col("provider_id_apcd") % 50 === 0, lit(12345L))
          .otherwise(lit(1000000000L) + col("provider_id_apcd"))
          .as("npi"))
    val pid = ck % 120
    val provider = cust.select(pid.as("provider_id_apcd"),
      when(ck % 7 === 0, lit("12345"))
        .when(ck % 7 === 1,
          concat(lit("0"), lpad((pid * 31).cast("string"), 9, "0")))
        .when(ck % 7 === 2, lit(null).cast("string"))
        .when(ck % 7 === 3,
          concat(lit("ABC"), lpad(pid.cast("string"), 7, "0")))
        .when(ck % 7 === 4,
          concat(lit("1"), lpad((pid * 13).cast("string"), 9, "0")))
        .otherwise(
          concat(lit("2"), lpad((pid % 60).cast("string"), 9, "0")))
        .as("orig_npi"))
    (master, provider)
  }

  /** §2.1 APCD provider NPI master (q283,
    * ref/tables/load_ref.apcd_provider_npi.R:13-88): provider_master
    * distinct w/ flag 1, the ten-digit charclass NPI gate, the
    * most-common-NPI pick (rank by row_count DESC, npi ASC — the q13
    * mode kernel), master-exclusion anti-join, flag-0 arm, UNION
    * distinct. */
  def q283ApcdProviderNpi(s: SparkSession, dir: String): DataFrame = {
    val (master, provider) = providerNpiFrames(s, dir)
    graft.sources.RefTables.apcdProviderNpi(master, provider)
      .orderBy(col("provider_id_apcd"), col("npi"))
  }

  /** §5 provider-NPI table QA (q285, qa_ref.apcd_provider_npi.sql):
    * providers with >1 row (expect 0 — the NPI-typo guard) and NPIs
    * whose digit length is not ten (catches the reference's ungated
    * provider_master NPIs; the fixture plants three). */
  def q285ProviderNpiQa(s: SparkSession, dir: String): DataFrame = {
    val (master, provider) = providerNpiFrames(s, dir)
    graft.sources.RefTables.apcdProviderNpiQa(
        graft.sources.RefTables.apcdProviderNpi(master, provider))
      .orderBy(col("qa_type"))
  }

  /** §5 ethnicity→race map update check (q284,
    * ref/tables/load_ref.apcd_ethnicity_race_map_update_check.sql):
    * distinct eligibility ethnicity ids whose map join found no race —
    * including the reference's quirk that the ethnicity_id2 probe
    * JOINS ON ethnicity_id1 (kept faithfully, documented in
    * RefTables.ethnicityMapCheck). */
  def q284EthnicityMapCheck(s: SparkSession, dir: String): DataFrame = {
    val ck = col("c_custkey")
    val elig = t(s, dir, "customer").select(
      (ck % 30).cast("bigint").as("ethnicity_id1"),
      ((ck * 7) % 37).cast("bigint").as("ethnicity_id2"))
    graft.sources.RefTables.ethnicityMapCheck(elig,
        ethnicityMapRows(s, dir))
      .orderBy(col("variable"), col("unmapped_id"))
  }

  /** Shared q284/q327 fixture: the APCD ethnicity→race crosswalk rows
    * (apcd_ethnicity_race_mapping.csv's shape) — q284 consumes them
    * as the check's map, q327 as the load's file content, pinning the
    * load and its update-check as siblings over ONE derivation. */
  private def ethnicityMapRows(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select((col("c_custkey") % 25).cast("bigint").as("ethnicity_id"))
      .distinct()
      .select(col("ethnicity_id"),
        concat(lit("ETH "), col("ethnicity_id").cast("string"))
          .as("ethnicity_desc"),
        (col("ethnicity_id") % 5).as("race_id"),
        concat(lit("RACE "), (col("ethnicity_id") % 5).cast("string"))
          .as("race_desc"))

  /** §2.1 ref.date dimension build (q290, ref/tables/load_ref.date.sql):
    * the calendar table with T-SQL DATEFIRST-7 weekday semantics, the
    * day-suffix integer-division quirk, DATEPART(week) weeks,
    * nth-weekday-of-month windows, month/quarter/year bounds, and the
    * federal-holiday update. Span derives from the data: Jan 1 of the
    * first order year through Dec 31 of the last + 1. */
  def q290DateDim(s: SparkSession, dir: String): DataFrame = {
    val yr = t(s, dir, "orders")
      .agg(min(year(to_date(col("o_orderdate")))).as("y0"),
        max(year(to_date(col("o_orderdate")))).as("y1")).head()
    // empty source -> deterministic one-year 1992 calendar (a
    // date-window build over an empty slice must not throw at 100 TB;
    // the empty-input sweep pins it; zero years would flip Spark's
    // sequence() into its descending-step mode)
    val (y0, y1) = if (yr.isNullAt(0)) (1992, 1991)
      else (yr.getInt(0), yr.getInt(1))
    graft.sources.RefTables.dateDim(s, s"$y0-01-01", y1 - y0 + 2)
      .orderBy(col("date"))
  }

  /** §5 ref.date consistency battery (q291, qa_ref.date.sql): the
    * packed integer keys and the year column vs their recomputation
    * from [date] — the reference's nine scans fused into one. */
  def q291DateDimQa(s: SparkSession, dir: String): DataFrame = {
    val yr = t(s, dir, "orders")
      .agg(min(year(to_date(col("o_orderdate")))).as("y0"),
        max(year(to_date(col("o_orderdate")))).as("y1")).head()
    val (y0, y1) = if (yr.isNullAt(0)) (1992, 1991)
      else (yr.getInt(0), yr.getInt(1))
    graft.sources.RefTables.dateDimQa(
        graft.sources.RefTables.dateDim(s, s"$y0-01-01", y1 - y0 + 2))
      .orderBy(col("qa_item"))
  }

  /** Shared q308/q309 RAC workbook sheet fixtures (the four tmp tables
    * load_ref.mcaid_rac_code.R:14-27 stages): per-RAC fund source,
    * detailed codes with planted gaps (% 11), the elig-value grouping
    * with '--' MAGI and both-NULL title-flag values (ev 11 hits the
    * alternate-benefit 'N' arm), and the BSP sheet whose CID cycles
    * through the four full-benefit CIDs plus two others. */
  private[queries] object Rac {
    def rk(s: SparkSession, dir: String) = t(s, dir, "part")
      .select((col("p_partkey") % 120).as("rk")).distinct()
    def fundSource(s: SparkSession, dir: String): DataFrame =
      rk(s, dir).select(col("rk").as("rac_code"),
        concat(lit("RAC "), col("rk").cast("string")).as("rac_desc"),
        when(col("rk") % 4 === 0, "Federal")
          .when(col("rk") % 4 === 1, "Title XXI")
          .when(col("rk") % 4 === 2, "State Only")
          .otherwise("Local").as("fund_source_code"))
    def detailed(s: SparkSession, dir: String): DataFrame =
      rk(s, dir).filter(col("rk") % 11 =!= 0)
        .select(col("rk").as("rac_code"),
          (col("rk") % 20).as("elig_value"),
          (col("rk") % 7).as("sub_elig_value"))
    def grouping(s: SparkSession, dir: String): DataFrame = {
      val ev = col("ev")
      rk(s, dir).select((col("rk") % 20).as("ev")).distinct()
        .filter(ev % 9 =!= 8)
        .select(ev.as("elig_value"),
          concat(lit("CAT "), ev.cast("string")).as("category"),
          when(ev % 3 === 0, "Y").when(ev % 3 === 1, "N")
            .as("title_xix_full"),
          when(ev % 2 === 0, "Y").otherwise("N").as("title_xix_limited"),
          when(ev % 5 === 0, "Y").when(ev % 5 =!= 1, "N")
            .as("title_xxi_full"),
          when(ev % 2 === 1, "Y").otherwise("N").as("legacy_mcs"),
          when(ev % 4 === 0, "--").when(ev % 4 === 1, "Y").otherwise("N")
            .as("magi"),
          concat(lit("GRP "), (ev % 3).cast("string"))
            .as("major_cov_grp"))
    }
    def bsp(s: SparkSession, dir: String): DataFrame = {
      val cid = element_at(
        array(lit(1003960), lit(1003956), lit(10066833), lit(1003962),
          lit(555), lit(666)), (col("rk") % 6).cast("int") + 1)
      rk(s, dir).filter(col("rk") % 13 =!= 1)
        .select(col("rk").as("rac_code"),
          concat(lit("B"), (col("rk") % 6).cast("string"))
            .as("bsp_group_abbrev"),
          concat(lit("BSP "), (col("rk") % 6).cast("string"))
            .as("bsp_group_name"),
          cid.as("bsp_group_cid"))
    }
  }

  /** §2.1 mcaid RAC-code reference build (q308,
    * load_ref.mcaid_rac_code.sql:43-110 over the R-staged sheets):
    * three broadcast left joins on cast keys, the elig-14 category
    * override, MAGI '--' → NULL, and both benefit CASEs. */
  def q308RacCode(s: SparkSession, dir: String): DataFrame =
    graft.sources.RefTables.racCode(Rac.fundSource(s, dir),
        Rac.detailed(s, dir), Rac.grouping(s, dir), Rac.bsp(s, dir))
      .orderBy(col("rac_code"))

  /** §5 RAC-code QA (q309, qa_ref.mcaid_rac_code.sql:1-36): the three
    * NumRows histograms over the BSP sheet's pairings — VERBATIM first
    * (the reference DISTINCTs a pair then GROUPs BY the same pair, so
    * NumRows is identically 1 — a vacuous check as written, kept
    * faithfully), then the evidently-INTENDED per-key histograms
    * (values per rac_code / bsp_group_cid / bsp_group_abbrev) that
    * actually detect a key mapping to two values. */
  def q309RacCodeQa(s: SparkSession, dir: String): DataFrame = {
    val bsp = Rac.bsp(s, dir).localCheckpoint(true)
    def hist(label: String, keys: Seq[String],
        full: Seq[String]): DataFrame = {
      val pairs = bsp.select(full.map(col): _*).distinct()
      pairs.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("num_rows"))
        .groupBy(col("num_rows"))
        .agg(count(lit(1)).as("n"))
        .select(lit(label).as("qa_item"), col("num_rows"), col("n"))
    }
    val rc = Seq("rac_code", "bsp_group_cid")
    val ca = Seq("bsp_group_cid", "bsp_group_abbrev")
    val an = Seq("bsp_group_abbrev", "bsp_group_name")
    hist("verbatim rac_code-bsp_group_cid", rc, rc)
      .unionByName(hist("verbatim bsp_group_cid-bsp_group_abbrev", ca, ca))
      .unionByName(hist("verbatim bsp_group_abbrev-bsp_group_name", an, an))
      .unionByName(hist("intended rac_code-bsp_group_cid", rc.take(1), rc))
      .unionByName(hist("intended bsp_group_cid-bsp_group_abbrev",
        ca.take(1), ca))
      .unionByName(hist("intended bsp_group_abbrev-bsp_group_name",
        an.take(1), an))
      .orderBy(col("qa_item"), col("num_rows"))
  }

  /** §2.1 King County provider master (q310,
    * load_ref.kc_provider_master.sql:1-128): the APCD master slice
    * unioned with the derived slice — charclass NPI gate, per-NPI mode
    * picks for entity/zip and the TOP-2 taxonomy mode, master
    * anti-join. Fixture plants invalid NPIs (leading zero, free text),
    * short zips/taxonomies, and NPIs 400-599 that exist only in the
    * raw feed so the anti-join keeps real rows. */
  def q310KcProviderMaster(s: SparkSession, dir: String): DataFrame = {
    val pk = col("p_partkey")
    val master = t(s, dir, "part").filter(pk % 5 === 0).select(
      (lit(1000000000L) + pk % 400).as("npi"),
      when(pk % 2 === 0, "Organization").otherwise("Person")
        .as("entity_type"),
      when(pk % 7 === 0, "981")
        .otherwise(concat(lit("98"), lpad((pk % 999).cast("string"), 3,
          "0"))).as("zip_physical"),
      when(pk % 9 === 0, "-1").when(pk % 9 === 1, "-2")
        .otherwise(concat(lit("207Q00000"), (pk % 10).cast("string")))
        .as("primary_taxonomy"),
      when(pk % 8 === 0, "-2")
        .otherwise(concat(lit("208D00000"), (pk % 10).cast("string")))
        .as("secondary_taxonomy_physical"))
    val ok = col("o_orderkey")
    val raw = t(s, dir, "orders").select(
      when(ok % 13 === 0,
        concat(lit("0"), (ok % 1000000000L).cast("string")))
        .when(ok % 17 === 0, lit("NOTANPI"))
        .otherwise((lit(1000000000L) + col("o_custkey") % 600)
          .cast("string")).as("orig_npi"),
      when(ok % 23 === 0, lit(null).cast("string"))
        .when(ok % 3 === 0, "Person").otherwise("Organization")
        .as("entity_type"),
      when(ok % 11 === 0, "98")
        .otherwise(concat(lit("98"),
          lpad((col("o_custkey") % 999).cast("string"), 3, "0")))
        .as("zip"),
      when(ok % 7 === 0, "SHORT")
        .otherwise(concat(lit("2084P0800"), (ok % 3).cast("string")))
        .as("primary_specialty_code"))
    graft.sources.RefTables.kcProviderMaster(master, raw)
      .orderBy(col("npi"), col("apcd_provider_master_flag"))
  }

  /** §2.1 age-group dimension (q311, load_ref.age_grp.sql:25-75 +
    * load_ref.num.sql:1-30): the -1..250 spine carrying the twelve
    * grouping ladders; ref.num's doubling WHILE loop is the T-SQL
    * row-generation workaround whose native Spark equivalent is
    * range(). Ladders are shared DATA (RefTables.AgeLadders) with the
    * oracle generator. */
  def q311AgeGrp(s: SparkSession, dir: String): DataFrame =
    graft.sources.RefTables.ageGrp(s).orderBy(col("age"))

  /** §2.3 carrier billing-NPI reference (q312,
    * load_ref.apcd_mcare_carrier_billing_npi.sql:7-23): carrier-type
    * APCD claims left-joined to the Medicare carrier file on the
    * submitter claim control number under the reference's
    * CASE-SENSITIVE collation (Spark equality is already
    * case-sensitive; the fixture plants lower-cased control numbers
    * that must NOT match). */
  def q312CarrierNpi(s: SparkSession, dir: String): DataFrame = {
    val ok = col("o_orderkey")
    val ctl = concat(lit("S"), (ok % 4000).cast("string"))
    val apcd = t(s, dir, "orders").select(
      when(ok % 10 === 0, lower(ctl)).otherwise(ctl)
        .as("submitter_clm_control_num"),
      ok.as("medical_claim_header_id"),
      (lit(23) + ok % 4).as("submitted_claim_type_id"))
    val bcarrier = t(s, dir, "orders").filter(ok % 3 === 0)
      .groupBy(concat(lit("S"), (ok % 4000).cast("string")).as("clm_id"))
      .agg(max(lit(1000000000L) + col("o_custkey"))
        .as("carr_clm_blg_npi_num"))
    graft.sources.RefTables.carrierBillingNpi(apcd, bcarrier)
      .orderBy(col("claim_header_id"))
  }

  /** §2.3/§2.4 comorbidity references and index scores (q313,
    * load_ref.comorb_ref_tables.sql:1-1134 + the Quan/Gagne published
    * weights): dx rows prefix-matched against the broadcast condition
    * dimension, distinct (person, condition) flags, and the three
    * weighted sums. Fixture plants hits for every condition in both
    * ICD versions plus non-matching codes. */
  def q313ComorbScores(s: SparkSession, dir: String): DataFrame = {
    val pk = col("l_partkey")
    val codes9 = Seq("39891", "4283", "44000", "4929", "25001", "25042",
      "5859", "19655", "29620", "3110", "04200", "71500")
    val codes10 = Seq("I500", "I4891", "I7025", "J449", "E1199", "E1122",
      "N189", "C771", "F329", "B2000", "Z0000", "K219")
    def pick(codes: Seq[String]) =
      codes.zipWithIndex.foldLeft(lit(codes.head)) { case (acc, (c, i)) =>
        when(pk % 12 === i, c).otherwise(acc)
      }
    val dx = t(s, dir, "lineitem").join(
        t(s, dir, "orders").select(col("o_orderkey"),
          (col("o_custkey") % 150).as("id_person")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("id_person"),
        when(pk % 2 === 0, 9).otherwise(10).as("icdcm_version"),
        when(pk % 2 === 0, pick(codes9)).otherwise(pick(codes10))
          .as("icdcm_norm"))
    graft.builds.Comorbidity.scores(dx, "id_person")
      .orderBy(col("id_person"))
  }

  /** §2.8 FDA NDC directory normalization (q314,
    * load_ref.ndc_codes.R:10-70): finished package+product merge,
    * unfinished rows (proprietary name nulled), compounders (strength
    * from the ingredients column), and the 10→11-digit package-code
    * normalization — 4-4-2/5-3-2/5-4-1 each padding a different
    * segment, anything else NULL. */
  def q314NdcCodes(s: SparkSession, dir: String): DataFrame = {
    val pk = col("p_partkey")
    def seg(n: Column, w: Int) = lpad((n % math.pow(10, w).toLong)
      .cast("string"), w, "0")
    val shape = when(pk % 5 === 0,
        concat(seg(pk, 4), lit("-"), seg(pk * 3, 4), lit("-"),
          seg(pk, 2)))
      .when(pk % 5 === 1,
        concat(seg(pk, 5), lit("-"), seg(pk * 3, 3), lit("-"),
          seg(pk, 2)))
      .when(pk % 5 === 2,
        concat(seg(pk, 5), lit("-"), seg(pk * 3, 4), lit("-"),
          seg(pk, 1)))
      .when(pk % 5 === 3,
        concat(seg(pk, 6), lit("-"), seg(pk * 3, 4), lit("-"),
          seg(pk, 2)))
      .otherwise(lit("FREE TEXT"))
    val part = t(s, dir, "part")
    val pkg = part.select(
      concat(lit("P"), (pk % 500).cast("string")).as("productid"),
      concat(lit("N"), pk.cast("string")).as("productndc"),
      shape.as("ndcpackagecode"))
    val product = part.filter(pk % 4 =!= 0).select(
      concat(lit("P"), (pk % 500).cast("string")).as("productid"),
      concat(lit("N"), pk.cast("string")).as("productndc"),
      col("p_name").as("proprietaryname"),
      col("p_type").as("nonproprietaryname"))
    val finished = pkg.join(product, Seq("productid", "productndc"),
      "left").withColumn("source", lit("finished"))
    val unfinished = part.filter(pk % 7 === 0).select(
      concat(lit("U"), (pk % 500).cast("string")).as("productid"),
      concat(lit("UN"), pk.cast("string")).as("productndc"),
      shape.as("ndcpackagecode"),
      lit(null).cast("string").as("proprietaryname"),
      col("p_type").as("nonproprietaryname"),
      lit("unfinished").as("source"))
    val compounders = part.filter(pk % 9 === 0).select(
      lit(null).cast("string").as("productid"),
      concat(lit("CN"), pk.cast("string")).as("productndc"),
      shape.as("ndcpackagecode"),
      col("p_name").as("proprietaryname"),
      lit(null).cast("string").as("nonproprietaryname"),
      lit("compounder").as("source"))
    finished.unionByName(unfinished).unionByName(compounders)
      .withColumn("ndc",
        graft.functions.NdcCodes.ndc11(col("ndcpackagecode")))
      .select(col("productid"), col("productndc"),
        col("ndcpackagecode"), col("ndc"), col("proprietaryname"),
        col("nonproprietaryname"), col("source"))
      .orderBy(col("source"), col("productndc"), col("ndcpackagecode"),
        col("productid"))
  }

  /** §2.1/§2.7 NPPES provider master reshape (q321,
    * ref/tables/load_ref.provider_nppes_apde_load.R:31-166 over the
    * comma-scrubbed raw of load_ref.provider_nppes_load.R:46-49):
    * both 15-slot column families unpivoted, joined, collapsed to
    * distinct (npi, taxonomy) with max primary, ranked primary-first /
    * A-Z, pivoted to taxonomy_1/2/3 (keeping the reference's
    * multi-primary fan-out quirk), geo_wa + SHA2-256 geo_hash_raw +
    * deactivation_flag. Fixture plants: comma-ridden npi and name
    * strings (the raw scrub must repair them), 'wa'/'WASHINGTON'
    * case-insensitive states, slot patterns filling ~4 of 15 slots
    * with natural cross-slot duplicate codes, per-NPI primary slots
    * that are sometimes unfilled (no primary → rank-1 fallback), one
    * multi-primary NPI class (custkey % 37 — fans out), and
    * deactivated org-typeless NPIs. */
  def q321NppesApdeLoad(s: SparkSession, dir: String): DataFrame = {
    val ck = col("c_custkey")
    val baseNpi = lit(1000000000L) + ck
    var f = t(s, dir, "customer").select(
      ck.as("c_custkey"),
      when(ck % 17 === 0, concat(lit("1,"),
          expr("substring(cast(1000000000 + c_custkey as string), 2)")))
        .otherwise(baseNpi.cast("string")).as("npi"),
      when(ck % 23 === 0, lit(null).cast("string"))
        .when(ck % 3 === 0, "2").otherwise("1").as("entity_type_code"),
      when(ck % 3 === 0, concat(lit("ORG "), (ck % 100).cast("string")))
        .as("name_org"),
      when(ck % 13 === 0,
          concat(lit("LAST,JR "), (ck % 50).cast("string")))
        .otherwise(concat(lit("LAST "), (ck % 50).cast("string")))
        .as("name_last"),
      concat(lit("FIRST "), (ck % 40).cast("string")).as("name_first"),
      when(ck % 11 =!= 0,
        concat((lit(100) + ck % 900).cast("string"), lit(" MAIN ST")))
        .as("address_practice_first"),
      when(ck % 6 === 0, concat(lit("STE "), (ck % 30).cast("string")))
        .as("address_practice_second"),
      when(ck % 5 === 0, "SEATTLE").when(ck % 5 === 1, "TACOMA")
        .when(ck % 5 === 2, "PORTLAND").otherwise("SPOKANE")
        .as("address_practice_city"),
      when(ck % 29 === 0, "wa").when(ck % 4 === 0, "WA")
        .when(ck % 4 === 1, "WASHINGTON").when(ck % 4 === 2, "OR")
        .as("address_practice_state"),
      concat(lit("98"), lpad((ck % 999).cast("string"), 3, "0"),
        lit("1234")).as("address_practice_zip_code"),
      concat(lit("2008-0"), (lit(1) + ck % 9).cast("string"),
        lit("-15")).as("enumeration_date"),
      concat(lit("2020-0"), (lit(1) + ck % 9).cast("string"),
        lit("-01")).as("last_update"),
      when(ck % 23 === 0 || ck % 19 === 0,
        concat(lit("2021-0"), (lit(1) + ck % 9).cast("string"),
          lit("-20"))).as("deactivation_date"),
      when(ck % 2 === 0, "F").when(ck % 7 === 0, "M").as("gender_code"))
    for (i <- 1 to 15) {
      f = f.withColumn(s"healthcare_provider_taxonomy_code_$i",
        when((ck + i) % 4 === 0, concat(lit("T"),
          lpad(((ck * i) % 40).cast("string"), 2, "0"))))
      f = f.withColumn(s"healthcare_provider_primary_taxonomy_switch_$i",
        when((ck + i) % 4 === 0,
          when(lit(i) === (lit(1) + ck % 2) ||
            (ck % 37 === 0 && lit(i) <= 8), "Y").otherwise("N")))
    }
    graft.sources.RefTables.nppesApdeLoad(f)
      .orderBy(col("npi"), col("taxonomy_1"))
  }

  /** §2.7/§2.8 HEDIS QRS value-set master (q322,
    * load_claims.ref_hedis_value_sets_apde_2018-2023.R steps 2-3 +
    * the 2024/2025 single-year siblings): seven measurement-year
    * frames bound with NULL padding (2018's sheet lacks
    * value_set_version — the bind_rows drift the reference handles),
    * then the ICD punctuation strip + ICD-9 trailing-zero pad.
    * Fixture plants dotted ICD-10 codes, 3/4/5-digit dotted ICD-9
    * codes, and pass-through CPT/UBREV codes, with per-year
    * membership drift. */
  def q322HedisValueSets(s: SparkSession, dir: String): DataFrame = {
    val pk = col("pk")
    val base = t(s, dir, "part")
      .select((col("p_partkey") % 600).as("pk")).distinct()
    val code = when(pk % 4 === 0,
        concat(lit("A"), lpad((pk % 90).cast("string"), 2, "0"),
          lit("."), (pk % 10).cast("string"),
          when(pk % 3 === 0, lit("1")).otherwise(lit(""))))
      .when(pk % 4 === 1,
        concat(lpad((pk % 999).cast("string"), 3, "0"),
          when(pk % 3 === 0, lit(""))
            .when(pk % 3 === 1, lit(".1")).otherwise(lit(".12"))))
      .when(pk % 4 === 2, lpad((pk % 99999).cast("string"), 5, "0"))
      .otherwise(lpad((pk % 999).cast("string"), 4, "0"))
    val sys = when(pk % 4 === 0, "ICD10CM").when(pk % 4 === 1, "ICD9CM")
      .when(pk % 4 === 2, "CPT").otherwise("UBREV")
    val years = (2018 to 2024).map { y =>
      val yearFrame = base.filter((pk + y) % 5 =!= 0).select(
        concat(lit("VS "), (pk % 40).cast("string"))
          .as("value_set_name"),
        concat(lit("2.16.840.1."), (pk % 40).cast("string"))
          .as("value_set_oid"),
        code.as("code"), sys.as("code_system"))
      y -> (if (y == 2018) yearFrame
        else yearFrame.withColumn("value_set_version", lit(s"MY $y")))
    }
    graft.sources.RefTables.hedisValueSets(years)
      .orderBy(col("year"), col("value_set_name"), col("code_system"),
        col("code"))
  }

  /** §2.8/§2.9 RDA behavioral-health value-set refresh (q323,
    * load_ref.rda_value_sets_apde.R steps 3-6b): version inference by
    * code shape + desc regex, trailing/leading pads, padded-collision
    * longest-raw pick, CCS→condition and drug-name→pharmacy sub-group
    * lookups with the manual recodes and contains-fallbacks, the NO
    * HARMS ICD-10 additions, existing-wins distinct-except-desc
    * combine, the mh_disrupt removal, and the MOUD procedure append.
    * Fixture plants: a pad-collision trio ('123'/'1230'/'12300' all
    * padding to '12300' — longest raw wins), E-codes whose POISON-
    * family desc flips them to ICD-9, messy-whitespace descs (squish),
    * every pharmacy assignment path (map hit, priority collision,
    * manual list, NALTREXONE/DISULFIRAM fallback, BRIXADI, one
    * unmatched), prior-run rows that must win the dedupe, and
    * mh_disrupt rows on the removal list. */
  def q323RdaValueSets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pk = col("pk")
    // pk universe stays within sf0.001's part range so the planted
    // pad-collision pairs (pk and pk+140 share pk%20 and nb, differ in
    // the suffix selector) exist at every scale
    val base = t(s, dir, "part")
      .select((col("p_partkey") % 200).as("pk")).distinct()
    val nb = pk % 7
    val fcode = concat(lit("F"), lpad((pk % 329).cast("string"), 3, "0"))
    val rxDesc = when(pk % 8 === 0, "ACAMPROSATE  calcium")
      .when(pk % 8 === 1, "sertraline HCL")
      .when(pk % 8 === 2, "NALTREXONE HCL 50MG")
      .when(pk % 8 === 3, "BRIXADI")
      .when(pk % 8 === 4, "METHYLPHENIDATE")
      .when(pk % 8 === 5, "LOREEV XR")
      .when(pk % 8 === 6, "DISULFIRAM TAB")
      .otherwise("VITAMIN D")
    val newRaw = base.select(
      when(pk % 2 === 0, "mh").otherwise("sud").as("value_set_group"),
      when(nb === 6, concat(lit("VS2 "), (pk % 20).cast("string")))
        .otherwise(concat(lit("VS "), (pk % 20).cast("string")))
        .as("value_set_name"),
      when(nb.isin(0, 1, 2, 3, 6), "diagnosis")
        .when(nb === 4, "pharmacy").otherwise("procedure")
        .as("data_source_type"),
      when(nb.isin(0, 1, 2, 3, 6), "ICDCM")
        .when(nb === 4, "NDC").otherwise("HCPCS").as("code_set"),
      when(nb === 0, concat(lpad((pk % 20).cast("string"), 3, "0"),
          when(expr("pk div 20") % 3 === 0, "")
            .when(expr("pk div 20") % 3 === 1, "0")
            .otherwise("00")))
        .when(nb === 1,
          concat(lit("E"), lpad((pk % 80).cast("string"), 3, "0")))
        .when(nb === 2,
          concat(lit("V"), lpad((pk % 90).cast("string"), 2, "0")))
        .when(nb.isin(3, 6), fcode)
        .when(nb === 4,
          lpad(((pk * 7) % 99999999).cast("string"),
            (lit(7) + pk % 5).cast("int"), lit("0")))
        .otherwise(concat(lit("H"), lpad((pk % 9999).cast("string"),
          4, "0"))).as("code"),
      when(nb === 1, when(pk % 2 === 0, "accidental   poisoning  event")
          .otherwise("allergy note"))
        .when(nb === 4, rxDesc)
        .otherwise(concat(lit("dx  code "), pk.cast("string")))
        .as("desc"))
    // prior run: the nb=3 slice's post-pipeline rows (existing wins the
    // dedupe, keeping its PRIOR desc), plus mh_disrupt removal targets
    val exF = base.filter(nb === 3 && pk % 2 === 0).select(
      lit("mh").as("value_set_group"),
      concat(lit("VS "), (pk % 20).cast("string")).as("value_set_name"),
      lit("diagnosis").as("data_source_type"),
      lit("ICD10CM").as("code_set"), fcode.as("code"),
      concat(lit("PRIOR DESC "), pk.cast("string")).as("desc"),
      lit(10).cast("int").as("icdcm_version"),
      when(pk % 329 % 2 === 0, "mh_anxiety").otherwise("mh_adjustment")
        .as("sub_group_condition"),
      lit(null).cast("string").as("sub_group_pharmacy"))
    val disrupt = Seq("F068", "F09", "F488", "F54")
      .toDF("code")
      .select(lit("mh").as("value_set_group"),
        lit("VS-DISRUPT").as("value_set_name"),
        lit("diagnosis").as("data_source_type"),
        lit("ICD10CM").as("code_set"), col("code"),
        lit("DISRUPT DESC").as("desc"),
        lit(10).cast("int").as("icdcm_version"),
        lit("mh_disrupt").as("sub_group_condition"),
        lit(null).cast("string").as("sub_group_pharmacy"))
    val existing = exF.unionByName(disrupt)
    // icdcm ref: one row per reachable normalized code + a NO HARMS
    // subset (the rest of the 66 stay desc-less)
    val refF = base.select(fcode.as("icdcm"),
        lit(10).cast("int").as("icdcm_version"),
        when(pk % 329 % 2 === 0, "MBD005").otherwise("5.1")
          .as("ccs_detail_code"),
        concat(lit("F desc "), (pk % 329).cast("string"))
          .as("icdcm_description")).distinct()
    val refD = base.select(
      concat(lpad((pk % 20).cast("string"), 3, "0"), lit("00"))
        .as("icdcm"),
      lit(9).cast("int").as("icdcm_version"),
      lit("SKN002").as("ccs_detail_code"),
      concat(lit("Nine desc "), (pk % 20).cast("string"))
        .as("icdcm_description")).distinct()
    val refE9 = base.select(
      concat(lit("E"), lpad((pk % 80).cast("string"), 3, "0"), lit("0"))
        .as("icdcm"),
      lit(9).cast("int").as("icdcm_version"),
      lit("5.1").as("ccs_detail_code"),
      concat(lit("E9 desc "), (pk % 80).cast("string"))
        .as("icdcm_description")).distinct()
    val refE10 = base.select(
      concat(lit("E"), lpad((pk % 80).cast("string"), 3, "0"))
        .as("icdcm"),
      lit(10).cast("int").as("icdcm_version"),
      lit("5.2").as("ccs_detail_code"),
      concat(lit("E10 desc "), (pk % 80).cast("string"))
        .as("icdcm_description")).distinct()
    val refNh = Seq(
      ("T43652", "MBD012", "Poisoning by SSRI self-harm"),
      ("X75XXX", "MBD012", "Self-harm by explosive material"),
      ("T4992X", "MBD012", "Poisoning topical agent self-harm"),
      ("X72XXX", "MBD012", "Self-harm by handgun discharge"))
      .toDF("icdcm", "ccs_detail_code", "icdcm_description")
      .select(col("icdcm"), lit(10).cast("int").as("icdcm_version"),
        col("ccs_detail_code"), col("icdcm_description"))
    val icdcmRef = refF.unionByName(refD).unionByName(refE9)
      .unionByName(refE10).unionByName(refNh)
    val ccsMap = Seq(("MBD005", "mh_anxiety"), ("5.1", "mh_adjustment"),
      ("5.2", "mh_anxiety"), ("SKN002", "mh_anxiety"),
      ("MBD012", "mh_other"))
      .toDF("ccs_detail_code", "sub_group_condition")
    // NALTREXONE MICROSPHERES sits in two groups -> min-priority wins
    val pharmacyMap = Seq(
      ("ACAMPROSATE CALCIUM", "Acamprosate"),
      ("SERTRALINE HCL", "Antidepressants Rx"),
      ("NALTREXONE MICROSPHERES", "Naltrexone"),
      ("NALTREXONE MICROSPHERES", "Antidepressants Rx"))
      .toDF("desc_1", "sub_group_pharmacy")
    val moudProc = Seq(("H0020", "Methadone administration"),
      ("H0033", "Oral medication administration"),
      ("J0571", "Buprenorphine oral 1mg"))
      .toDF("procedure_code", "desc")
    graft.sources.RefTables.rdaValueSets(existing, newRaw, icdcmRef,
        ccsMap, pharmacyMap, moudProc)
      .orderBy(col("data_source_type"), col("code_set"),
        col("value_set_name"), col("code"), col("desc"))
  }

  /** §2.1 FDA NDC product directory load (q324,
    * load_ref.fda_ndc_product.R:38-50): the all-VARCHAR read and the
    * U+FFFD mojibake strip on LABELERNAME. Fixture plants replacement
    * characters mid-name on part % 9 rows. */
  def q324FdaNdcProduct(s: SparkSession, dir: String): DataFrame = {
    val pk = col("p_partkey")
    val raw = t(s, dir, "part").select(
      concat(lit("P"), (pk % 5000).cast("string")).as("productid"),
      concat(lpad((pk % 99999).cast("string"), 5, "0"), lit("-"),
        lpad((pk % 999).cast("string"), 3, "0")).as("productndc"),
      when(pk % 3 === 0, "HUMAN PRESCRIPTION DRUG")
        .otherwise("HUMAN OTC DRUG").as("producttypename"),
      col("p_name").as("proprietaryname"),
      when(pk % 9 === 0,
          concat(lit("ACME� PHARMA� "),
            (pk % 70).cast("string")))
        .otherwise(concat(lit("ACME PHARMA "), (pk % 70).cast("string")))
        .as("labelername"),
      col("p_type").as("substancename"))
    graft.sources.RefTables.fdaNdcProduct(raw)
      .orderBy(col("productndc"), col("productid"))
  }

  /** §2.1/§2.9 ICD-CM master ENRICHMENT (q326,
    * ref/tables/load_ref.icdcm_codes.R:103-842): the q282 order-file
    * combine composed as the input stage (per the kernel doc:
    * [[icdcmMaster]] with the planted D families), then the CDC
    * external-cause matrix with the full→6→5-digit truncated-code
    * fallback joins and ambiguity blanking, the CCW flag pivot with
    * its vocabulary stop-gate, the two-era CCS derivation (ICD-9
    * case_when tables + single 3-digit neighbor-fill pass; ICD-10
    * CCSR strip/derive + the 6/5/4/3-digit WHILE-loop fill to
    * convergence), the midlevel/superlevel crosswalk, the RDA MH/SUD
    * flag pivots with any-flag coalesces, and the bind/rename/
    * project/distinct publish. Fixture derivations are shared with
    * the generated oracle via [[IcdcmFixture]]; the kernel's literal
    * mapping tables render into both sides from
    * [[graft.sources.IcdcmEnrich]]. */
  def q326IcdcmEnrich(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pk = col("pk")
    val base = t(s, dir, "part")
      .select((col("p_partkey") % 400).as("pk")).distinct()
    val lp4 = lpad(pk.cast("string"), 4, "0")
    val lp3 = lpad(pk.cast("string"), 3, "0")
    val a5 = concat(lit("A"), lp4)
    val b6 = concat(lit("B"), lp4, lit("X"))
    val c4 = concat(lit("C"), lp3)
    val n9 = concat(lit("9"), lp3)

    val master = icdcmMaster(s, dir, plantD = true)

    // --- CDC external-cause matrix (arms per the kernel doc) ---
    val ext9 = base.filter(pk % 4 === 0).select(n9.as("code"),
      lit(9).as("version"),
      concat(lit("I9-"), (pk % 3).cast("string")).as("intent"),
      concat(lit("M9-"), (pk % 5).cast("string")).as("mechanism"),
      concat(lit("MF9-"), (pk % 7).cast("string")).as("mechanism_full"))
    def ext10Arm(m: Int, codeExpr: Column, tag: String): DataFrame =
      base.filter(pk % 12 === m).select(codeExpr.as("code"),
        lit(10).as("version"),
        concat(lit(s"I10$tag-"), (pk % 4).cast("string")).as("intent"),
        concat(lit(s"M10$tag-"), (pk % 5).cast("string"))
          .as("mechanism"),
        concat(lit(s"MF10$tag-"), (pk % 6).cast("string"))
          .as("mechanism_full"))
    val extCause = ext9
      .unionByName(ext10Arm(1, b6, "F"))            // exact-code hit
      .unionByName(ext10Arm(1, concat(b6, lit("D")), "D")) // blanks 6/5
      .unionByName(ext10Arm(0, concat(a5, lit("XY")), "A")) // 5-digit hit
      .unionByName(ext10Arm(4, concat(b6, lit("A")), "B"))  // 6-digit hit
      .unionByName(ext10Arm(7, concat(b6, lit("B")), "C1")) // ambiguous
      .unionByName(ext10Arm(7, concat(b6, lit("C")), "C2")) // pair

    // --- CCW long lookup ---
    def ccwArm(cond: Column, dx: Column, ver: Int,
        ab: String): DataFrame =
      base.filter(cond).select(dx.as("dx"), lit(ver).as("ver"),
        lit(ab).as("ccw_abbrev"))
    val ccwLong = ccwArm(pk % 15 === 0, a5, 10, "diabetes")
      .unionByName(ccwArm(pk % 30 === 0, a5, 10, "hypertension"))
      .unionByName(ccwArm(pk % 6 === 0, n9, 9, "copd"))
      .unionByName(ccwArm(pk % 12 === 0, n9, 9, "depression"))

    // --- CCS ICD-9 lookup: seeded pk%2==0 && pk%10 in {0,4}, branch
    //     v = (pk div 2) % 19 over IcdcmFixture.ccs9Branches.
    //     {0,4} places one seed mid-block, so the SINGLE 3-digit pass
    //     fills exactly the row whose lead is the seed and leaves the
    //     block tail NA (the reference's ICD-9 side keeps NAs) ---
    val v = expr("pk div 2") % 19
    def pick9(f: ((String, String, String, String, Option[String],
        Option[String])) => String): Column =
      IcdcmFixture.ccs9Branches.zipWithIndex
        .foldRight(lit(null).cast("string")) { case ((b, i), acc) =>
          when(v === i, lit(f(b))).otherwise(acc)
        }
    val ccs9Raw = base.filter(pk % 2 === 0 &&
        (pk % 10 === 0 || pk % 10 === 4)).select(
      n9.as("icdcode"),
      pick9(_._4).as("ccs"),
      pick9(_._1).as("multiccs_lv1"),
      pick9(_._2).as("multiccs_lv2"),
      pick9(_._3).as("multiccs_lv3"),
      pick9(b => b._5.getOrElse("Cat [of] " + b._2))
        .as("multiccs_lv2_description"),
      pick9(b => b._6.getOrElse("L3 [of] " + b._3))
        .as("multiccs_lv3_description"))

    // --- CCSR ICD-10 lookup: one row per seeded master code (the
    //     pk%10 in {0,7,8,9} TAIL rule + the D-family 'A'-suffix
    //     seeds), branch w = (pk div 3) % 8; raw keys quote-wrapped
    //     (punct strip). Tail seeding is load-bearing: the reference's
    //     case_when prefers the LEAD branch, so a row whose lead
    //     shares its prefix copies the lead even when NULL — values
    //     propagate BACKWARD within a prefix block and only the
    //     block's last member pulls from its lag; convergence needs a
    //     seed in each block's tail ({7,8,9} covers every nonempty
    //     mod-3 residue class tail; {0} keeps lone-member blocks like
    //     C200 alive) ---
    val w = expr("pk div 3") % 8
    def pick10(f: ((String, String)) => String): Column =
      IcdcmFixture.ccs10Branches.zipWithIndex
        .foldRight(lit(null).cast("string")) { case ((b, i), acc) =>
          when(w === i, lit(f(b))).otherwise(acc)
        }
    def ccsrArm(cond: Column, codeExpr: Column): DataFrame =
      base.filter(cond).select(
        concat(lit("'"), codeExpr, lit("'")).as("icdcode"),
        concat(lit("'"), pick10(_._1), lit("'")).as("ccs_detail_code"),
        pick10(_._2).as("ccs_detail_desc"))
    val seed10 = (pk % 10).isin(0, 7, 8, 9)
    val ccs10Raw =
      ccsrArm(pk % 3 === 0 && seed10, a5)
        .unionByName(ccsrArm(pk % 3 === 1 && seed10, b6))
        .unionByName(ccsrArm(pk % 3 === 2 && seed10, c4))
        .unionByName(ccsrArm(pk % 20 === 5,
          concat(lit("D"), lp4, lit("A"))))
        .unionByName(ccsrArm(pk % 20 === 15,
          concat(lit("D"), lp4, lit("XA"))))

    // --- midlevel/superlevel crosswalk from the shared key list ---
    val xwalk = IcdcmFixture.xwalkDescs.toDF("ccs_detail_desc")
      .select(col("ccs_detail_desc"),
        concat(lit("MID "), substring(col("ccs_detail_desc"), 1, 3))
          .as("ccs_midlevel_desc"),
        concat(lit("SUPER "),
          (length(col("ccs_detail_desc")) % 4).cast("string"))
          .as("ccs_superlevel_desc"))

    // --- RDA value set (long) ---
    def pickList(xs: Seq[String], i: Column): Column =
      xs.zipWithIndex.foldRight(lit(null).cast("string")) {
        case ((x, j), acc) => when(i === j, lit(x)).otherwise(acc)
      }
    import graft.sources.IcdcmEnrich.{mhConds, sudConds10, sudConds9}
    def rdaArm(cond: Column, codeExpr: Column, ver: Int,
        condExpr: Column): DataFrame =
      base.filter(cond).select(codeExpr.as("code"),
        lit(ver).as("icdcm_version"),
        condExpr.as("sub_group_condition"))
    val rdaLong =
      rdaArm(pk % 21 === 0, a5, 10,
          pickList(mhConds, expr("pk div 21") % 8))
        .unionByName(rdaArm(pk % 42 === 0, a5, 10, lit("sud_opioid")))
        .unionByName(rdaArm(pk % 21 === 10, b6, 10,
          pickList(sudConds10, expr("pk div 21") % 9)))
        .unionByName(rdaArm(pk % 8 === 0, n9, 9,
          when(expr("pk div 8") % 2 === 0,
              pickList(mhConds, expr("pk div 16") % 8))
            .otherwise(pickList(sudConds9, expr("pk div 16") % 8))))

    graft.sources.IcdcmEnrich.enrich(master, extCause, ccwLong,
        IcdcmFixture.ccwAbbrevs, ccs9Raw, ccs10Raw, xwalk, rdaLong)
      .orderBy(col("icdcm_version"), col("icdcm"))
  }

  /** §2.1 APCD ethnicity→race map LOAD (q327,
    * ref/tables/load_ref.apcd_ethnicity_race_map.R:59-66 + the archive
    * yaml's declared types): the crosswalk csv written as a REAL file,
    * read back under the yaml schema (int / varchar / TINYINT /
    * varchar — the declared-not-inferred discipline), and the
    * dbWriteTable(overwrite = T) semantics: a PRIOR half-map loads
    * first and the full map load REPLACES it (the read-back proves
    * replacement, not append). Feeds q284's update check — both rows
    * derive the map from [[ethnicityMapRows]]. */
  def q327EthnicityMapLoad(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.{LoadTable, TableConfig}
    val cfg = TableConfig("ref_apcd_ethnicity_race_map", Seq(
      "ethnicity_id" -> "INT",
      "ethnicity_desc" -> "VARCHAR(255)",
      "race_id" -> "TINYINT",
      "race_desc" -> "VARCHAR(255)"), Seq.empty)
    val rows = ethnicityMapRows(s, dir)
    val work = java.nio.file.Files.createTempDirectory("graft_ethmap")
    val tbl = s"$work/ref_apcd_ethnicity_race_map"
    def loadOnce(df: DataFrame, tag: String): Unit = {
      val csv = s"$work/apcd_ethnicity_race_mapping_$tag.csv"
      df.coalesce(1).write.mode("overwrite")
        .option("header", true).csv(csv)
      LoadTable.loadCsv(s, csv, cfg)
        .write.mode("overwrite").parquet(tbl)
    }
    loadOnce(rows.filter(col("ethnicity_id") % 2 === 0), "prior")
    loadOnce(rows, "current")
    s.read.parquet(tbl).orderBy(col("ethnicity_id"))
  }

  /** §2.1 KC claim-type crosswalk load (q328,
    * ref/tables/load_ref.kc_claim_type_crosswalk.R:25-33 + its yaml):
    * create-shell + CSV load under the declared schema — the
    * crosswalk maps each source system's claim-type code (ProviderOne
    * int-like, Medicare letter codes, WA-APCD ids) to the KC claim
    * type (TINYINT 1-5). Fixture spans the three source arms with a
    * shared kc_clm_type_id so the tinyint cast and multi-source shape
    * survive the file round trip. */
  def q328ClaimTypeXwalk(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.{LoadTable, TableConfig}
    val pk = col("pk")
    val base = t(s, dir, "part")
      .select((col("p_partkey") % 60).as("pk")).distinct()
    val rows = base.select(
      when(pk % 3 === 0, pk.cast("string"))
        .when(pk % 3 === 1, concat(lit("M"), pk.cast("string")))
        .otherwise(concat(lit("AP"), lpad(pk.cast("string"), 3, "0")))
        .as("source_clm_type_id"),
      concat(lit("SRC TYPE "), pk.cast("string"))
        .as("source_clm_type_desc"),
      when(pk % 3 === 0, "ProviderOne").when(pk % 3 === 1, "Medicare")
        .otherwise("WA-APCD").as("source_desc"),
      (pk % 5 + 1).as("kc_clm_type_id"),
      concat(lit("KC TYPE "), (pk % 5 + 1).cast("string"))
        .as("kc_clm_type_desc"))
    val cfg = TableConfig("kc_claim_type_crosswalk", Seq(
      "source_clm_type_id" -> "VARCHAR(20)",
      "source_clm_type_desc" -> "VARCHAR(255)",
      "source_desc" -> "VARCHAR(255)",
      "kc_clm_type_id" -> "TINYINT",
      "kc_clm_type_desc" -> "VARCHAR(255)"), Seq.empty)
    val work = java.nio.file.Files.createTempDirectory("graft_kcxwalk")
    val csv = s"$work/kc_claim_type_crosswalk.csv"
    rows.coalesce(1).write.mode("overwrite")
      .option("header", true).csv(csv)
    LoadTable.loadCsv(s, csv, cfg)
      .orderBy(col("source_desc"), col("source_clm_type_id"))
  }

  /** §2.1/§2.8 AHRQ value-set publish (q329,
    * ref/tables/load_ref.ahrq_value_set.sql:21-40): the xlsx tmp
    * stage → ref publish with the 12-char code-prefix strip and the
    * PK-distinctness gate (RefTables.ahrqValueSet). Fixture plants a
    * 12-char-exact code (SUBSTRING length 0 → empty string), NULLable
    * desc_1 rows, and the PQI/PDI × diagnosis/procedure/discharge ×
    * code-set spread the PQI measures (q115/q124) consume. */
  def q329AhrqValueSet(s: SparkSession, dir: String): DataFrame = {
    val pk = col("pk")
    val base = t(s, dir, "part")
      .select((col("p_partkey") % 150).as("pk")).distinct()
    val code = when(pk % 17 === 0, lit(""))
      .when(pk % 3 === 0, concat(lit("I"), lpad(pk.cast("string"), 4, "0")))
      .when(pk % 3 === 1, concat(lit("0"), lpad(pk.cast("string"), 6, "0")))
      .otherwise(lpad(pk.cast("string"), 3, "0"))
    val tmp = base.select(
      when(pk % 2 === 0, "PQI").otherwise("PDI").as("value_set_group"),
      concat(when(pk % 2 === 0, "PQI ").otherwise("PDI "),
        lpad((pk % 16).cast("string"), 2, "0")).as("value_set_name"),
      when(pk % 3 === 0, "diagnosis").when(pk % 3 === 1, "procedure")
        .otherwise("discharge").as("data_source_type"),
      when(pk % 3 === 0, "ICD10CM").when(pk % 3 === 1, "ICD10PCS")
        .otherwise("MSDRG").as("code_set"),
      concat(lit("XSECTORXREF:"), code).as("code"),
      when(pk % 11 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("DESC "), pk.cast("string"))).as("desc_1"))
    graft.sources.RefTables.ahrqValueSet(tmp)
      .orderBy(col("value_set_name"), col("data_source_type"),
        col("code_set"), col("code"))
  }

  /** §2.1 NPPES provider lookup load (q330,
    * ref/tables/load_ref.provider_nppes_load.R:44-67): the non-APDE
    * NPPES variant — all-VARCHAR CSV read with whitespace trim, the
    * comma scrub on every value, and the POSITIONAL rename from the
    * CMS file's headers to the yaml names. Fixture plants padded
    * values and quoted embedded commas ('ACME, INC' → 'ACME INC') so
    * trim + scrub are observable through a real file round trip. */
  def q330NppesLoad(s: SparkSession, dir: String): DataFrame = {
    val ck = col("c_custkey")
    val raw = t(s, dir, "customer").select(
      (lit(1000000000L) + ck % 5000).cast("string").as("NPI"),
      when(ck % 7 === 0, lit(null).cast("string"))
        .otherwise((ck % 2 + 1).cast("string")).as("Entity Type Code"),
      // the comma value stays unpadded: R's trim_ws trims inside
      // quotes, Spark's ignore*WhiteSpace options only outside them —
      // padding is exercised on the unquoted state arm instead
      when(ck % 2 === 0,
          concat(lit("ACME, INC "), (ck % 40).cast("string")))
        .otherwise(lit(null).cast("string"))
        .as("Provider Organization Name (Legal Business Name)"),
      when(ck % 2 === 1, concat(lit("LAST,JR "), (ck % 40).cast("string")))
        .otherwise(lit(null).cast("string"))
        .as("Provider Last Name (Legal Name)"),
      concat(lit("CITY"), (ck % 30).cast("string"))
        .as("Provider Business Practice Location Address City Name"),
      when(ck % 5 === 0, " WA ").otherwise("OR")
        .as("Provider Business Practice Location Address State Name"),
      lpad((ck % 99999).cast("string"), 5, "0")
        .as("Provider Business Practice Location Address Postal Code"))
    val work = java.nio.file.Files.createTempDirectory("graft_nppes")
    val csv = s"$work/npidata.csv"
    raw.coalesce(1).write.mode("overwrite")
      .option("header", true).csv(csv)
    val back = s.read
      .option("header", true)
      .option("ignoreLeadingWhiteSpace", true)   // read_csv trim_ws = T
      .option("ignoreTrailingWhiteSpace", true)
      .csv(csv)
    graft.sources.RefTables.providerNppesLoad(back, Seq(
        "npi", "entity_type_code", "name_org", "name_last",
        "address_practice_city", "address_practice_state",
        "address_practice_zip_code"))
      .orderBy(col("npi"))
  }

  /** Shared q334/q335 fixture: the bcarrier data dictionary, and the
    * two delivery files written as REAL csv — a comma-separated 2023
    * file using the canonical/LONG/ALT header mix plus an unknown
    * NEW_FLAG column and a missing filetype, and a PIPE-separated
    * future-labeled 2026 file using the other rename arms with
    * paid_amt missing. */
  private def mcareRawDict = Seq(
    graft.sources.McareRawNormalize.DictCol("mcare_bcarrier_claims",
      "bene_id", "encrypted_723_bene_id", None, 1),
    graft.sources.McareRawNormalize.DictCol("mcare_bcarrier_claims",
      "clm_id", "claim_control_number", Some("clm_cntl_num"), 2),
    graft.sources.McareRawNormalize.DictCol("mcare_bcarrier_claims",
      "first_service_date", "claim_from_date", Some("clm_from_dt"), 3),
    graft.sources.McareRawNormalize.DictCol("mcare_bcarrier_claims",
      "paid_amt", "claim_payment_amount", None, 4),
    graft.sources.McareRawNormalize.DictCol("mcare_bcarrier_claims",
      "filetype", "file_type", None, 5))

  private def mcareRawFiles(s: SparkSession,
      dir: String): Seq[(String, String)] = {
    val work = java.nio.file.Files.createTempDirectory("graft_mcare_raw")
    val ck = col("c_custkey")
    val fa = t(s, dir, "customer").select(
      concat(lit("B"), lpad((ck % 900).cast("string"), 6, "0"))
        .as("BENE_ID"),
      concat(lit("C"), ((ck * 13) % 100000).cast("string"))
        .as("CLAIM_CONTROL_NUMBER"),
      concat(lit("2023-"), lpad((ck % 12 + 1).cast("string"), 2, "0"),
        lit("-"), lpad((ck % 28 + 1).cast("string"), 2, "0"))
        .as("CLM_FROM_DT"),
      concat((ck % 5000).cast("string"), lit(".50")).as("PAID_AMT"),
      (ck % 2).cast("string").as("NEW_FLAG"))
    val k = col("o_orderkey")
    val fb = t(s, dir, "orders").select(
      concat(lit("B"), lpad((col("o_custkey") % 900).cast("string"),
        6, "0")).as("bene_id"),
      concat(lit("D"), (k % 100000).cast("string")).as("clm_cntl_num"),
      concat(lit("2026-"), lpad((k % 12 + 1).cast("string"), 2, "0"),
        lit("-01")).as("claim_from_date"),
      lit("bcarrier").as("file_type"))
    val pa = s"$work/mcare_bcarrier_claims_2023.csv"
    val pb = s"$work/mcare_bcarrier_claims_2026.csv"
    fa.coalesce(1).write.mode("overwrite")
      .option("header", true).option("sep", ",").csv(pa)
    fb.coalesce(1).write.mode("overwrite")
      .option("header", true).option("sep", "|").csv(pb)
    Seq("mcare_bcarrier_claims_2023.csv" -> pa,
      "mcare_bcarrier_claims_2026.csv" -> pb)
  }

  /** §2.1 Medicare raw-file normalization (q334,
    * db_loader/mcare/00_master_mcare_raw_file_processing.R:40-161):
    * per-file delimiter sniff, dictionary-driven header
    * canonicalization (long/alt → column_name), and the
    * rbind.fill reorder/NULL-pad to the declared column order — the
    * normalized union of the delivery, file-stamped. */
  def q334McareRawNormalize(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.McareRawNormalize
    mcareRawFiles(s, dir).map { case (name, path) =>
      McareRawNormalize.normalizeFile(s, path, mcareRawDict)._1
        .withColumn("file_name", lit(name))
    }.reduce(_ unionByName _)
      .orderBy(col("file_name"), col("bene_id"), col("clm_id"))
  }

  /** §2.1/§5 Medicare delivery metadata (q335, same reference
    * :86-111 and :190-206): the NEW-column proposal rows (unknown
    * headers → VARCHAR(255) with column_order continuing from the
    * dictionary max) and the per-file etl_log entries — gz name,
    * batch year from the filename's -8..-5 digits with the
    * maxyear-2 future-label quirk (the 2026 file lands in 2024),
    * full-year date_min/date_max, file row count. */
  def q335McareRawEtl(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.McareRawNormalize
    import s.implicits._
    val files = mcareRawFiles(s, dir)
    val perFile = files.map { case (name, path) =>
      val (norm, headers) = McareRawNormalize.normalizeFile(s, path,
        mcareRawDict)
      (name, headers, norm.count())
    }
    val props = perFile.flatMap { case (_, headers, _) =>
      McareRawNormalize.newColumns(headers, mcareRawDict)
    }.map { case (n, t0, o) =>
      ("new_column", null: String, "mcare_bcarrier_claims", n, t0,
        o.toString, null: String, null: String, null: String)
    }
    val etl = perFile.map { case (name, _, n) =>
      val y = McareRawNormalize.batchYear(name, maxYear = 2024)
      ("etl_log", name + ".gz", "mcare_bcarrier_claims",
        null: String, null: String, null: String,
        s"$y-01-01", s"$y-12-31", n.toString)
    }
    (props ++ etl).toDF("section", "file_name", "table_name",
        "column_name", "column_type", "column_order", "date_min",
        "date_max", "row_cnt")
      .orderBy(col("section"), col("file_name"), col("column_order"))
  }
}
