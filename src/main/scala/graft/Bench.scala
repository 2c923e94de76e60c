package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query wall times.
  *
  * Methodology (VERDICT r2 #10, r5 #1): queries run in the fixed declaration
  * order of [[SparkEntry.queries]] (a ListMap), after a warm-up pass over
  * every query at the smallest scale factor — so JVM/codegen warm-up is paid
  * before timing. Each query is then timed over up to `SPARK_GRAFT_BENCH_ITERS`
  * (default 3) full passes and the per-query MEDIAN is reported, with the
  * per-query MIN alongside — single-run numbers on a shared JVM proved too
  * noisy to distinguish a real regression from GC/scheduling variance
  * (r5 verdict: +21% on untouched queries, unfalsifiable at n=1).
  *
  * Timeout-proofing (VERDICT r14 #1 — both r14 driver runs died at rc 124
  * with ZERO data because the JSON was only emitted after all passes):
  *  - `SPARK_GRAFT_BENCH_OUT` (default `bench_result.json`) is rewritten
  *    INCREMENTALLY after the warm-up and after every completed pass, so a
  *    killed run still leaves the last completed pass's medians on disk;
  *  - a JVM shutdown hook prints the one-line JSON (with `"partial":true`
  *    and `"passes_done"`) if the normal end-of-run emit never happened —
  *    SIGTERM now degrades to partial data instead of nothing;
  *  - iterations AUTO-DEGRADE on a slow host: after each timed pass, if
  *    elapsed-plus-one-more-projected-pass exceeds
  *    `SPARK_GRAFT_BENCH_BUDGET` seconds (default 2700 — r13's driver run
  *    completed at 2979 s, r14's ~4500 s projection was killed, so the
  *    ceiling sits between; 0 disables), no further pass starts. The line
  *    records both `iters` (passes actually used for the medians) and
  *    `iters_requested`, so a degraded run is visibly a degraded run and
  *    its medians stay honest (median of fewer full passes, never a
  *    mid-pass mixture).
  *
  * The JSON line is printed after `spark.stop()` so it is the last line
  * this program emits (sbt's own `[success]` banner may still follow when
  * run via sbt — hence the file).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // best-effort parse: a malformed env value must not kill the bench
    // before the JSON contract the harness scrapes is emitted
    val itersReq = math.max(1, scala.util.Try(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").trim.toInt)
      .getOrElse(3))
    val budgetSec = math.max(0L, scala.util.Try(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "2700").trim.toLong)
      .getOrElse(2700L))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // Generated-class cache, parameterised for measurement. A 10k
      // setting was tried mid-r14 (avoid per-pass Janino recompiles);
      // the full-catalog A/B (BENCH_NOTES_r14.md) showed keeping
      // thousands of generated classes alive floods the JVM's 240 MB
      // JIT code cache and the flush/recompile churn costs far more
      // than Janino does, so the default stays at Spark's own 100.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "100"))
      // Status-store retention caps (opt guide §5 — the driver should do
      // almost no data work): the UI is off, but AppStatusListener and
      // SQLAppStatusListener still retain per-execution state (including
      // full physical-plan description strings) for the REST/status API.
      // At 337 queries x multiple passes the defaults (1000 executions /
      // 1000 jobs, untruncated plan text) accumulate hundreds of MB of
      // dead listener state in the old gen over a full-catalog run —
      // measured on this host as a 1.23x full-pass drag (A/B in
      // BENCH_NOTES_r15.md). Nothing reads the stores here, so retain
      // the minimum and truncate event plan strings.
      .config("spark.sql.ui.retainedExecutions", "8")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "1000")
      .config("spark.sql.event.truncate.length", "2048")
      // ContextCleaner only reclaims broadcast/shuffle/RDD state when
      // the driver GCs; a full-catalog pass runs ~20 min, so the 30 min
      // default periodic GC barely fires once and dead state from
      // hundreds of queries camps in the old gen (guide §5)
      .config("spark.cleaner.periodicGC.interval", "5min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The catalog's staging idiom (localCheckpoint(true), 20+ sites)
    // pins blocks in executor storage until the RDD object is GC'd —
    // between bench entries every such block is dead by construction
    // (each entry rebuilds from parquet; nothing is shared across
    // entries), so release them EAGERLY instead of waiting for the
    // cleaner. This is state RELEASE between timed regions, not result
    // caching: nothing survives into the next entry.
    def releaseDeadState(): Unit =
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))

    val names = SparkEntry.queries.keys.toSeq
    val keys = names.map(_.takeWhile(_ != '_'))
    require(keys.distinct.size == keys.size,
      s"duplicate qNN bench keys: ${keys.diff(keys.distinct).mkString(",")}")
    // A query that throws must be REPORTED, not timed as a phantom-fast
    // entry: the r7 TIMESTAMP_NTZ breakage showed as 0.06 s "wins" for the
    // five streaming queries because this loop swallowed the exception.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // Completed passes (each a full per-query vector) — the shutdown hook
    // reads this, so guard every mutation with `lock`.
    val passes = scala.collection.mutable.ArrayBuffer.empty[Seq[Double]]
    // The in-flight pass's completed prefix: (query index, seconds). Only
    // used by the hook when ZERO passes completed (better one timed prefix
    // than nothing).
    val current = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    val lock = new Object
    val emitted = new java.util.concurrent.atomic.AtomicBoolean(false)
    val t0 = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - t0) / 1e9

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.size
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    // The driver captures only the LAST ~2000 chars of output; full query
    // names x 9-decimal doubles made the r2/r3 JSON line ~2.4k chars, so it
    // was truncated mid-line and never parsed. Short keys (the qNN prefix)
    // + 3-decimal seconds keep the whole line compact.
    // Locale.ROOT: f"" uses the JVM default locale, which in comma-decimal
    // locales (de_DE) would print "1,234" — invalid JSON.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    /** Build (stdout line, full file line) from whatever passes exist.
      * Must be safe to call from the shutdown hook mid-pass. */
    def buildJson(partial: Boolean): (String, String) = lock.synchronized {
      val (med, mins, usedKeys) =
        if (passes.nonEmpty) {
          val m = names.indices.map(i => median(passes.toSeq.map(_(i))))
          val mn = names.indices.map(i => passes.toSeq.map(_(i)).min)
          (m, mn, keys)
        } else {
          // no full pass survived: emit the in-flight prefix as-is
          val m = current.toSeq.map(_._2)
          (m, m, current.toSeq.map { case (i, _) => keys(i) })
        }
      val qs = usedKeys.zip(med)
        .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val qmins = usedKeys.zip(mins)
        .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val total = med.sum
      val itersUsed = math.max(passes.size, if (passes.isEmpty) 1 else 0)
      // Errors: qNN keys only on the tail-capped stdout line; full
      // (truncated) messages in the file. Empty object = every query clean.
      val errKeys = errors.keys.map("\"" + _ + "\"").mkString("[", ",", "]")
      val errFull = errors
        .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
        .mkString("{", ",", "}")
      val partialTag = if (partial) "\"partial\":true," else ""
      val head =
        s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
        s"""$partialTag"iters":$itersUsed,"iters_requested":$itersReq,""" +
        s""""passes_done":${passes.size},"""
      val line = head + s""""queries":$qs,"errors":$errKeys,"sf":"$sfDir"}"""
      val fullLine = head +
        s""""queries":$qs,"query_min":$qmins,"errors":$errFull,""" +
        s""""elapsed_sec":${fmt(elapsedSec)},"sf":"$sfDir"}"""
      (line, fullLine)
    }
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_result.json")
    def writeFile(fullLine: String): Unit =
      try {
        val w = new java.io.PrintWriter(new java.io.File(outPath), "UTF-8")
        try w.println(fullLine) finally w.close()
      } catch { case _: Throwable => () } // file emit is best-effort

    // SIGTERM/timeout path: if the normal emit never ran, print whatever
    // completed. Runs concurrently with Spark's own stop hook — this hook
    // only formats strings and writes, it never touches the SparkContext.
    val hook = new Thread(() => {
      if (emitted.compareAndSet(false, true)) {
        val (line, fullLine) = buildJson(partial = true)
        writeFile(fullLine)
        println(line)
        System.out.flush()
      }
    }, "bench-partial-emit")
    Runtime.getRuntime.addShutdownHook(hook)

    // Warm-up: run every plan once on the tiny sf so codegen/JIT costs
    // don't land on whichever timed query happens to run first.
    val warmDir =
      if (new java.io.File("/root/testdata/sf0.001").isDirectory) "/root/testdata/sf0.001"
      else sfDir
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
      releaseDeadState()
    }

    // Timed passes; pass-major order so iteration i of every query sees
    // comparable JVM/heap state, rather than hammering one query back-to-back
    // (which would overstate cache warmth and understate GC interference).
    var pass = 0
    var lastPassSec = 0.0
    var continue = true
    while (continue && pass < itersReq) {
      pass += 1
      val passT0 = System.nanoTime()
      SparkEntry.queries.toSeq.zipWithIndex.foreach { case ((name, fn), i) =>
        val q0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            // strip EVERY control char (not just whitespace) plus quote
            // and backslash — a raw newline in a native error message
            // would make the hand-built JSON unparseable (Verify's q()
            // escapes <0x20 for the same reason)
            val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
              .replaceAll("[\\x00-\\x1f\"\\\\]+", " ").take(120)
            lock.synchronized {
              errors.getOrElseUpdate(name.takeWhile(_ != '_'), msg)
            }
        }
        val secs = (System.nanoTime() - q0) / 1e9
        lock.synchronized { current += ((i, secs)) }
        releaseDeadState() // between entries — outside the timed region
      }
      lock.synchronized {
        passes += current.toSeq.sortBy(_._1).map(_._2)
        current.clear()
      }
      lastPassSec = (System.nanoTime() - passT0) / 1e9
      // incremental emit: a later kill still finds this pass's medians
      writeFile(buildJson(partial = pass < itersReq)._2)
      // auto-degrade: stop starting passes that cannot fit the budget
      if (budgetSec > 0 && pass < itersReq &&
          elapsedSec + lastPassSec > budgetSec) {
        System.err.println(f"[bench] budget: elapsed $elapsedSec%.0f s + " +
          f"projected pass $lastPassSec%.0f s > $budgetSec s — " +
          s"degrading from $itersReq to $pass iterations")
        continue = false
      }
    }

    emitted.set(true) // normal emit from here on; hook becomes a no-op
    val partial = passes.size < itersReq
    val (line, fullLine) = buildJson(partial)
    writeFile(fullLine)
    spark.stop()
    // Last line of this program's stdout — keep it last so tail-scraping
    // drivers can parse it without regex-hunting through Spark shutdown logs.
    println(line)
  }
}
