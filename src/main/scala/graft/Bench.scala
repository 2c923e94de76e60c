package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query wall times.
  *
  * Methodology (VERDICT r2 #10, r5 #1): queries run in the fixed declaration
  * order of [[SparkEntry.queries]] (a ListMap), after a warm-up pass over
  * every query at the smallest scale factor — so JVM/codegen warm-up is paid
  * before timing. Each query is then timed over `SPARK_GRAFT_BENCH_ITERS`
  * (default 3) full passes and the per-query MEDIAN is reported, with the
  * per-query MIN alongside — single-run numbers on a shared JVM proved too
  * noisy to distinguish a real regression from GC/scheduling variance
  * (r5 verdict: +21% on untouched queries, unfalsifiable at n=1).
  *
  * The JSON line is printed to stdout AND written to
  * `SPARK_GRAFT_BENCH_OUT` (default `bench_result.json` in the CWD), and it
  * is printed after `spark.stop()` so it is the last line this program
  * emits (sbt's own `[success]` banner may still follow when run via sbt —
  * hence the file).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // best-effort parse: a malformed env value must not kill the bench
    // before the JSON contract the harness scrapes is emitted
    val iters = math.max(1, scala.util.Try(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").trim.toInt)
      .getOrElse(3))
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: run every plan once on the tiny sf so codegen/JIT costs
    // don't land on whichever timed query happens to run first.
    val warmDir =
      if (new java.io.File("/root/testdata/sf0.001").isDirectory) "/root/testdata/sf0.001"
      else sfDir
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }
    val names = SparkEntry.queries.keys.toSeq
    // A query that throws must be REPORTED, not timed as a phantom-fast
    // entry: the r7 TIMESTAMP_NTZ breakage showed as 0.06 s "wins" for the
    // five streaming queries because this loop swallowed the exception.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // iters full passes; pass-major order so iteration i of every query sees
    // comparable JVM/heap state, rather than hammering one query back-to-back
    // (which would overstate cache warmth and understate GC interference).
    val samples: Seq[Seq[Double]] = (1 to iters).map { _ =>
      SparkEntry.queries.toSeq.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            // strip EVERY control char (not just whitespace) plus quote
            // and backslash — a raw  in a native error message
            // would make the hand-built JSON unparseable (Verify's q()
            // escapes <0x20 for the same reason)
            val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
              .replaceAll("[\\x00-\\x1f\"\\\\]+", " ").take(120)
            errors.getOrElseUpdate(name.takeWhile(_ != '_'), msg)
        }
        (System.nanoTime() - t0) / 1e9
      }
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.size
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val med = names.indices.map(i => median(samples.map(_(i))))
    val mins = names.indices.map(i => samples.map(_(i)).min)
    // The driver captures only the LAST ~2000 chars of output; full query
    // names x 9-decimal doubles made the r2/r3 JSON line ~2.4k chars, so it
    // was truncated mid-line and never parsed. Short keys (the qNN prefix)
    // + 3-decimal seconds keep the whole line compact.
    // Locale.ROOT: f"" uses the JVM default locale, which in comma-decimal
    // locales (de_DE) would print "1,234" — invalid JSON.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val keys = names.map(_.takeWhile(_ != '_'))
    require(keys.distinct.size == keys.size,
      s"duplicate qNN bench keys: ${keys.diff(keys.distinct).mkString(",")}")
    val qs = keys.zip(med)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val qmins = keys.zip(mins)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = med.sum
    // Errors: qNN keys only on the tail-capped stdout line; full (truncated)
    // messages in the file. An empty object means every query ran clean.
    val errKeys = errors.keys.map("\"" + _ + "\"").mkString("[", ",", "]")
    val errFull = errors
      .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    // stdout line stays under the driver's ~2k tail-capture: medians only.
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","iters":$iters,""" +
      s""""queries":$qs,"errors":$errKeys,"sf":"$sfDir"}"""
    // Full detail (per-query min alongside the median) goes to the file.
    val fullLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","iters":$iters,""" +
      s""""queries":$qs,"query_min":$qmins,"errors":$errFull,"sf":"$sfDir"}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_result.json")
    try {
      val w = new java.io.PrintWriter(new java.io.File(outPath), "UTF-8")
      try w.println(fullLine) finally w.close()
    } catch { case _: Throwable => () } // file emit is best-effort
    spark.stop()
    // Last line of this program's stdout — keep it last so tail-scraping
    // drivers can parse it without regex-hunting through Spark shutdown logs.
    println(line)
  }
}
