package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: time a comma-separated subset of catalog queries at
  * sf0.1 (warm pass at sf0.001 first, then 3 timed passes) — the
  * single-query complement of the full `Bench` main. */
object QBench {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val passes = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "100"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n0 =>
      val n = SparkEntry.queries.keys.find(_.startsWith(n0)).getOrElse(n0)
      val fn = SparkEntry.queries(n)
      fn(spark, "/root/testdata/sf0.001").count()
      (1 to passes).foreach { i =>
        val t0 = System.nanoTime()
        val r = fn(spark, sfDir).count()
        println(f"[qb] $n pass$i ${(System.nanoTime()-t0)/1e9}%.2f s ($r rows)")
        // release dead localCheckpoint blocks between passes (outside
        // the timed region) — the Bench loop's state-release discipline
        spark.sparkContext.getPersistentRDDs.valuesIterator
          .foreach(_.unpersist(blocking = false))
      }
    }
    spark.stop()
  }
}
