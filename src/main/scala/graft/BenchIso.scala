package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** TEMP dev tool (round 11): isolated n-run re-measure of named queries
  * with per-stage executor time, to settle the r10 driver-artifact
  * variance question on q185/q186. Deleted after BENCH_NOTES_r11. */
object BenchIso {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "5").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Long, Long)] // id, execRunMs, gcMs, rows
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        stages += ((s.stageInfo.stageId, m.executorRunTime,
          m.jvmGCTime, m.outputMetrics.recordsWritten))
      }
    })
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, "/root/testdata/sf0.001").count() // warm codegen/JIT
      val times = (1 to iters).map { i =>
        stages.clear()
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        val gc = stages.map(_._3).sum
        val run = stages.map(_._2).sum
        println(f"[iso] $n pass$i: $sec%.2f s wall, $rows rows, " +
          f"${stages.size} stages, execRun ${run / 1000.0}%.1f s, " +
          f"gc ${gc / 1000.0}%.1f s")
        // top-5 stages by executor run time
        stages.sortBy(-_._2).take(5).foreach { case (id, r, g, _) =>
          println(f"[iso]    stage $id: run ${r / 1000.0}%.1f s gc ${g / 1000.0}%.1f s")
        }
        sec
      }
      val st = times.sorted
      println(f"[iso] $n SUMMARY min ${st.head}%.2f median ${st(st.size / 2)}%.2f max ${st.last}%.2f over $iters")
    }
    spark.stop()
  }
}
