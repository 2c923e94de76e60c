package graft.builds

import java.sql.Date
import java.time.LocalDate
import scala.util.Random
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The greedy one-pass ED dedup must equal the reference's WHILE-loop
  * fixed point (fn_perf_fua_ed_index_visit_exclusion.sql:95-185): each
  * iteration drops the FIRST kept visit that is < 31 days after its kept
  * predecessor, until none remain. The model below implements that loop
  * literally; the operator must match it on random timelines. */
class FumMeasureSpec extends SparkSpec {

  private val epoch = LocalDate.of(1996, 1, 1)

  /** literal WHILE-loop model over one person's sorted visit days */
  private def whileLoopModel(days: Seq[Int]): Seq[(Int, Int)] = {
    val sorted = days.sorted
    val dropped = scala.collection.mutable.Set.empty[Int] // indices
    var changed = true
    while (changed) {
      val kept = sorted.indices.filterNot(dropped)
      val offender = kept.zip(kept.drop(1)).collectFirst {
        case (prev, cur) if sorted(cur) - sorted(prev) < 31 => cur
      }
      changed = offender.isDefined
      offender.foreach(dropped += _)
    }
    sorted.indices.map(i => sorted(i) -> (if (dropped(i)) 1 else 0))
  }

  test("greedyEdDedup equals the reference WHILE-loop on random timelines") {
    val s = spark
    import s.implicits._
    for (seed <- 1 to 15) {
      val rng = new Random(seed)
      val rows = (1 to 5).flatMap { id =>
        val n = 1 + rng.nextInt(8)
        // distinct days so the (fsd, lsd, claim) order is unambiguous
        rng.shuffle((0 until 400).toList).take(n).map { day =>
          (id.toLong, (id * 1000 + day).toLong, 30,
            Date.valueOf(epoch.plusDays(day)), Date.valueOf(epoch.plusDays(day)))
        }
      }
      val df = rows.toDF("id_person", "claim_id", "age",
        "first_service_date", "last_service_date")
      val got = FumMeasure.greedyEdDedup(df)
        .select("id_person", "first_service_date", "ed_within_30_day")
        .collect()
        .map(r => (r.getLong(0),
          r.getDate(1).toLocalDate.toEpochDay - epoch.toEpochDay,
          r.getInt(2)))
        .groupBy(_._1)
        .map { case (id, g) =>
          id -> g.map(t => (t._2.toInt, t._3)).sortBy(_._1).toSeq }
      val want = rows.groupBy(_._1).map { case (id, g) =>
        id -> whileLoopModel(g.map(r =>
          (r._4.toLocalDate.toEpochDay - epoch.toEpochDay).toInt))
      }
      assert(got == want, s"seed=$seed")
    }
  }
}
