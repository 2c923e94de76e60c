package graft.core

import java.sql.Date
import java.time.LocalDate
import scala.util.Random
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Property-based suite for the interval algebra (SURVEY §5): seeded random
  * timelines, 20 cases per property. Properties mirror the reference's QA
  * invariants for elig_timevar (collapse idempotent, day counts preserved,
  * islands partition the person timeline, gaps consistent).
  */
class IntervalsSpec extends SparkSpec {

  private val epoch = LocalDate.of(2020, 1, 1)

  /** Random person-interval frame: nIds entities, each with up to
    * maxIvl intervals of 1-20 days separated by 0-10 day gaps. */
  private def genIntervals(seed: Long, nIds: Int = 4, maxIvl: Int = 8): DataFrame = {
    val s = spark
    import s.implicits._
    val rng = new Random(seed)
    val rows = (1 to nIds).flatMap { id =>
      var day = rng.nextInt(30)
      (0 until (1 + rng.nextInt(maxIvl))).map { _ =>
        val from = epoch.plusDays(day)
        val len = rng.nextInt(20)
        val to = from.plusDays(len)
        day += len + rng.nextInt(11)
        (id.toLong, Date.valueOf(from), Date.valueOf(to))
      }
    }
    rows.toDF("id", "from", "to")
  }

  private def daySet(df: DataFrame): Set[(Long, LocalDate)] =
    df.collect().flatMap { r =>
      val id = r.getLong(0)
      val f = r.getDate(1).toLocalDate
      val t = r.getDate(2).toLocalDate
      Iterator.iterate(f)(_.plusDays(1)).takeWhile(!_.isAfter(t)).map(id -> _)
    }.toSet

  test("property: collapse is idempotent") {
    for (seed <- 1 to 20) {
      val in = genIntervals(seed)
      val once = Intervals.collapseIntervals(in, Seq("id"), "from", "to", maxGapDays = 1)
      val twice = Intervals.collapseIntervals(once, Seq("id"), "from", "to", maxGapDays = 1)
      assert(once.orderBy("id", "from").collect().toSeq ==
        twice.orderBy("id", "from").collect().toSeq, s"seed=$seed")
    }
  }

  test("property: collapse preserves the covered day set (maxGap=0)") {
    for (seed <- 21 to 40) {
      val in = genIntervals(seed)
      val out = Intervals.collapseIntervals(in, Seq("id"), "from", "to", maxGapDays = 0)
      assert(daySet(out) == daySet(in), s"seed=$seed")
    }
  }

  test("property: collapsed intervals are disjoint and separated by > maxGap") {
    for (seed <- 41 to 60; maxGap <- Seq(0, 1, 3)) {
      val out = Intervals
        .collapseIntervals(genIntervals(seed), Seq("id"), "from", "to", maxGap)
        .orderBy("id", "from").collect()
        .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getDate(2).toLocalDate))
      out.sliding(2).foreach {
        case Array((id1, _, t1), (id2, f2, _)) if id1 == id2 =>
          assert(java.time.temporal.ChronoUnit.DAYS.between(t1, f2) > maxGap,
            s"seed=$seed maxGap=$maxGap: islands not separated")
        case _ => ()
      }
    }
  }

  test("property: clipDays over a partition of windows sums to clipDays of the whole") {
    val s = spark
    import s.implicits._
    for (seed <- 61 to 80) {
      val in = genIntervals(seed)
      val whole = in.select(sum(Intervals.clipDays(col("from"), col("to"),
        to_date(lit("2020-01-15")), to_date(lit("2020-04-14"))))).head().getLong(0)
      // split [01-15, 04-14] into three adjacent windows
      val parts = Seq(("2020-01-15", "2020-02-10"), ("2020-02-11", "2020-03-05"),
        ("2020-03-06", "2020-04-14")).map { case (f, t) =>
        in.select(sum(Intervals.clipDays(col("from"), col("to"),
          to_date(lit(f)), to_date(lit(t))))).head().getLong(0)
      }
      assert(parts.sum == whole, s"seed=$seed: ${parts.sum} != $whole")
    }
  }

  test("property: islandKeyByStep agrees with islandIds on unit-dense month runs") {
    val s = spark
    import s.implicits._
    for (seed <- 81 to 95) {
      val rng = new Random(seed)
      val rows = (1 to 3).flatMap { id =>
        var m = rng.nextInt(12)
        (0 until (1 + rng.nextInt(10))).map { _ =>
          m += 1 + (if (rng.nextBoolean()) 0 else 1 + rng.nextInt(3))
          (id.toLong, m)
        }
      }.distinct
      val df = rows.toDF("id", "month_idx")
        .withColumn("from", date_add(to_date(lit("2020-01-01")), col("month_idx") * 31))
        .withColumn("to", col("from"))
      // arithmetic islands over the dense step vs lag/flag islands over the
      // expanded dates (31-day spacing, maxGap 31 merges only adjacent steps)
      val byStep = Intervals.islandKeyByStep(df, Seq("id"), "month_idx")
        .groupBy("id", "island_id").agg(count(lit(1)).as("n"), min("month_idx").as("m0"))
        .select("id", "n", "m0").orderBy("id", "m0")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val byLag = Intervals.islandIds(df, Seq("id"), "from", "to", maxGapDays = 31)
        .groupBy("id", "island_id").agg(count(lit(1)).as("n"), min("month_idx").as("m0"))
        .select("id", "n", "m0").orderBy("id", "m0")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(byStep.toSeq == byLag.toSeq, s"seed=$seed")
    }
  }

  test("collapseTimevar: vars subset merges, ids restrict, cov_time_day recomputed") {
    val s = spark
    import s.implicits._
    val df = Seq(
      // id 1: plan constant, zip flips mid-run -> one merged interval
      (1L, "2020-01-01", "2020-01-31", "A", "Z1"),
      (1L, "2020-02-01", "2020-02-29", "A", "Z2"),
      // gap > 1 day -> new island even with same plan
      (1L, "2020-04-01", "2020-04-30", "A", "Z2"),
      // id 2: plan change splits
      (2L, "2020-01-01", "2020-01-31", "A", "Z1"),
      (2L, "2020-02-01", "2020-02-29", "B", "Z1"),
      // id 3: excluded by the ids restriction
      (3L, "2020-01-01", "2020-01-31", "A", "Z1"))
      .toDF("id", "f", "t", "plan", "zip")
      .withColumn("f", to_date(col("f"))).withColumn("t", to_date(col("t")))
    val out = Intervals.collapseTimevar(df, "id", "f", "t", Seq("plan"),
        ids = Some(Seq(1L, 2L)))
      .orderBy("id", "f")
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("plan"),
        r.getAs[java.sql.Date]("f").toString, r.getAs[java.sql.Date]("t").toString,
        r.getAs[Int]("cov_time_day")))
    assert(out.toSeq == Seq(
      (1L, "A", "2020-01-01", "2020-02-29", 60),
      (1L, "A", "2020-04-01", "2020-04-30", 30),
      (2L, "A", "2020-01-01", "2020-01-31", 31),
      (2L, "B", "2020-02-01", "2020-02-29", 29)))
    intercept[IllegalArgumentException] {
      Intervals.collapseTimevar(df, "id", "f", "t", Nil)
    }
  }

  test("gapDays: pre/post gaps are consistent between neighbors and 0 at edges") {
    for (seed <- 96 to 105) {
      val in = Intervals.collapseIntervals(genIntervals(seed), Seq("id"), "from", "to", 0)
      val out = Intervals.gapDays(in, Seq("id"), "from", "to")
        .orderBy("id", "from").collect()
        .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getDate(2).toLocalDate,
          r.getInt(3), r.getInt(4)))
      val byId = out.groupBy(_._1)
      byId.foreach { case (_, rows) =>
        assert(rows.head._4 == 0)  // first pre_gap
        assert(rows.last._5 == 0)  // last post_gap
        rows.sliding(2).foreach {
          case Array((_, _, t1, _, post1), (_, f2, _, pre2, _)) =>
            val gap = java.time.temporal.ChronoUnit.DAYS.between(t1, f2) - 1
            assert(post1 == gap && pre2 == gap, s"seed=$seed")
          case _ => ()
        }
      }
    }
  }
}
