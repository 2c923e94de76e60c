package graft.builds

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hand-computed fixtures for the Medicare enrollment timeline
  * (load_stage.mcare_elig_timevar.R): ResDAC recodes, the
  * NULL-propagating cov_type_sum drop, death truncation, collapse. */
class McareEligTimevarSpec extends SparkSpec {

  private def d(s: String) = Date.valueOf(s)

  private def wideRow(id: String, year: Int, zip: String,
      buyin: String, hmo: String, rx: String, dual: String) = {
    // identical codes for all 12 months
    val months = (1 to 12).flatMap(_ => Seq(buyin, hmo, rx, dual))
    (Seq(id, year.toString, zip) ++ months)
  }

  private def bene(rows: Seq[Seq[String]]) = {
    val s = spark
    import s.implicits._
    val cols = Seq("id_mcare", "cal_year_s", "zip_cd") ++
      (1 to 12).flatMap { m =>
        val mm = f"$m%02d"
        Seq(s"buyin_$mm", s"hmo_$mm", s"rx_$mm", s"dual_$mm")
      }
    val df = rows.map {
      r => (r(0), r(1), r(2), r.drop(3))
    }.toDF("id_mcare", "cal_year_s", "zip_cd", "rest")
    val exploded = (1 to 48).foldLeft(df) { (acc, i) =>
      acc.withColumn(cols(2 + i), col("rest").getItem(i - 1))
    }
    exploded.withColumn("cal_year", col("cal_year_s").cast("int"))
      .drop("cal_year_s", "rest")
  }

  test("ResDAC recodes: valid, invalid (NULL) and no-coverage codes") {
    val s = spark
    import s.implicits._
    val r = Seq(("3", "1", "E4", "02"), ("9", "5", "Q", "77"),
      ("0", "0", "N", "00"))
      .toDF("b", "h", "rx", "du")
      .select(McareEligTimevar.partA(col("b")).as("pa"),
        McareEligTimevar.partB(col("b")).as("pb"),
        McareEligTimevar.partC(col("h")).as("pc"),
        McareEligTimevar.partD(col("rx")).as("pd"),
        McareEligTimevar.stateBuyin(col("b")).as("sb"),
        McareEligTimevar.partialDual(col("du")).as("pdl"),
        McareEligTimevar.fullDual(col("du")).as("fd"))
      .collect()
    assert(r(0).toSeq == Seq(1, 1, 1, 1, 0, 0, 1)) // 3/1/E4/02
    assert(r(1).toSeq == Seq(null, null, null, null, null, null, null))
    assert(r(2).toSeq == Seq(0, 0, 0, 0, 0, 0, 0))
  }

  test("NULL flag nulls cov_type_sum and drops the month") {
    val s = spark
    import s.implicits._
    // buyin '9' is not in any recode list -> part_a NULL -> sum NULL ->
    // the whole person-year vanishes even though part_c would be 1
    val b = bene(Seq(wideRow("E1", 1994, "98101", "9", "1", "N", "00")))
    val demo = Seq(("E1", null: Date)).toDF("id_mcare", "death_dt")
    val out = McareEligTimevar.build(b, demo, Seq("98101"))
    assert(out.count() == 0)
  }

  test("death truncation and the year-long collapse") {
    val s = spark
    import s.implicits._
    val b = bene(Seq(wideRow("E2", 1994, "98101", "3", "1", "E4", "02")))
    val demo = Seq(("E2", d("1994-08-10"))).toDF("id_mcare", "death_dt")
    val rows = McareEligTimevar.build(b, demo, Seq("98101"))
      .orderBy("from_date").collect()
    // 12 identical months collapse to ONE interval, truncated at death
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[Date]("from_date") == d("1994-01-01"))
    assert(r.getAs[Date]("to_date") == d("1994-08-10"))
    assert(r.getAs[Int]("cov_time_day") == 222)
    assert(r.getAs[Int]("geo_kc") == 1)
    assert(r.getAs[Int]("part_a") == 1 && r.getAs[Int]("full_dual") == 1)
  }

  test("short zip nulls geo_zip; attribute change splits the interval") {
    val s = spark
    import s.implicits._
    val row = wideRow("E3", 1994, "981", "0", "1", "N", "00")
    // flip December's buyin to '3' (adds part A+B) -> separate interval;
    // Dec buyin sits at index 3 + 11*4 = 47
    val flipped = row.updated(47, "3")
    val b = bene(Seq(flipped))
    val demo = Seq(("E3", null: Date)).toDF("id_mcare", "death_dt")
    val rows = McareEligTimevar.build(b, demo, Seq("98101"))
      .orderBy("from_date").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[String]("geo_zip") == null))
    assert(rows.forall(_.getAs[Int]("geo_kc") == 0))
    assert(rows(0).getAs[Date]("to_date") == d("1994-11-30"))
    assert(rows(1).getAs[Int]("part_a") == 1)
    assert(rows(1).getAs[Int]("contiguous") == 1)
  }
}
