package graft.builds

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** FUA index-visit feeder: set algebra (dx ∩ (rev ∪ proc)), window filter,
  * and the T-SQL exact-anniversary age including the Feb-29 clamp. */
class FuaMeasureSpec extends SparkSpec {

  private def d(s: String) = Date.valueOf(s)

  test("dx INTERSECT (rev UNION proc) with window and age filters") {
    val s = spark
    import s.implicits._
    // claims: 1 dx+rev (in), 2 dx+proc (in), 3 dx only (out),
    // 4 rev only (out), 5 dx+rev but out of window (out),
    // 6 dx+rev but member under age (out)
    val dx = Seq((10L, 1L, d("1996-02-01")), (10L, 2L, d("1996-03-01")),
      (10L, 3L, d("1996-04-01")), (10L, 5L, d("1997-02-01")),
      (20L, 6L, d("1996-05-01")))
      .toDF("id_person", "claim_id", "svc_date")
    val rev = Seq((10L, 1L, d("1996-02-01")), (10L, 4L, d("1996-06-01")),
      (10L, 5L, d("1997-02-01")), (20L, 6L, d("1996-05-01")))
      .toDF("id_person", "claim_id", "svc_date")
    val proc = Seq((10L, 2L, d("1996-03-01")))
      .toDF("id_person", "claim_id", "svc_date")
    val demo = Seq((10L, d("1960-01-01")), (20L, d("1990-01-01")))
      .toDF("id_person", "dob")
    val out = FuaMeasure.indexVisits(dx, rev, proc, demo,
      "1996-01-01", "1996-12-31", minAge = 18)
      .select("claim_id").as[Long].collect().toSet
    assert(out === Set(1L, 2L))
  }

  test("ageAt matches T-SQL anniversary semantics incl. Feb-29 clamp") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (d("2000-06-15"), d("2020-06-14")), // day before anniversary -> 19
      (d("2000-06-15"), d("2020-06-15")), // on anniversary -> 20
      // Feb-29 dob, non-leap year: DATEADD clamps the 21st anniversary to
      // 2021-02-28, which is NOT > the 28th itself -> already 21 that day
      // (T-SQL agrees: DATEADD(YEAR, 21, '2000-02-29') = '2021-02-28')
      (d("2000-02-29"), d("2021-02-28")),
      (d("2000-02-29"), d("2021-03-01"))
    ).toDF("dob", "at")
    val ages = rows.select(FuaMeasure.ageAt(col("dob"), col("at")).as("age"))
      .as[Int].collect().toSeq
    assert(ages === Seq(19, 20, 21, 21))
  }
}
