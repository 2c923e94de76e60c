package graft.builds

import java.sql.Date
import java.time.LocalDate
import scala.util.Random
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The single-scan membership-flag path must equal the reference-shaped
  * distinct-set-algebra path on random value-set tables — INTERSECT ≡ AND
  * and EXCEPT ≡ AND NOT over per-claim MAX flags. */
class FuhMeasureSpec extends SparkSpec {

  test("one-scan flag algebra equals the set-op algebra") {
    val s = spark
    import s.implicits._
    val vsNames = Seq("Mental Illness", "Mental Health Diagnosis",
      "Inpatient Stay", "Nonacute Inpatient Stay")
    val codeSets = Seq("ICD10CM", "UBREV", "UBTOB", "CPT")
    for (seed <- 1 to 10) {
      val rng = new Random(seed)
      val rows = (1 to 120).map { _ =>
        val id = 1L + rng.nextInt(6)
        val claim = 1L + rng.nextInt(25)
        (id, claim, vsNames(rng.nextInt(vsNames.size)),
          codeSets(rng.nextInt(codeSets.size)),
          if (rng.nextBoolean()) "Y" else "N")
      }
      val vs = rows.toDF("id_person", "claim_id", "value_set_name",
        "code_set", "primary_dx_only")
      val header = (1L to 25L).map { c =>
        val admit = LocalDate.of(1996, 1, 1).plusDays(c * 11 % 300)
        (c, Date.valueOf(admit), Date.valueOf(admit.plusDays(c % 4)),
          Date.valueOf(admit), Date.valueOf(admit.plusDays(c % 4)))
      }.toDF("claim_id", "admit_date", "discharge_date",
        "first_service_date", "last_service_date")
      val demo = (1L to 6L).map(i =>
          (i, Date.valueOf(LocalDate.of(1950, 1, 1).plusDays(i * 777))))
        .toDF("id_person", "dob")
      // reference-shaped filtered views over the one membership table
      def view(name: String, cs: Seq[String], primary: Boolean = false) = {
        val base = vs.filter(col("value_set_name") === name &&
          col("code_set").isin(cs: _*))
        (if (primary) base.filter(col("primary_dx_only") === "Y") else base)
          .select(col("id_person"), col("claim_id"))
      }
      val miDx = view("Mental Illness", Seq("ICD10CM"), primary = true)
      val mhdDx = view("Mental Health Diagnosis", Seq("ICD10CM"), primary = true)
      val inp = view("Inpatient Stay", Seq("UBREV"))
      val na = view("Nonacute Inpatient Stay", Seq("UBREV", "UBTOB"))
      def sortedRows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toString).sorted.toSeq
      val flags = FuhMeasure.membershipFlags(vs)
      assert(sortedRows(FuhMeasure.indexStays(miDx, mhdDx, inp, na, demo, header))
        === sortedRows(FuhMeasure.indexStaysOneScan(flags, demo, header)),
        s"indexStays seed=$seed")
      assert(sortedRows(FuhMeasure.readmitStays(mhdDx, inp, na, header))
        === sortedRows(FuhMeasure.readmitStaysOneScan(flags, header)),
        s"readmitStays seed=$seed")
      // the whole membership algebra costs ONE partial-aggregated shuffle
      val plan = flags.queryExecution.executedPlan.toString
      assert(plan.linesIterator.count(_.contains("Exchange")) == 1,
        s"membershipFlags should have exactly one Exchange:\n$plan")
    }
  }
}
