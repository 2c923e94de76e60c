package graft.builds

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hand-computed fixtures for the treatment-penetration value-set kernels
  * (create_stage.v_perf_tpm_*.sql) — the version/date cut, the
  * UNION/INTERSECT numerator, the cross-join sub-group fan-out, the
  * pharmacy-class recode, and the MH/AOD pivot. */
class ValueSetMeasuresSpec extends SparkSpec {

  private def d(s: String) = Date.valueOf(s)
  private val cut = "2000-01-01"

  private def rdaFixture = {
    val s = spark
    import s.implicits._
    Seq(
      ("MH-procedure-value-set", "CPT", "P1", null: String, "Y"),
      ("MH-procedure-with-Dx-value-set", "HCPCS", "P2", null: String, "Y"),
      ("MH-Dx-value-set", "ICD9CM", "D9", "Depression", "Y"),
      ("MH-Dx-value-set", "ICD10CM", "D10", "Anxiety", "Y"),
      ("MH-Rx-value-set", "NDC", "N1", "Antimania Rx", "Y"))
      .toDF("value_set_name", "code_set", "code", "sub_group", "active")
  }

  test("dxValueSet applies the per-version date cut on one equi-join") {
    val s = spark
    import s.implicits._
    val dx = Seq(
      // ICD9 before the cut: kept
      (1L, 10L, d("1999-05-01"), 9, "01", "D9"),
      // ICD9 after the cut: dropped
      (1L, 11L, d("2000-05-01"), 9, "01", "D9"),
      // ICD10 after the cut: kept
      (2L, 12L, d("2000-05-01"), 10, "01", "D10"),
      // ICD10 before the cut: dropped
      (2L, 13L, d("1999-05-01"), 10, "01", "D10"),
      // secondary position: dropped when primaryOnly
      (3L, 14L, d("2000-05-01"), 10, "02", "D10"),
      // code outside the set: dropped
      (3L, 15L, d("2000-05-01"), 10, "01", "DX"))
      .toDF("id_person", "claim_id", "first_service_date",
        "icdcm_version", "icdcm_number", "icdcm_norm")
    val primary = ValueSetMeasures.dxValueSet(dx, rdaFixture,
        "MH-Dx-value-set", primaryOnly = true, cut)
      .select("claim_id").as[Long].collect().sorted
    assert(primary.toSeq == Seq(10L, 12L))
    val any = ValueSetMeasures.dxValueSet(dx, rdaFixture,
        "MH-Dx-value-set", primaryOnly = false, cut)
      .select("claim_id").as[Long].collect().sorted
    assert(any.toSeq == Seq(10L, 12L, 14L))
  }

  test("tpm numerator = proc UNION (proc-with-dx INTERSECT primary-dx)") {
    val s = spark
    import s.implicits._
    val proc = Seq(
      (1L, 20L, d("2000-02-01"), "P1"), // alone-arm hit
      (2L, 21L, d("2000-03-01"), "P2"), // with-dx arm, dx matches below
      (3L, 22L, d("2000-04-01"), "P2"), // with-dx arm, NO matching dx
      (4L, 23L, d("2000-05-01"), "PX")) // no value set
      .toDF("id_person", "claim_id", "first_service_date",
        "procedure_code")
    val dx = Seq(
      // same (person, claim, date) as claim 21's procedure: intersects
      (2L, 21L, d("2000-03-01"), 10, "01", "D10"),
      // dx-only claim: in denominator, not numerator
      (5L, 24L, d("2000-06-01"), 10, "02", "D10"))
      .toDF("id_person", "claim_id", "first_service_date",
        "icdcm_version", "icdcm_number", "icdcm_norm")
    val pharm = Seq((6L, 25L, d("2000-07-01"), "N1"))
      .toDF("id_person", "claim_id", "rx_fill_date", "ndc")
    val num = ValueSetMeasures.tpmNumerator(proc, dx, rdaFixture, cut)
    assert(num.select("claim_id").as[Long].collect().sorted.toSeq ==
      Seq(20L, 21L))
    val den = ValueSetMeasures.tpmDenominator(num, dx, pharm,
      rdaFixture, cut)
    assert(den.select("claim_id").as[Long].collect().sorted.toSeq ==
      Seq(20L, 21L, 24L, 25L))
    // staging folds claims to one MAX(flag) row per (ym, person)
    val st = ValueSetMeasures.staging(den, "TPM", "D")
    assert(st.count() == 4)
    assert(st.select("year_month").as[Int].collect().sorted.toSeq ==
      Seq(200002, 200003, 200006, 200007))
  }

  test("by-dx: proc fans out to all sub-groups, rx classes recode") {
    val s = spark
    import s.implicits._
    val subGroups = Seq("Anxiety", "Depression")
    val proc = Seq(
      (1L, 30L, d("2000-02-01"), "P1"), // fans out to BOTH sub-groups
      (2L, 31L, d("2000-03-01"), "P2")) // gates claim 31's dx arm
      .toDF("id_person", "claim_id", "first_service_date",
        "procedure_code")
    val dx = Seq(
      (2L, 31L, d("2000-03-01"), 10, "01", "D10"),  // kept: with-dx proc
      (3L, 32L, d("2000-04-01"), 10, "01", "D10"))  // dropped: no proc
      .toDF("id_person", "claim_id", "first_service_date",
        "icdcm_version", "icdcm_number", "icdcm_norm")
    val num = ValueSetMeasures.tpmByDxNumerator(proc, dx, rdaFixture,
      subGroups, cut)
    val got = num.select("claim_id", "sub_group").as[(Long, String)]
      .collect().sorted.toSeq
    assert(got == Seq((30L, "Anxiety"), (30L, "Depression"),
      (31L, "Anxiety")))
    val pharm = Seq((6L, 35L, d("2000-07-01"), "N1"))
      .toDF("id_person", "claim_id", "rx_fill_date", "ndc")
    val den = ValueSetMeasures.tpmByDxDenominator(dx, pharm, rdaFixture,
      Map("Antimania Rx" -> "Mania/Bipolar"), cut)
    val dgot = den.select("claim_id", "sub_group").as[(Long, String)]
      .collect().sorted.toSeq
    // both dx rows (any position) keep their code sub-group; the NDC
    // class recodes to its dx sub-group
    assert(dgot == Seq((31L, "Anxiety"), (32L, "Anxiety"),
      (35L, "Mania/Bipolar")))
  }

  test("one-scan tpm staging equals the set-op path on random claims") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(11)
    def d0(n: Int) = d(f"2000-${n % 12 + 1}%02d-0${n % 27 % 9 + 1}")
    val proc = Seq.fill(80)((rng.nextInt(8).toLong, rng.nextInt(30).toLong,
        d0(rng.nextInt(200)), s"P${rng.nextInt(4)}"))
      .toDF("id_person", "claim_id", "first_service_date",
        "procedure_code")
    val dx = Seq.fill(80)((rng.nextInt(8).toLong, rng.nextInt(30).toLong,
        d0(rng.nextInt(200)), if (rng.nextBoolean()) 9 else 10,
        if (rng.nextBoolean()) "01" else "02",
        s"D${if (rng.nextBoolean()) 9 else 10}"))
      .toDF("id_person", "claim_id", "first_service_date",
        "icdcm_version", "icdcm_number", "icdcm_norm")
    val pharm = Seq.fill(30)((rng.nextInt(8).toLong,
        rng.nextInt(30).toLong, d0(rng.nextInt(200)),
        if (rng.nextBoolean()) "N1" else "NX"))
      .toDF("id_person", "claim_id", "rx_fill_date", "ndc")
    val cut2 = "2000-07-01"
    val a = ValueSetMeasures.tpmStaging(proc, dx, pharm, rdaFixture,
      "TPM", cut2).collect().toSet
    val b = ValueSetMeasures.tpmStagingOneScan(proc, dx, pharm,
      rdaFixture, "TPM", cut2).collect().toSet
    assert(a.map(_.toSeq) == b.map(_.toSeq))
  }

  test("mhAodEd pivots episode flags; dual-set episodes get both") {
    val s = spark
    import s.implicits._
    val hedis = Seq(
      ("Mental Illness", "ICD10CM", "F32"),
      ("AOD Abuse and Dependence", "ICD10CM", "F10"))
      .toDF("value_set_name", "code_set", "code")
    val headers = Seq(
      (Some(1L), 10, "F32"),  // MI only
      (Some(2L), 10, "F10"),  // AOD only
      (Some(3L), 10, "F32"),  // both (two claims, one episode)
      (Some(3L), 10, "F10"),
      (None: Option[Long], 10, "F32"), // NULL episode: dropped
      (Some(4L), 9, "F32"),   // wrong version: dropped
      (Some(5L), 10, "Z99"))  // no set: no row
      .toDF("ed_pophealth_id", "icdcm_version", "primary_diagnosis")
    val got = ValueSetMeasures.mhAodEd(headers, hedis)
      .orderBy("ed_pophealth_id")
      .as[(Long, Int, Int)].collect().toSeq
    assert(got == Seq((1L, 1, 0), (2L, 0, 1), (3L, 1, 1)))
  }
}
