package graft.builds

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed fixture for the new-vs-old criteria cross-check:
  * one person per interesting case, verdicts computed on paper. */
class CcwNewCriteriaQaSpec extends SparkSpec {

  private def phenos = CcwNewCriteriaQa.Phenos.filter(p =>
    p.abbrev == "mi" || p.abbrev == "depression")

  test("per-phenotype verdicts: new ⊆ old, adjacency rejections " +
    "counted as old_not_new") {
    val s = spark
    import s.implicits._
    // mi: types1=(1), count 1. depression: t1=(1), t2=(2,3,4,5),
    // count 2, lookback 24 months.
    // p1: one inpatient MI claim            -> mi new+old
    // p2: one OUTpatient MI-flagged claim   -> mi neither (type not in
    //     list; still evidence? no: evidence restricted to type list)
    // p3: depression, 2 carrier claims 3 months apart  -> new+old
    // p4: depression, 2 carrier claims 30 months apart -> old only
    //     (adjacency fails) => old_not_new
    // p5: depression, 1 carrier claim -> neither (d2=1)
    val header = Seq(
      ("p1", 101L, 1, "2019-01-10"),
      ("p2", 201L, 4, "2019-02-10"),
      ("p3", 301L, 2, "2019-03-01"), ("p3", 302L, 2, "2019-06-01"),
      ("p4", 401L, 2, "2017-01-01"), ("p4", 402L, 2, "2019-07-01"),
      ("p5", 501L, 2, "2019-05-01"))
      .toDF("id_mcaid", "claim_header_id", "claim_type_id", "fsd")
      .withColumn("first_service_date", to_date(col("fsd"))).drop("fsd")
    val dx = Seq(
      ("p1", 101L, "I214", 10, "01"),
      ("p2", 201L, "I214", 10, "01"),
      ("p3", 301L, "F329", 10, "02"), ("p3", 302L, "F329", 10, "01"),
      ("p4", 401L, "F329", 10, "01"), ("p4", 402L, "F331", 10, "03"),
      ("p5", 501L, "F329", 10, "01"))
      .toDF("id_mcaid", "claim_header_id", "icdcm_norm",
        "icdcm_version", "icdcm_number")
    val ref = Seq(
      ("I214", 10, 1, 0, 0, 0), ("F329", 10, 0, 0, 0, 1),
      ("F331", 10, 0, 0, 0, 1))
      .toDF("icdcm", "icdcm_version", "ccw_mi", "ccw_hip_fracture",
        "ccw_anemia", "ccw_depression")
    val got = CcwNewCriteriaQa.build(header, dx, ref, phenos)
      .orderBy("ccw_desc").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getString(7))).toMap
    // mi: p1 span; evidence claims = p1 only (p2's claim type 4 not in
    // mi's list); old = p1.
    assert(got("ccw_mi") == ((1L, 1L, 1L, 1L, 0L, 0L, "PASS")))
    // depression: spans p3 (3-month adjacency); old = p3, p4 (2 distinct
    // dates each); p4 rejected by the 24-month window -> old_not_new=1;
    // evidence claims = 5 carrier claims (p3 2, p4 2, p5 1).
    assert(got("ccw_depression") ==
      ((1L, 5L, 3L, 2L, 0L, 1L, "PASS")))
  }
}
