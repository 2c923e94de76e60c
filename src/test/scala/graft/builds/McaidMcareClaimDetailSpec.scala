package graft.builds

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the combined-detail kernels' semantics (McaidMcareClaimDetail):
  * the id-migration map's branch exclusivity / null-out / deterministic
  * pick, and the asymmetric per-source refresh windows. */
class McaidMcareClaimDetailSpec extends SparkSpec {
  import spark.implicits._

  private def xw(rows: (Int, Option[Int], Option[String])*) =
    rows.toDF("id_apde", "id_mcaid", "id_mcare")

  test("idMigrationMap: branches match only like-patterned rows") {
    // old: mcaid-only person 1, mcare-only person 2, dual person 3
    val old = xw((1, Some(10), None), (2, None, Some("C20")),
      (3, Some(30), Some("C30")))
    // new: same persons re-cut to 100x ids; a DECOY dual row sharing
    // person 1's mcaid id must NOT capture the mcaid-only row
    val nw = xw((100, Some(10), None), (200, None, Some("C20")),
      (300, Some(30), Some("C30")), (999, Some(10), Some("C99")))
    val m = McaidMcareClaimDetail.idMigrationMap(old, nw)
      .collect().map(r => r.getInt(0) -> r.get(1)).toMap
    assert(m == Map(1 -> 100, 2 -> 200, 3 -> 300))
  }

  test("idMigrationMap: unmatched old ids map to null (person fell out)") {
    val old = xw((1, Some(10), None), (2, None, Some("C20")))
    val nw = xw((100, Some(10), None))
    val m = McaidMcareClaimDetail.idMigrationMap(old, nw)
      .collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    assert(m == Map(1 -> Some(100), 2 -> None))
  }

  test("idMigrationMap: duplicate new matches resolve to min, not arbitrary") {
    val old = xw((1, Some(10), None))
    val nw = xw((500, Some(10), None), (100, Some(10), None))
    val m = McaidMcareClaimDetail.idMigrationMap(old, nw).collect()
    assert(m.map(_.get(1)).toSeq == Seq(100))
  }

  test("remapIds rewrites ids and nulls un-crosswalked rows") {
    val old = xw((1, Some(10), None), (2, None, Some("C20")))
    val nw = xw((100, Some(10), None))
    val existing = Seq((1, "a"), (2, "b"), (7, "orphan"))
      .toDF("id_apde", "claim_id")
    val out = McaidMcareClaimDetail.remapIds(existing, old, nw)
      .collect().map(r => r.getString(1) -> Option(r.get(0))).toMap
    // id 1 → 100; id 2's person fell out → null; id 7 not in old xwalk
    // at all (stale row) → null, same as the reference's LEFT JOIN UPDATE
    assert(out == Map("a" -> Some(100), "b" -> None, "orphan" -> None))
  }

  test("refresh applies asymmetric per-source windows") {
    val d = (s: String) => java.sql.Date.valueOf(s)
    val existing = Seq(
      ("mcaid", d("1997-05-31"), "keep-before-day-cut"),
      ("mcaid", d("1997-06-01"), "drop-on-day-cut"),
      ("mcare", d("1996-12-31"), "keep-prior-year"),
      ("mcare", d("1997-01-01"), "drop-in-cut-year"))
      .toDF("source_desc", "first_service_date", "tag")
    val rebuilt = Seq(
      ("mcaid", d("1997-05-31"), "NEW-too-early-excluded"),
      ("mcaid", d("1997-07-01"), "NEW-in-window"),
      ("mcare", d("1997-03-01"), "NEW-in-year"))
      .toDF("source_desc", "first_service_date", "tag")
    val out = McaidMcareClaimDetail.refresh(existing, rebuilt,
        mcaidDate = Some("1997-06-01"), mcareYear = Some(1997))
      .select("tag").as[String].collect().toSet
    assert(out == Set("keep-before-day-cut", "keep-prior-year",
      "NEW-in-window", "NEW-in-year"))
  }

  test("refresh with no cutoffs passes the existing table through") {
    val existing = Seq(("mcaid", java.sql.Date.valueOf("1997-06-01"), "x"))
      .toDF("source_desc", "first_service_date", "tag")
    val rebuilt = existing.withColumn("tag", lit("replacement"))
    val out = McaidMcareClaimDetail.refresh(existing, rebuilt, None, None)
      .select("tag").as[String].collect().toSeq
    assert(out == Seq("x"))
  }
}
