package graft.builds

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the full-refresh address combine + PHA restore semantics
  * (load_stage.address_clean_full.R). */
class AddressCleanFullSpec extends SparkSpec {
  import spark.implicits._

  private def addr(a1: String, a2: String) =
    (a1, a2, "SEA", "WA", "98101")

  test("fullCombine: joint rows carry both flags; NA-equal on NULL keys") {
    val mcaid = Seq(addr("1 A ST", null.asInstanceOf[String]),
        addr("2 B ST", null.asInstanceOf[String]))
      .toDF("geo_add1_raw", "geo_add2_raw", "geo_city_raw",
        "geo_state_raw", "geo_zip_raw")
    // pha's blank add2 folds to NULL, then NA-equal-joins mcaid's NULL
    val pha = Seq(addr("1 A ST", ""), addr("3 C ST", null))
      .toDF("geo_add1_raw", "geo_add2_raw", "geo_city_raw",
        "geo_state_raw", "geo_zip_raw")
    val manual = Seq(addr("3 C ST", null))
      .toDF("geo_add1_raw", "geo_add2_raw", "geo_city_raw",
        "geo_state_raw", "geo_zip_raw")
    val out = AddressClean.fullCombine(mcaid, pha, manual)
      .collect()
      .map(r => r.getAs[String]("geo_add1_raw") ->
        (Option(r.getAs[Integer]("geo_source_mcaid")),
          Option(r.getAs[Integer]("geo_source_pha"))))
      .toMap
    // 1 A ST: joint (both flags); 2 B ST: mcaid-only; 3 C ST: manually
    // corrected -> trimmed out of the combine entirely
    assert(out == Map(
      "1 A ST" -> (Some(Integer.valueOf(1)), Some(Integer.valueOf(1))),
      "2 B ST" -> (Some(Integer.valueOf(1)), None)))
  }

  test("phaRestore: xfer copies raw->clean, unit_* restore, flag recompute") {
    val full = Seq(
      // pha row the service never matched -> pha_xfer
      ("1 A ST", null, "SEA", "WA", "98101",
        null, null, null, null, null,
        null.asInstanceOf[Integer], null.asInstanceOf[Integer],
        null.asInstanceOf[Integer], Integer.valueOf(1)),
      // manual row: no source flags, overridden=1 -> counts as mcaid
      ("9 Z ST", "STE 1", "SEA", "WA", "98101",
        "9 Z STREET", "UNIT 2", "SEA", "WA", "98101",
        Integer.valueOf(0), Integer.valueOf(1),
        null.asInstanceOf[Integer], null.asInstanceOf[Integer]))
      .toDF("geo_add1_raw", "geo_add2_raw", "geo_city_raw",
        "geo_state_raw", "geo_zip_raw", "geo_add1_clean",
        "geo_add2_clean", "geo_city_clean", "geo_state_clean",
        "geo_zip_clean", "po_box", "overridden", "geo_source_mcaid",
        "geo_source_pha")
    val phaFull = Seq(
      ("1 A STREET ORIG", "APT 1", "FL 2", "SEATTLE", "WA", "98101",
        "1 A ST", null.asInstanceOf[String], "SEA", "WA", "98101"))
      .toDF("unit_add", "unit_apt", "unit_apt2", "unit_city",
        "unit_state", "unit_zip", "geo_add1_raw", "geo_add2_raw",
        "geo_city_raw", "geo_state_raw", "geo_zip_raw")
    val out = AddressClean.phaRestore(full, phaFull).collect()
    val phaRow = out.find(_.getAs[String]("geo_add3_raw") == "FL 2").get
    // raw restored from unit_*, clean backfilled from the JOINED key
    assert(phaRow.getAs[String]("geo_add1_raw") == "1 A STREET ORIG")
    assert(phaRow.getAs[String]("geo_add2_raw") == "APT 1")
    assert(phaRow.getAs[String]("geo_add1_clean") == "1 A ST")
    assert(phaRow.getAs[Int]("geo_source_pha") == 1)
    assert(phaRow.getAs[Int]("geo_source_mcaid") == 0)
    val manRow = out.find(_.getAs[String]("geo_add1_raw") == "9 Z ST").get
    // overridden counts as a Medicaid source; overridden coalesces to 1
    assert(manRow.getAs[Int]("geo_source_mcaid") == 1)
    assert(manRow.getAs[Int]("overridden") == 1)
    assert(manRow.getAs[Int]("geo_source_pha") == 0)
  }
}
