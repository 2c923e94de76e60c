package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ref-table loader kernels: the ICD order-file parse/combine
  * keep-first semantics, the NPI charclass/mode pick, and the
  * chronic-meds wildcard quirk — hand-computed rows (the catalog
  * oracles q282/q283/q286 pin the full compositions). */
class RefTablesSpec extends SparkSpec {

  test("parseIcdOrderFile: code at 7-12, description at 17-77, order " +
      "number / flag / long tail skipped, NO trimming") {
    val s = spark
    import s.implicits._
    //        1-5   6 7-12  13 14 15-16 17..
    val line = "00001 A01   " + " " + "1" + "  " +
      ("SHORT DESC".padTo(61, ' ')) + "LONG TAIL IGNORED"
    val got = RefTables.parseIcdOrderFile(Seq(line).toDF("value"))
      .collect().head
    assert(got.getString(0) == "A01   ") // raw: padding kept
    assert(got.getString(1) == "SHORT DESC".padTo(61, ' '))
  }

  test("combineIcdcm keep-first: old master beats new; among new " +
      "years the EARLIEST description wins; pre-trim exact-dup drop") {
    val s = spark
    import s.implicits._
    def yr(y: Int, rows: (String, String)*) =
      y -> rows.map { case (c, d) =>
        "00001 " + c.padTo(6, ' ') + " 1  " + d.padTo(61, ' ') + "TAIL"
      }.toDF("value")
    val y19 = yr(2019, ("AAA", "first desc"), ("BBB", "stable"))
    val y20 = yr(2020, ("AAA", "second desc"), ("BBB", "stable"),
      ("CCC", "new in 2020"))
    val old = Seq(("AAA", "OLD WINS", 10), ("9XX", "icd9 row", 9))
      .toDF("icdcode", "dx_description", "ver")
    val got = RefTables.combineIcdcm(Seq(y19, y20), old)
      .collect().map(r => (r.getString(0), r.getInt(2)) -> r.getString(1))
      .toMap
    assert(got(("AAA", 10)) == "OLD WINS")      // old beats both years
    assert(got(("BBB", 10)) == "stable")        // exact dup collapsed
    assert(got(("CCC", 10)) == "new in 2020")
    assert(got(("9XX", 9)) == "icd9 row")
    assert(got.size == 4)
  }

  test("apcdProviderNpi: charclass gate (no leading zero, exactly ten " +
      "digits), most-common pick with npi-asc tie-break, master " +
      "exclusion, shared NPI keeps both providers") {
    val s = spark
    import s.implicits._
    val master = Seq((1L, 1000000001L)).toDF("provider_id_apcd", "npi")
    val provider = Seq(
      (1L, "2222222222"),            // in master -> excluded from arm 2
      (2L, "0123456789"),            // leading zero -> gated out
      (2L, "123456789"),             // nine digits -> gated out
      (2L, "12345678901"),           // eleven digits -> gated out
      (2L, "3333333333"),            // the only valid -> picked
      (3L, "4444444444"), (3L, "4444444444"), (3L, "5555555555"),
      (4L, "4444444444"),            // shares provider 3's NPI -> kept
      (5L, "6666666666"), (5L, "7777777777") // tie -> npi asc wins
    ).toDF("provider_id_apcd", "orig_npi")
    val got = RefTables.apcdProviderNpi(master, provider)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(got(1L) == (1000000001L, 1)) // master row, flag 1
    assert(got(2L) == (3333333333L, 0))
    assert(got(3L) == (4444444444L, 0)) // mode: 2 x 4444... beats 5555
    assert(got(4L) == (4444444444L, 0)) // shared NPI kept
    assert(got(5L) == (6666666666L, 0)) // exact tie -> npi asc
    assert(got.size == 5)
  }

  test("chronicMedsCrosswalk: '%'-names match ANYWHERE after the strip " +
      "(str_detect is unanchored — 'met%' matches 'dimetapp', the " +
      "reference quirk), plain names anchor as prefixes, multi-match " +
      "expands, non-match keeps one NULL row") {
    val s = spark
    import s.implicits._
    val meds = Seq("dimetapp", "metformin er", "golden syrup",
      "ungolden thing").toDF("ndc_desc")
    val list = Seq(("met%", "diabetes"), ("golden", "metallic"))
      .toDF("drug_name", "med_category")
    val got = RefTables.chronicMedsCrosswalk(meds, list)
      .collect().map(r => (r.getString(0), Option(r.getString(1))))
    // 'met%' -> contains 'met': dimetapp AND metformin er both match
    assert(got.contains(("dimetapp", Some("met%"))))
    assert(got.contains(("metformin er", Some("met%"))))
    // '^golden': prefix only
    assert(got.contains(("golden syrup", Some("golden"))))
    assert(got.contains(("ungolden thing", None))) // left-join NULL row
    assert(!got.contains(("ungolden thing", Some("golden"))))
  }

  test("ethnicityMapCheck: unmapped ids surface with NULL map columns, " +
      "and the id2 probe JOINS ON id1 (the reference's shipped quirk) — " +
      "an unmapped id2 with a MAPPED id1 does NOT surface") {
    val s = spark
    import s.implicits._
    val elig = Seq((1L, 99L), (25L, 2L)).toDF("ethnicity_id1",
      "ethnicity_id2")
    val map = Seq((1L, "E1", 0L, "R0"), (2L, "E2", 1L, "R1"))
      .toDF("ethnicity_id", "ethnicity_desc", "race_id", "race_desc")
    val got = RefTables.ethnicityMapCheck(elig, map).collect()
      .map(r => (r.getAs[String]("variable"),
        r.getAs[Long]("unmapped_id"))).toSet
    // id1 probe: only 25 is unmapped
    assert(got.contains(("ethnicity_id1", 25L)))
    assert(!got.contains(("ethnicity_id1", 1L)))
    // id2 probe joins on ID1: row (1, 99) has MAPPED id1 -> 99 hidden;
    // row (25, 2) has unmapped id1 -> id2 = 2 surfaces (quirk)
    assert(got.contains(("ethnicity_id2", 2L)))
    assert(!got.contains(("ethnicity_id2", 99L)))
  }

  test("apcdProviderNpiQa: a planted 5-digit master NPI and a " +
      "duplicated provider both count") {
    val s = spark
    import s.implicits._
    val ref = Seq((1L, 12345L, 1), (2L, 1000000002L, 0),
      (2L, 2000000002L, 0))
      .toDF("provider_id_apcd", "npi", "provider_master_flag")
    val got = RefTables.apcdProviderNpiQa(ref).collect()
      .map(r => r.getAs[String]("qa_type") -> r.getAs[Long]("qa")).toMap
    assert(got("# of NPIs with length != 10, expect 0") == 1L)
    assert(got("# of provider IDs with >1 row, expect 0") == 1L)
  }
}
