package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-fixture pins for the ICD-CM master enrichment
  * (load_ref.icdcm_codes.R) — the semantics the DuckDB oracle cannot
  * isolate: truncated-fallback precedence and ambiguity blanking,
  * the LEAD-preference fill (the reference case_when order), ICD-9
  * single-pass NA retention, the EAR/EYE quirk, the plain-language →
  * normalize recode CHAIN, the bracket strip, RDA any-flags, and the
  * CCW vocabulary stop-gate. */
class IcdcmEnrichSpec extends SparkSpec {
  import spark.implicits._

  private def master(rows: (String, Int)*): DataFrame =
    rows.toSeq.toDF("icdcode", "ver")
      .withColumn("dx_description", concat(lit("DX "), col("icdcode")))
      .select("icdcode", "dx_description", "ver")

  private val noExt = Seq.empty[(String, Int, String, String, String)]
    .toDF("code", "version", "intent", "mechanism", "mechanism_full")
  private val noCcw = Seq.empty[(String, Int, String)]
    .toDF("dx", "ver", "ccw_abbrev")
  private val noCcs9 = Seq.empty[(String, String, String, String,
      String, String, String)]
    .toDF("icdcode", "ccs", "multiccs_lv1", "multiccs_lv2",
      "multiccs_lv3", "multiccs_lv2_description",
      "multiccs_lv3_description")
  private val noCcs10 = Seq.empty[(String, String, String)]
    .toDF("icdcode", "ccs_detail_code", "ccs_detail_desc")
  private val noXwalk = Seq.empty[(String, String, String)]
    .toDF("ccs_detail_desc", "ccs_midlevel_desc", "ccs_superlevel_desc")
  private val noRda = Seq.empty[(String, Int, String)]
    .toDF("code", "icdcm_version", "sub_group_condition")

  private def ccs10(rows: (String, String, String)*): DataFrame =
    rows.toSeq.toDF("icdcode", "ccs_detail_code", "ccs_detail_desc")

  private def run(m: DataFrame, ext: DataFrame = noExt,
      ccw: DataFrame = noCcw, c9: DataFrame = noCcs9,
      c10: DataFrame = noCcs10, xw: DataFrame = noXwalk,
      rda: DataFrame = noRda): Map[String, org.apache.spark.sql.Row] =
    IcdcmEnrich.enrich(m, ext, ccw, Seq("copd", "diabetes"), c9, c10,
        xw, rda)
      .collect().map(r => r.getString(r.fieldIndex("icdcm")) -> r).toMap

  test("injury matrix: full beats 6-digit beats 5-digit; ambiguous " +
      "truncations blanked; version-9 joins at full code only") {
    val m = master(("T1111X", 10), ("T2222X", 10), ("T3333", 10),
      ("T4444X", 10), ("9111", 9), ("9222", 9))
    val ext = Seq(
      // T1111X: exact matrix row AND a 7-char sibling — the sibling
      // makes both truncations ambiguous, so only the full hit lands
      ("T1111X", 10, "full", "mf", "mff"),
      ("T1111XA", 10, "six-noise", "m6", "mf6"),
      // T2222X: unique 7-char row → 6-digit fallback
      ("T2222XA", 10, "six", "m6", "mf6"),
      // T3333 (5 chars): unique 7-char row → 5-digit fallback
      ("T3333XY", 10, "five", "m5", "mf5"),
      // T4444X: TWO 7-char rows sharing both truncations → blanked,
      // no match at any level
      ("T4444XA", 10, "amb-a", "ma", "mfa"),
      ("T4444XB", 10, "amb-b", "mb", "mfb"),
      // version 9: exact only — 9111 hits, 9222 has no row
      ("9111", 9, "v9", "m9", "mf9"))
      .toDF("code", "version", "intent", "mechanism", "mechanism_full")
    // every ICD-10 code CCSR-seeded — this test pins the injury arms,
    // not the fill loop (which throws on unseedable codes)
    val c10 = ccs10(("'T1111X'", "'NEO021'", "X"),
      ("'T2222X'", "'NEO021'", "X"), ("'T3333'", "'NEO021'", "X"),
      ("'T4444X'", "'NEO021'", "X"))
    val out = run(m, ext = ext, c10 = c10)
    assert(out("T1111X").getAs[String]("intent") === "full")
    assert(out("T2222X").getAs[String]("intent") === "six")
    assert(out("T3333").getAs[String]("intent") === "five")
    assert(out("T4444X").getAs[String]("intent") === null)
    assert(out("9111").getAs[String]("intent") === "v9")
    assert(out("9222").getAs[String]("intent") === null)
  }

  test("ICD-10 fill prefers the LEAD branch even when the lead is " +
      "NULL (reference case_when order) and converges backward from " +
      "block-tail seeds") {
    // Block K00x0: members K0010 < K0020 < K0030, seed at the TAIL.
    // Pass 1 fills K0020 (lead = seed), pass 2 fills K0010.
    val m = master(("K0010", 10), ("K0020", 10), ("K0030", 10))
    val out = run(m,
      c10 = ccs10(("'K0030'", "'NEO021'", "Cancer of thyroid")))
    assert(out("K0010").getAs[String]("ccs_detail_code") === "NEO021")
    assert(out("K0020").getAs[String]("ccs_broad_desc") === "Neoplasms")
    assert(out("K0030").getAs[Int]("ccs_catch_all") === 1)
  }

  test("ICD-10 fill refuses non-convergent input (head-seeded block " +
      "tail deadlocks — the shape the reference loops forever on)") {
    // Seed at the HEAD: K0020's lead K0030 shares the 4-prefix and is
    // NULL; K0030's lag K0020 is NULL — mutual wait, never converges.
    val m = master(("K0010", 10), ("K0020", 10), ("K0030", 10))
    val e = intercept[IllegalArgumentException] {
      run(m, c10 = ccs10(("'K0010'", "'NEO021'", "Cancer of thyroid")))
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("ICD-9 fill is a SINGLE 3-digit pass: the seed's lag fills, " +
      "two-hop rows keep their NA") {
    val m = master(("9000", 9), ("9002", 9), ("9004", 9), ("9006", 9))
    val c9 = Seq(("9004", "99", "7", "7.2", "7.2.9",
        "Cat [of] 7.2", "L3 [of] 7.2.9"))
      .toDF("icdcode", "ccs", "multiccs_lv1", "multiccs_lv2",
        "multiccs_lv3", "multiccs_lv2_description",
        "multiccs_lv3_description")
    val out = run(m, c9 = c9)
    // 9002's lead is the seed → fills; 9000's lead 9002 was NULL when
    // the single pass ran; 9006's 3L matches NULL-lead... wait: 9006's
    // lead is absent (last row) so 3G lag=9004 fills it too
    assert(out("9004").getAs[String]("ccs_detail_desc") ===
      "Heart disease")
    assert(out("9002").getAs[String]("ccs_detail_desc") ===
      "Heart disease")
    assert(out("9006").getAs[String]("ccs_detail_desc") ===
      "Heart disease")
    assert(out("9000").getAs[String]("ccs_detail_desc") === null)
  }

  test("CCS-9 derivation: EAR/EYE code-desc mismatch kept, bracket " +
      "strip + trim, plain-language then normalize recode chain, " +
      "broad recode on Gangrene, catch-all") {
    val m = master(("9010", 9), ("9020", 9), ("9030", 9), ("9040", 9))
    val c9 = Seq(
      ("9010", "99", "6", "6.7", "6.7.9", "Cat [x] 6.7", "L3"),
      ("9020", "99", "6", "6.8", "6.8.9", "Cat [x] 6.8", "L3"),
      ("9030", "99", "9", "9.2", "9.2.9", "Cat [x] 9.2", "L3"),
      ("9040", "99", "3", "3.4", "3.4.9", " Gangrene [necrosis]", "L3"))
      .toDF("icdcode", "ccs", "multiccs_lv1", "multiccs_lv2",
        "multiccs_lv3", "multiccs_lv2_description",
        "multiccs_lv3_description")
    val out = run(m, c9 = c9)
    val r67 = out("9010")
    assert(r67.getAs[String]("ccs_broad_desc") ===
      "Diseases of the eye and adnexa")
    assert(r67.getAs[String]("ccs_broad_code") === "EAR")
    val r68 = out("9020")
    assert(r68.getAs[String]("ccs_broad_desc") ===
      "Diseases of the ear and mastoid process")
    assert(r68.getAs[String]("ccs_broad_code") === "EYE")
    // 9.2: plain-language 'Dental disease' then normalize to the
    // cross-version label
    assert(out("9030").getAs[String]("ccs_detail_desc") ===
      "Any dental condition including traumatic injury")
    assert(out("9030").getAs[String]("ccs_broad_code") === "DEN")
    // Gangrene: bracket strip+trim yields the key; broad recode END→CIR
    val g = out("9040")
    assert(g.getAs[String]("ccs_detail_desc") === "Gangrene")
    assert(g.getAs[String]("ccs_broad_code") === "CIR")
    assert(g.getAs[Int]("ccs_catch_all") === 1)
  }

  test("RDA flags: any-coalesces, dual-condition code, ICD-9 row " +
      "carries NULL sud_inhalant after the bind") {
    val m = master(("F1010", 10), ("9050", 9))
    val rda = Seq(("F1010", 10, "mh_adhd"), ("F1010", 10, "sud_opioid"),
        ("9050", 9, "sud_alcohol"))
      .toDF("code", "icdcm_version", "sub_group_condition")
    val out = run(m,
      c10 = ccs10(("'F1010'", "'MBD004'", "Anything")), rda = rda)
    val f = out("F1010")
    assert(f.getAs[Int]("mh_adhd") === 1)
    assert(f.getAs[Int]("sud_opioid") === 1)
    assert(f.getAs[Int]("mh_any") === 1)
    assert(f.getAs[Int]("sud_any") === 1)
    assert(f.getAs[Int]("bh_any") === 1)
    assert(f.getAs[Any]("sud_cannabis") === null)
    val n = out("9050")
    assert(n.getAs[Int]("sud_any") === 1)
    assert(n.getAs[Any]("mh_any") === null)
    assert(n.getAs[Int]("bh_any") === 1)
    assert(n.getAs[Any]("sud_inhalant") === null)
  }

  test("CCW: flags land per (dx, ver); the vocabulary gate throws on " +
      "an undeclared abbrev (the reference stop())") {
    val m = master(("F2020", 10), ("9060", 9))
    val ccw = Seq(("F2020", 10, "diabetes"), ("F2020", 10, "copd"),
        ("9060", 9, "copd"))
      .toDF("dx", "ver", "ccw_abbrev")
    val out = run(m, ccw = ccw,
      c10 = ccs10(("'F2020'", "'MBD004'", "Anything")))
    assert(out("F2020").getAs[Int]("ccw_diabetes") === 1)
    assert(out("F2020").getAs[Int]("ccw_copd") === 1)
    assert(out("9060").getAs[Int]("ccw_copd") === 1)
    assert(out("9060").getAs[Any]("ccw_diabetes") === null)
    val bad = Seq(("F2020", 10, "asthma")).toDF("dx", "ver", "ccw_abbrev")
    val e = intercept[IllegalArgumentException] {
      run(m, ccw = bad, c10 = ccs10(("'F2020'", "'MBD004'", "X")))
    }
    assert(e.getMessage.contains("vocabulary"))
  }

  test("xwalk joins on the NORMALIZED detail desc; CCSR punct strip " +
      "cleans code keys; missing key leaves mid/super NULL") {
    val m = master(("G1110", 10), ("G1120", 10))
    val c10 = ccs10(
      ("'G1110'", "'PNL001'", "Liveborn"),
      ("'G1120'", "'SYM012'", "Fever"))
    val xw = Seq(("Birth of child", "MID B", "SUPER 1"))
      .toDF("ccs_detail_desc", "ccs_midlevel_desc", "ccs_superlevel_desc")
    val out = run(m, c10 = c10, xw = xw)
    val b = out("G1110")
    assert(b.getAs[String]("ccs_detail_desc") === "Birth of child")
    assert(b.getAs[String]("ccs_midlevel_desc") === "MID B")
    assert(b.getAs[String]("ccs_broad_code") === "PNL")
    val fv = out("G1120")
    assert(fv.getAs[String]("ccs_detail_desc") === "Fever of unknown origin")
    assert(fv.getAs[Any]("ccs_midlevel_desc") === null)
  }
}
