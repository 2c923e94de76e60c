package graft.queries

/** Shared fixture data for q326 (the ICD-CM master enrichment,
  * load_ref.icdcm_codes.R) — single source for the Spark fixture in
  * [[LifecycleQueries.q326IcdcmEnrich]] AND SparkEntry's generated
  * DuckDB oracle (the RefTables.NoHarmsCodes discipline: literal
  * vocabularies render once, into both sides, so they cannot drift).
  *
  * The fixture derives everything from the q282 master universe
  * (pk = p_partkey % 400): ICD-9 codes '9'||lpad(pk,3), ICD-10 codes
  * A/B/C by pk%3, plus q326's planted 7-char-capable D families
  * (pk%20==5 → D…A/D…B 6-char siblings for the 5-digit fill branch;
  * pk%20==15 → D…XA/D…XB 7-char siblings for the 6-digit branch).
  *
  * CCS seeding rule (both sides): ICD-10 codes carry a CCSR row iff
  * pk%10 ∈ {0,7,8,9} — the TAIL of every 10-block. Tail seeding is
  * load-bearing: the reference's fill case_when prefers the LEAD
  * branch, so a row whose lead shares its prefix copies the lead
  * even when NULL — values propagate BACKWARD within a prefix block
  * and only the block's LAST member pulls from its lag. {7,8,9}
  * seeds the last member of every nonempty mod-3 residue class per
  * block; {0} keeps lone-member 3-prefix groups (C200 at small SF)
  * alive. Convergence: ≤3 passes; oracle unrolls 4. ICD-9 seeds
  * pk%2==0 ∧ pk%10 ∈ {0,4} — mid-block, so its SINGLE pass fills
  * one row per block and faithfully leaves the tail NA.
  */
object IcdcmFixture {

  /** ICD-9 CCS branch table, selected by v = (pk div 2) % 19:
    * (lv1, lv2, lv3, ccs, lv2descOverride, lv3descOverride).
    * Defaults when override is None: lv2desc = 'Cat [of] '||lv2,
    * lv3desc = 'L3 [of] '||lv3 (bracket-strip leaves a double space —
    * deliberate, pins the strip+trim semantics). Branches cover: every
    * structurally distinct broad rule incl. the 3.10→BLD carve-out
    * and the 6.7/EAR 6.8/EYE mismatch, lv3-sourced detail (2.2,
    * 17.1, 17.2), ccs=259 and ccs^26&lv1=18, both plain-language→
    * normalize chains (9.2 dental, 5.11 alcohol), both broad recodes
    * (Gangrene, Allergic reactions), and three catch-all codes
    * (2.14, 3.4, 2618). */
  val ccs9Branches: Seq[(String, String, String, String,
      Option[String], Option[String])] = Seq(
    /* v0  */ ("1", "1.2", "1.2.9", "99", None, None),
    /* v1  */ ("2", "2.2", "2.2.1", "99", None, None),
    /* v2  */ ("2", "2.11", "2.11.2", "99", None, None),
    /* v3  */ ("2", "2.14", "2.14.9", "99", None, None),
    /* v4  */ ("3", "3.4", "3.4.9", "99",
      Some(" Gangrene [necrosis]"), None),
    /* v5  */ ("3", "3.10", "3.10.9", "99", None, None),
    /* v6  */ ("5", "5.11", "5.11.9", "99", None, None),
    /* v7  */ ("6", "6.5", "6.5.9", "99", None, None),
    /* v8  */ ("6", "6.7", "6.7.9", "99", None, None),
    /* v9  */ ("6", "6.8", "6.8.9", "99", None, None),
    /* v10 */ ("9", "9.2", "9.2.9", "99", None, None),
    /* v11 */ ("17", "17.1", "17.1.9", "99", None,
      Some("Allergic reactions [unspec]")),
    /* v12 */ ("7", "7.2", "7.2.9", "99", None, None),
    /* v13 */ ("17", "17.2", "17.2.3", "99", None, None),
    /* v14 */ ("18", "18.1", "18.1.9", "259", None, None),
    /* v15 */ ("18", "18.2", "18.2.9", "2618", None, None),
    /* v16 */ ("13", "13.2", "13.2.9", "99", None, None),
    /* v17 */ ("11", "11.4", "11.4.9", "99", None, None),
    /* v18 */ ("8", "8.6", "8.6.9", "99", None, None))

  /** ICD-10 CCSR branch table, selected by w = (pk div 3) % 8:
    * (detail code, detail desc) — the raw csv values BEFORE the
    * punctuation strip (both get quote-wrapped by the fixture).
    * Covers four catch-all codes, four normalize recodes, and one
    * desc shared with the normalized ICD-9 side (DEN002). */
  val ccs10Branches: Seq[(String, String)] = Seq(
    /* w0 */ ("NEO021", "Cancer of thyroid"),
    /* w1 */ ("PNL001", "Liveborn"),
    /* w2 */ ("CIR007",
      "Hypertension with complications and secondary hypertension"),
    /* w3 */ ("SYM012", "Fever"),
    /* w4 */ ("MBD004",
      "Schizophrenia spectrum and other psychotic disorders"),
    /* w5 */ ("END015", "Mineral metabolism disorders"),
    /* w6 */ ("INJ026", "Superficial injury; contusion"),
    /* w7 */ ("DEN002",
      "Any dental condition including traumatic injury"))

  /** The midlevel/superlevel crosswalk's detail-desc key list —
    * a strict subset of the NORMALIZED descs the branches above can
    * produce (missing keys exercise the left-join null arm: 'L3 ' /
    * 'Cat  3.10' / EXT / Fever etc. are deliberately absent).
    * mid = 'MID '||substr(desc,1,3), super =
    * 'SUPER '||(length(desc)%4), computed identically both sides. */
  val xwalkDescs: Seq[String] = Seq(
    "Fungal infections",
    "Cat  2.14",
    "Gangrene",
    "Alcohol-related disorders",
    "Headache; including migraine",
    "Cat  6.7",
    "Any dental condition including traumatic injury",
    "Allergic reactions",
    "Heart disease",
    "_UNCLASSIFIED",
    "Joint disorders (e.g., arthritis)",
    "Pregnancy/childbirth complications",
    "Birth of child",
    "Hypertension",
    "Cancer of thyroid")

  /** CCW condition vocabulary (sorted = published column order). */
  val ccwAbbrevs: Seq[String] =
    Seq("copd", "depression", "diabetes", "hypertension")
}
