package graft.sources

import graft.SparkSpec

/** Hand fixtures for the round-12 second-batch reference loaders:
  * NPPES taxonomy reshape, HEDIS code normalization, RDA value-set
  * refresh kernels, FDA NDC mojibake strip. */
class RefTables3Spec extends SparkSpec {

  import spark.implicits._

  private def nppesRow(npi: String,
      slots: Map[Int, (String, String)],
      state: String = "WA", entity: String = "1",
      deact: String = null): org.apache.spark.sql.DataFrame = {
    val cols = Seq("npi", "entity_type_code", "name_org", "name_last",
      "name_first", "address_practice_first", "address_practice_second",
      "address_practice_city", "address_practice_state",
      "address_practice_zip_code", "enumeration_date", "last_update",
      "deactivation_date", "gender_code") ++
      (1 to 15).map(i => s"healthcare_provider_taxonomy_code_$i") ++
      (1 to 15).map(i =>
        s"healthcare_provider_primary_taxonomy_switch_$i")
    val base: Seq[String] = Seq(npi, entity, null, "LAST", "F",
      "1 MAIN", null, "SEATTLE", state, "981011234", "2008-01-15",
      "2020-01-01", deact, "M") ++
      (1 to 15).map(i => slots.get(i).map(_._1).orNull) ++
      (1 to 15).map(i => slots.get(i).map(_._2).orNull)
    Seq(Seq(base).map(s => org.apache.spark.sql.Row(s: _*))).flatten
      .pipe(rows => spark.createDataFrame(
        spark.sparkContext.parallelize(rows),
        org.apache.spark.sql.types.StructType(cols.map(c =>
          org.apache.spark.sql.types.StructField(c,
            org.apache.spark.sql.types.StringType)))))
  }

  implicit class Pipe[A](a: A) {
    def pipe[B](f: A => B): B = f(a)
  }

  test("nppesApdeLoad: duplicate slot collapses, primary ranks first, " +
      "alphabetical after, multi-primary fans out") {
    // one NPI: T30 in slots 1+3 (switch N then Y -> collapses to
    // primary), T10 alphabetically first but NOT primary
    val single = nppesRow("1000000001", Map(
      1 -> ("T30", "N"), 2 -> ("T10", "N"), 3 -> ("T30", "Y")))
    val r1 = RefTables.nppesApdeLoad(single).collect()
    assert(r1.length == 1)
    assert(r1(0).getAs[String]("taxonomy_1") == "T30")
    assert(r1(0).getAs[Int]("taxonomy_primary_flag") == 1)
    assert(r1(0).getAs[String]("taxonomy_2") == "T10")
    assert(r1(0).getAs[String]("taxonomy_3") == null)
    // multi-primary NPI fans out to one row per primary taxonomy
    val multi = nppesRow("1000000002", Map(
      1 -> ("T05", "Y"), 2 -> ("T90", "Y"), 3 -> ("T50", "N")))
    val r2 = RefTables.nppesApdeLoad(multi).collect()
    assert(r2.length == 2)
    assert(r2.map(_.getAs[String]("taxonomy_1")).sorted.toSeq ==
      Seq("T05", "T90"))
    // no-primary NPI falls back to the alphabetical rank-1
    val none = nppesRow("1000000003", Map(
      4 -> ("T77", "N"), 5 -> ("T33", "N")))
    val r3 = RefTables.nppesApdeLoad(none).collect()
    assert(r3.length == 1 &&
      r3(0).getAs[String]("taxonomy_1") == "T33" &&
      r3(0).getAs[Int]("taxonomy_primary_flag") == 0)
  }

  test("nppesApdeLoad: geo_wa is case-insensitive and the deactivation " +
      "flag needs a typeless NPI") {
    val wa = nppesRow("1000000004", Map.empty, state = "wa")
    assert(RefTables.nppesApdeLoad(wa).collect()(0)
      .getAs[Int]("geo_wa") == 1)
    val or = nppesRow("1000000005", Map.empty, state = "OR",
      entity = null, deact = "2021-01-01")
    val r = RefTables.nppesApdeLoad(or).collect()(0)
    assert(r.getAs[Int]("geo_wa") == 0)
    assert(r.getAs[Int]("deactivation_flag") == 1)
    val active = nppesRow("1000000006", Map.empty, deact = "2021-01-01")
    assert(RefTables.nppesApdeLoad(active).collect()(0)
      .getAs[Int]("deactivation_flag") == 0)
  }

  test("hedisValueSets: punct strip + trailing-zero pad hit only the " +
      "ICD systems; NULL-pad union carries missing columns") {
    val y1 = Seq(("VS A", "1.2", "250.1", "ICD9CM"),
        ("VS A", "1.2", "E11.9", "ICD10CM"),
        ("VS A", "1.2", "99213", "CPT"))
      .toDF("value_set_name", "value_set_oid", "code", "code_system")
    val y2 = Seq(("VS A", "1.2", "V45", "ICD9CM"))
      .toDF("value_set_name", "value_set_oid", "code", "code_system")
      .withColumn("value_set_version",
        org.apache.spark.sql.functions.lit("MY 2"))
    val out = RefTables.hedisValueSets(Seq(2023 -> y1, 2024 -> y2))
      .collect().map(r => (r.getAs[Int]("year"),
        r.getAs[String]("code"), r.getAs[String]("value_set_version")))
    assert(out.contains((2023, "25010", null)))  // strip + pad-to-5
    assert(out.contains((2023, "E119", null)))   // strip only
    assert(out.contains((2023, "99213", null)))  // CPT untouched
    assert(out.contains((2024, "V4500", "MY 2"))) // 3 -> +'00'
  }

  test("rdaValueSets: version inference (E-code flips on the POISON " +
      "desc family), pads, and the longest-raw collision pick") {
    val mk = (rows: Seq[(String, String, String, String, String, String)]) =>
      rows.toDF("value_set_group", "value_set_name", "data_source_type",
        "code_set", "code", "desc")
    val newRaw = mk(Seq(
      ("mh", "V1", "diagnosis", "ICDCM", "296", "digit code"),
      ("mh", "V1", "diagnosis", "ICDCM", "2960", "digit code"),
      ("mh", "V1", "diagnosis", "ICDCM", "E950",
        "  suicide   SELF  inflicted "),
      ("mh", "V1", "diagnosis", "ICDCM", "E950", "unrelated note"),
      ("mh", "V1", "diagnosis", "ICDCM", "V62", "digit code"),
      ("sud", "V2", "pharmacy", "NDC", "1234567", "NALTREXONE 1MG")))
    val empty = mk(Seq())
    val ref = Seq(("29600", 9, "5.1", "d1"), ("E9500", 9, "5.1", "d2"))
      .toDF("icdcm", "icdcm_version", "ccs_detail_code",
        "icdcm_description")
    val ccs = Seq(("5.1", "mh_adjustment"))
      .toDF("ccs_detail_code", "sub_group_condition")
    val pm = Seq(("X", "Naltrexone")).toDF("desc_1", "sub_group_pharmacy")
    val moud = Seq(("H0033", "oral"))
      .toDF("procedure_code", "desc")
    val out = RefTables.rdaValueSets(empty, newRaw, ref, ccs, pm, moud)
      .collect()
    val byCode = out.groupBy(_.getAs[String]("code"))
    // '296' and '2960' both pad to '29600' -> one row, raw '2960' won
    assert(byCode("29600").length == 1)
    assert(byCode("29600")(0)
      .getAs[String]("sub_group_condition") == "mh_adjustment")
    // E950 + SELF-family desc -> ICD9CM padded; the other E950 row
    // (no match) -> ICD10CM, unpadded, a separate code
    assert(byCode("E9500")(0).getAs[String]("code_set") == "ICD9CM")
    assert(byCode("E950")(0).getAs[String]("code_set") == "ICD10CM")
    // V-code -> ICD9CM + trailing pad
    assert(byCode("V6200")(0).getAs[Int]("icdcm_version") == 9)
    // NDC leading pad + the NALTREXONE contains-fallback
    assert(byCode("00001234567")(0)
      .getAs[String]("sub_group_pharmacy") == "pharm_naltrexone_rx")
    assert(byCode("00001234567")(0)
      .getAs[String]("sub_group_condition") == "sud_opioid")
    // MOUD append rides with its flag
    assert(byCode("H0033")(0).getAs[Int]("oud_dx1_flag") == 1)
    // the 66 NO HARMS additions are present
    assert(out.count(_.getAs[String]("value_set_name") ==
      "apde-added-diagnosis") == 66)
  }

  test("fdaNdcProduct strips only the U+FFFD replacement characters") {
    val raw = Seq(("P1", "0001-001", "T", "N", "ACME� LAB�",
      "S")).toDF("productid", "productndc", "producttypename",
      "proprietaryname", "labelername", "substancename")
    assert(RefTables.fdaNdcProduct(raw).collect()(0)
      .getAs[String]("labelername") == "ACME LAB")
  }
}
