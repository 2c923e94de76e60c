package graft.sources

import graft.SparkSpec

/** Hand fixtures for the round-12 reference-table kernels: RAC codes,
  * KC provider master, age groups, carrier billing NPI, comorbidity
  * scores, NDC normalization. */
class RefTables2Spec extends SparkSpec {

  import spark.implicits._

  test("racCode: benefit CASE arms, elig-14 override, MAGI '--' null") {
    val fs = Seq(
      (1, "RAC 1", "Federal"), (2, "RAC 2", "State Only"),
      (3, "RAC 3", "Title XXI"), (4, "RAC 4", "Federal"))
      .toDF("rac_code", "rac_desc", "fund_source_code")
    val det = Seq((1, 14, 0), (2, 5, 1), (3, 6, 2))
      .toDF("rac_code", "elig_value", "sub_elig_value")
    val grp = Seq(
      (14, "CAT 14", "Y", "N", null, "N", "--", "G"),
      (5, "CAT 5", null, "N", null, "N", "Y", "G"))
      .toDF("elig_value", "category", "title_xix_full",
        "title_xix_limited", "title_xxi_full", "legacy_mcs", "magi",
        "major_cov_grp")
    val bsp = Seq((1, "B0", "BSP 0", 1003960), (2, "B4", "BSP 4", 555))
      .toDF("rac_code", "bsp_group_abbrev", "bsp_group_name",
        "bsp_group_cid")
    val out = RefTables.racCode(fs, det, grp, bsp).collect()
      .map(r => r.getAs[Int]("rac_code") -> r).toMap
    // rac 1: elig 14 -> category override; CID 1003960 + Federal -> Y
    assert(out(1).getAs[String]("category") ==
      "MN - Other (Family/Pregnancy)")
    assert(out(1).getAs[String]("full_benefit") == "Y")
    assert(out(1).getAs[String]("magi") == null) // '--' nulled
    assert(out(1).getAs[String]("alternate_rda_full_benefit") == "Y")
    // rac 2: CID 555 (not a full-benefit CID) -> N; both title flags
    // NULL with a detailed match -> alternate N
    assert(out(2).getAs[String]("full_benefit") == "N")
    assert(out(2).getAs[String]("alternate_rda_full_benefit") == "N")
    // rac 3: elig 6 has no grouping row -> category NULL; no bsp row
    // -> full_benefit NULL; b matched but c absent -> alternate N
    assert(out(3).getAs[String]("category") == null)
    assert(out(3).getAs[String]("full_benefit") == null)
    assert(out(3).getAs[String]("alternate_rda_full_benefit") == "N")
    // rac 4: no detailed row at all -> alternate NULL
    assert(out(4).getAs[String]("alternate_rda_full_benefit") == null)
  }

  test("kcProviderMaster: NPI gate, top-2 taxonomy mode, anti-join") {
    val master = Seq(
      ("1000000001", "Organization", "98101", "207Q000001", "-1"))
      .toDF("npi", "entity_type", "zip_physical", "primary_taxonomy",
        "secondary_taxonomy_physical")
    val raw = Seq(
      // npi 1000000001 exists in master -> anti-joined away
      ("1000000001", "Person", "98102", "2084P08001"),
      // npi 1000000002: taxonomy A twice, B once -> primary A,
      // secondary B; entity tie P/O broken by entity DESC -> Person
      ("1000000002", "Person", "98103", "TAXONOMYAA"),
      ("1000000002", "Organization", "98103", "TAXONOMYAA"),
      ("1000000002", "Person", "981", "TAXONOMYBB"), // short zip -> null
      // invalid NPIs drop
      ("0999999999", "Person", "98104", "TAXONOMYCC"),
      ("NOTANPI", "Person", "98104", "TAXONOMYCC"))
      .toDF("orig_npi", "entity_type", "zip", "primary_specialty_code")
    val out = RefTables.kcProviderMaster(master, raw).collect()
    assert(out.length == 2) // master row + derived 1000000002
    val d = out.find(_.getAs[Int]("apcd_provider_master_flag") == 0).get
    assert(d.getAs[Long]("npi") == 1000000002L)
    assert(d.getAs[String]("entity_type") == "Person")
    assert(d.getAs[String]("geo_zip_practice") == "98103")
    assert(d.getAs[String]("primary_taxonomy") == "TAXONOMYAA")
    assert(d.getAs[String]("secondary_taxonomy") == "TAXONOMYBB")
    val m = out.find(_.getAs[Int]("apcd_provider_master_flag") == 1).get
    assert(m.getAs[String]("secondary_taxonomy") == null) // -1 nulled
  }

  test("ageGrp: spine is -1..250 and the ladders band correctly") {
    val dim = RefTables.ageGrp(spark)
    assert(dim.count() == 252)
    val r65 = dim.filter($"age" === 65).head()
    assert(r65.getAs[String]("age_grp_0") == "Age 65+")
    assert(r65.getAs[String]("age_grp_8") == null) // 18-64 only
    val rm1 = dim.filter($"age" === -1).head()
    assert(rm1.getAs[String]("age_grp_0") == null)
    val r100 = dim.filter($"age" === 100).head()
    // months ladder: 100 "months" falls in Age 7-11 (84-143)
    assert(r100.getAs[String]("age_grp_9_months") == "Age 7-11")
  }

  test("carrierBillingNpi: claim-type gate and case-SENSITIVE join") {
    val apcd = Seq(
      ("S1", 10L, 24), ("s1", 11L, 24), // lower-case must NOT match
      ("S2", 12L, 23),                  // wrong claim type -> dropped
      ("S3", 13L, 25))                  // no carrier row -> null npi
      .toDF("submitter_clm_control_num", "medical_claim_header_id",
        "submitted_claim_type_id")
    val bc = Seq(("S1", 1000000001L)).toDF("clm_id",
      "carr_clm_blg_npi_num")
    val out = RefTables.carrierBillingNpi(apcd, bc)
      .orderBy($"claim_header_id")
      .as[(Long, Option[Long])].collect()
    assert(out.toSeq == Seq((10L, Some(1000000001L)), (11L, None),
      (13L, None)))
  }

  test("Comorbidity: prefix flags dedup and the three weighted sums") {
    import graft.builds.Comorbidity
    val dx = Seq(
      (1L, 9, "42832"),  // CHF via '428' prefix
      (1L, 9, "4283"),   // CHF again -> still one flag
      (1L, 10, "C771"),  // Mets
      (2L, 10, "B20"),   // HIV (exact prefix match)
      (2L, 9, "99999"))  // no condition
      .toDF("id_person", "icdcm_version", "icdcm_norm")
    val out = Comorbidity.scores(dx, "id_person")
      .orderBy($"id_person")
      .as[(Long, Long, Long, Long, Long)].collect()
    // person 1: CHF (1/1/2) + Mets (1/6/5) = 2/7/7 over 2 conditions
    // person 2: HIV (1/6/1)
    assert(out.toSeq == Seq((1L, 2L, 7L, 7L, 2L), (2L, 1L, 6L, 1L, 1L)))
  }

  test("NdcCodes.ndc11: each shape pads its own segment; junk is NULL") {
    import graft.functions.NdcCodes.ndc11
    val out = Seq("1234-5678-90", "12345-678-90", "12345-6789-0",
        "123456-7890-12", "FREE TEXT", "1234-567-89")
      .toDF("c").select(ndc11($"c")).as[Option[String]].collect()
    assert(out.toSeq == Seq(Some("01234567890"), Some("12345067890"),
      Some("12345678900"), None, None, None))
  }
}
