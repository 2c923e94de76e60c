package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.builds.{ClaimIcdcm, ClaimPharm, ClaimProcedure}
import graft.qa.ClaimTableQa
import graft.queries.Q.t

/** The four per-claim-table QA batteries master_mcaid_analytic.R runs
  * between each claim-stage load and its final promote (q292-q295) —
  * the gates whose summed failure counts feed the master script's hard
  * stop (the q279 pipeline runner's gate). Each battery audits the
  * SAME stage frame the catalog already builds (q79/q169/q80/q81
  * fixtures), with:
  *
  *  - elig stand-ins: the person dimension (customer) for
  *    mcaid_elig_demo and the claimant spine (DISTINCT orders
  *    custkeys) for mcaid_elig_timevar — every claimant is covered by
  *    construction, so the containment rows PASS genuinely; the FAIL
  *    arms are spec-pinned (ClaimTableQaSpec);
  *  - prior run: the build restricted to claim key % 20 != 0 (the
  *    q288/q289 convention — a smaller data-derived earlier load);
  *  - the icdcm ref table: the distinct (version, code) pairs of the
  *    PRIOR run — "the ref compiled at the last refresh" — so the
  *    coverage gap counted is exactly the codes the new 5% of claims
  *    introduced, and the < 350 allowance is exercised with real data
  *    (it can genuinely FAIL at larger scales; the verdict row, not
  *    its result, is the contract).
  *
  * Each battery reads its stage frame 3-4 times, so the frame is
  * localCheckpoint'd once before the fan-out (the q246 discipline).
  */
object ClaimQaQueries {

  private def demoIds(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")

  private def tvIds(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(col("o_custkey")).distinct()

  /** §5 mcaid_claim_icdcm_header QA battery (q292,
    * qa_stage.mcaid_claim_icdcm_header.R:63-340): elig containment,
    * ICD-9/ICD-10 length envelopes, icdcm_number domain, dx
    * ref-coverage under the < 350 allowance, per-year dx counts vs the
    * prior run. The row-level icdcm frame is the q79 build fixture
    * before its rollup. */
  def q292IcdcmHeaderQa(s: SparkSession, dir: String): DataFrame = {
    val stage = ClaimIcdcm.build(NormalizeQueries.icdcmWide(s, dir),
        claimCols = Seq("claim_header_id", "id_person"),
        slots = Seq("01" -> "dx01", "02" -> "dx02", "03" -> "dx03",
          "admit" -> "dx_admit"))
      .localCheckpoint(true)
    val prior = stage.filter(col("claim_header_id") % 20 =!= 0)
    val ref = prior.select(col("icdcm_version"), col("icdcm_norm"))
    ClaimTableQa.icdcmBattery(stage, "id_person",
        demoIds(s, dir), "c_custkey", tvIds(s, dir), "o_custkey",
        ref, "icdcm_version", "icdcm_norm", prior,
        "stage.mcaid_claim_icdcm_header", "ref.icdcm_codes")
      .orderBy(col("qa_item"))
  }

  /** §5 mcaid_claim_line QA battery (q293,
    * qa_stage.mcaid_claim_line.R:63-255): elig containment, distinct
    * claim lines vs the raw load, rev_code shape, per-year line counts
    * vs the prior run. The stage frame is the q169 master-staging
    * build plus a deterministic rev_code; the distinct-lines check
    * REALLY fails here — the staging truncate drops archive lines of
    * pre-1996 orders shipped after the incoming batch's MIN date, the
    * exact data loss the reference check exists to catch — and the
    * verdict row reports both counts. */
  def q293ClaimLineQa(s: SparkSession, dir: String): DataFrame = {
    val stage = BuildQueries.q169McaidClaimStage(s, dir)
      .withColumn("rev_code",
        when(col("mbr_h_sid") % 11 === 0, lit(null: String))
          .otherwise(lpad(((col("clm_line") * 37 + col("mbr_h_sid")) % 10000)
            .cast("string"), 4, "0")))
      .localCheckpoint(true)
    val prior = stage.filter(col("mbr_h_sid") % 20 =!= 0)
    val raw = t(s, dir, "lineitem").select(
      concat(lit("T"), col("l_orderkey").cast("string"),
        lpad(col("l_linenumber").cast("string"), 3, "0"))
        .as("clm_line_tcn"))
    ClaimTableQa.lineBattery(stage, "mbr_h_sid", "clm_line_tcn",
        demoIds(s, dir), "c_custkey", tvIds(s, dir), "o_custkey",
        raw, "clm_line_tcn", prior,
        "stage.mcaid_claim_line", "load_raw.mcaid_claim")
      .orderBy(col("qa_item"))
  }

  /** §5 mcaid_claim_procedure QA battery (q294,
    * qa_stage.mcaid_claim_procedure.R:63-280): elig containment, the
    * CPT/HCPCS/ICD-PCS code-system classification with its < 50
    * unknown-code allowance, per-year procedure counts vs the prior
    * run. The stage frame is the q80 build fixture carried at row
    * grain with its claimant id and service date. */
  def q294ClaimProcedureQa(s: SparkSession, dir: String): DataFrame = {
    val stage = ClaimProcedure.build(NormalizeQueries.procWide(s, dir),
        claimCols = Seq("claim_header_id", "id_person",
          "first_service_date"),
        procSlots = Seq("01" -> "pc01", "02" -> "pc02", "03" -> "pc03"),
        modSlots = Seq("M1" -> "mod1", "M2" -> "mod2"))
      .localCheckpoint(true)
    val prior = stage.filter(col("claim_header_id") % 20 =!= 0)
    ClaimTableQa.procedureBattery(stage, "id_person",
        demoIds(s, dir), "c_custkey", tvIds(s, dir), "o_custkey",
        prior, "stage.mcaid_claim_procedure")
      .orderBy(col("qa_item"))
  }

  /** §5 mcaid_claim_pharm QA battery (q295,
    * qa_stage.mcaid_claim_pharm.R:60-218): elig containment, NDC
    * shape, per-year rx counts vs the prior run — with the reference's
    * rows/row qa_item split and "claim lines" no-change wording kept
    * verbatim. The stage frame is the q81 build fixture extended with
    * the claimant id and fill date the battery audits. */
  def q295ClaimPharmQa(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").join(t(s, dir, "orders"),
      col("l_orderkey") === col("o_orderkey"))
    val raw = li.select(
      col("l_orderkey").as("claim_header_id"),
      col("o_custkey").as("id_mcaid"),
      to_date(col("l_shipdate")).as("rx_fill_date"),
      NormalizeQueries.pharmNdcRaw.as("ndc_raw"),
      NormalizeQueries.pharmSupplyRaw.as("supply_days_raw"))
    val stage = ClaimPharm.build(raw).localCheckpoint(true)
    val prior = stage.filter(col("claim_header_id") % 20 =!= 0)
    ClaimTableQa.pharmBattery(stage, "id_mcaid",
        demoIds(s, dir), "c_custkey", tvIds(s, dir), "o_custkey",
        prior, "stage.mcaid_claim_pharm")
      .orderBy(col("qa_item"))
  }

  /** §5 mcaid_claim_bh QA battery (q296,
    * qa_stage.mcaid_claim_bh.R:36-160): distinct-condition count vs the
    * prior final table, elig containment (with the bh script's
    * literally-quoted glue notes — a reference quirk), and the
    * mid-study prevalence frame the reference prints for analyst
    * review, pinned here as INFO rows. Stage = the q153 combined bh
    * spans; the person dims are the id_apde universe (1000 +
    * custkey % 90), so containment PASSes genuinely. midYear 1996 is
    * this fixture's analog of the reference's hard-coded 2017. */
  def q296ClaimBhQa(s: SparkSession, dir: String): DataFrame = {
    val stage = BuildQueries.q153McaidMcareBh(s, dir).localCheckpoint(true)
    val prior = stage.filter(col("id_apde") % 20 =!= 0)
    val demo = t(s, dir, "customer")
      .select((lit(1000) + col("c_custkey") % 90).as("id_apde")).distinct()
    val tv = t(s, dir, "orders")
      .select((lit(1000) + col("o_custkey") % 90).as("id_apde")).distinct()
    val pop = t(s, dir, "orders").select(
      (lit(1000) + col("o_custkey") % 90).as("id_apde"),
      to_date(col("o_orderdate")).as("from_date"),
      date_add(to_date(col("o_orderdate")), 180).as("to_date"))
    ClaimTableQa.bhBattery(stage, "id_apde", demo, "id_apde", tv,
        "id_apde", prior, pop, "id_apde", "from_date", "to_date", 1996,
        "stage.mcaid_claim_bh")
      .orderBy(col("qa_item"))
  }

  /** §5 mcaid_claim_moud QA battery (q297,
    * qa_stage.mcaid_claim_moud.R:60-246) over the shared q92 person-day
    * MOUD frame: elig containment, the pharm-temp new-NDC probe
    * (admin-method ref compiled at the prior load, so the gap counted
    * is the NDCs the newest 1/30th of orders introduced), and the three
    * fused row-level flag checks — with the reference's count-in-the-
    * qa_item FAIL convention and copy-paste PASS notes kept verbatim. */
  def q297ClaimMoudQa(s: SparkSession, dir: String): DataFrame = {
    val stage = BuildQueries.moudDayFrame(s, dir).localCheckpoint(true)
    val demo = t(s, dir, "customer")
      .select((col("c_custkey") % 80).as("pid")).distinct()
    val tv = t(s, dir, "orders")
      .select((col("o_custkey") % 80).as("pid")).distinct()
    val rxNdc = t(s, dir, "orders").filter(col("o_orderkey") % 6 === 0)
      .select((col("o_custkey") % 80).as("id_person"),
        col("o_orderkey"),
        lpad(((col("o_custkey") * 7 + 3) % 500).cast("string"), 11, "0")
          .as("ndc"))
    val ref = rxNdc.filter(col("o_orderkey") % 30 =!= 0)
      .select(col("ndc").as("ref_ndc")).distinct()
      .withColumn("admin_method", lit("oral"))
    val pharmTmp = rxNdc.join(ref, col("ndc") === col("ref_ndc"), "left")
    val flags = col("meth_proc_flag") + col("bup_proc_flag") +
      col("nal_proc_flag") + col("unspec_proc_flag")
    ClaimTableQa.moudBattery(stage, "id_person", demo, "pid", tv, "pid",
        pharmTmp, "admin_method",
        col("unspec_proc_flag") === 1 && col("moud_days_supply") > 0,
        flags > 1,
        (col("meth_proc_flag") === 1 || col("bup_proc_flag") === 1 ||
          col("nal_proc_flag") === 1) &&
          col("moud_days_supply_new").isNull,
        "stage.mcaid_claim_moud")
      .orderBy(col("qa_item"))
  }

  /** §5 mcaid_claim_naloxone QA (q298,
    * qa_stage.mcaid_claim_naloxone.R:25-113): the battery is the single
    * elig-containment verdict row — the reference's smallest QA script,
    * kept as its own gate because the master script sums it like the
    * rest. Stage = the q144 row-grain naloxone build (id universe
    * custkey % 70). */
  def q298ClaimNaloxoneQa(s: SparkSession, dir: String): DataFrame = {
    val stage = BuildQueries.q144Naloxone(s, dir)
    val demo = t(s, dir, "customer")
      .select((col("c_custkey") % 70).as("pid")).distinct()
    val tv = t(s, dir, "orders")
      .select((col("o_custkey") % 70).as("pid")).distinct()
    ClaimTableQa.toDf(s, Seq(ClaimTableQa.idsVsEligRow(stage, "id_mcaid",
        demo, "pid", tv, "pid", "stage.mcaid_claim_naloxone")))
      .orderBy(col("qa_item"))
  }

  /** §5 mcaid_claim_preg_episode QA battery (q299,
    * qa_stage.mcaid_claim_preg_episode.R:40-240): elig containment plus
    * six fused checks — age envelope [12, 55], non-null episode dates,
    * GA-column completeness on valid-GA rows, exactly 7 endpoint types,
    * and lb_type presence on valid-GA live births — over the FULL
    * 7-class pipeline: q91 placement -> prenatal windows -> GA
    * correction, enriched with the deterministic dob fixture (years
    * 1955-1979, so every outcome age lands inside the envelope) and
    * ga_estimation_step = 'anchor_procedure' where a corrected start
    * exists (the one GA-estimation step this build models). */
  def q299PregEpisodeQa(s: SparkSession, dir: String): DataFrame = {
    val placed = graft.builds.PregEpisode.build(
      BuildQueries.preg7Endpoints(s, dir),
      "id_person", "endpoint_date", "cls")
    val episodes = graft.builds.PregEpisode.withPrenatalWindows(placed)
    val procs = t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") % 60).as("id_person"),
        to_date(col("l_shipdate")).as("procedure_date"),
        when(col("l_partkey") % 13 === 0, "58321")
          .when(col("l_partkey") % 13 === 1, "S4035")
          .otherwise("OTHER").as("procedure_code"))
    val corrected = graft.builds.PregEpisode.gaCorrection(episodes, procs,
      Seq("58321", "58322", "S4035", "58974", "58976", "S4037"))
    val dob = make_date(lit(1955) + col("id_person") % 25,
      lit(1) + col("id_person") % 12, lit(1) + col("id_person") % 28)
    val stage = corrected
      .withColumn("ga_estimation_step",
        when(col("preg_start_date_correct").isNotNull, "anchor_procedure"))
      .withColumn("age_at_outcome",
        graft.functions.DateFns.ageYears(dob, col("preg_end_date")))
      .localCheckpoint(true)
    val demo = t(s, dir, "customer")
      .select((col("c_custkey") % 60).as("pid")).distinct()
    val tv = t(s, dir, "orders")
      .select((col("o_custkey") % 60).as("pid")).distinct()
    ClaimTableQa.pregBattery(stage, "id_person", demo, "pid", tv, "pid",
        "stage.mcaid_claim_preg_episode")
      .orderBy(col("qa_item"))
  }

  /** §5 mcaid_housing_status QA battery (q300,
    * qa_stage.mcaid_housing_status.R:28-137): duplicate (id, from_date)
    * pairs and the month-to-month distinct-member trend at the >= 5%
    * bar, over the q148 housing-status build. The reference joins
    * ref.date to get year_month; from_date here is always the first of
    * the month, so year_month is computed directly (the q290 ref.date
    * row pins that dimension separately). The reference's FAIL note
    * references an undefined R variable (`diff_check`) — an error it
    * could never render — so the FAIL qa_item here renders the intended
    * values with the 4-dp fixed-point pct. */
  def q300HousingQa(s: SparkSession, dir: String): DataFrame = {
    val stage = BuildQueries.q148HousingStatus(s, dir).localCheckpoint(true)
    ClaimTableQa.housingBattery(stage, "id_mcaid", "from_date",
        "stage.mcaid_housing_status")
      .orderBy(col("qa_item"))
  }

  /** §5 combined elig_demo QA (q302,
    * qa_stage.mcaid_mcare_elig_demo.R:15-120): rows vs the stored prior
    * run and distinct id_apde == rows, over the q119 reconciliation
    * build. Prior run = the build restricted to id_apde % 20 != 0 (the
    * q288 convention; the reference reads the count back from
    * metadata.qa_xwalk_values). */
  def q302MmEligDemoQa(s: SparkSession, dir: String): DataFrame = {
    val stage = BuildQueries.q119McaidMcareDemo(s, dir)
      .localCheckpoint(true)
    val prior = stage.filter(col("id_apde") % 20 =!= 0).count()
    graft.qa.CombinedQa.mmEligDemoQa(stage, "id_apde", prior,
        "stage.mcaid_mcare_elig_demo")
      .orderBy(col("qa_item"))
  }

  /** §5 combined elig_timevar QA (q303,
    * qa_stage.mcaid_mcare_elig_timevar.R:15-150): row count and
    * distinct-id count vs the prior run's stored qa_xwalk_values, over
    * the q118 combined timevar build. */
  def q303MmEligTimevarQa(s: SparkSession, dir: String): DataFrame = {
    val stage = BuildQueries.q118McaidMcareTimevar(s, dir)
      .localCheckpoint(true)
    val pr = stage.filter(col("id_apde") % 20 =!= 0)
      .agg(count(lit(1)), count_distinct(col("id_apde"))).head()
    graft.qa.CombinedQa.mmEligTimevarQa(stage, "id_apde", pr.getLong(0),
        pr.getLong(1), "stage.mcaid_mcare_elig_timevar")
      .orderBy(col("qa_item"))
  }

  /** §5 mcare elig_timevar QA (q304,
    * qa_stage.mcare_elig_timevar.R:30-220): rows vs prior, distinct ids
    * vs the WA MBSF bene universe, duplicate rows, and the from/to
    * envelope against the HARD-CODED study window — the fixture's
    * 1992-1998 era standing in for the reference's 2011-2017, dates
    * double-quoted as R's dbQuoteIdentifier renders them. */
  def q304McareTimevarQa(s: SparkSession, dir: String): DataFrame = {
    val stage = BuildQueries.q127McareTimevar(s, dir)
      .localCheckpoint(true)
    val prior = stage
      .filter(expr("CAST(substring(id_mcare, 2) AS INT)") % 20 =!= 0)
      .count()
    val (bene, _) = BuildQueries.McareBene.frames(s, dir)
    graft.qa.CombinedQa.mcareEligTimevarQa(stage, "id_mcare", bene,
        "id_mcare", prior, "1992-01-01", "1998-12-31",
        "stage.mcare_elig_timevar")
      .orderBy(col("qa_item"))
  }

  /** §5 identity-crosswalk QA battery (q305,
    * qa_stage.xwalk_apde_mcaid_mcare_pha.R:40-410): rows and distinct
    * KCMASTER_ID/ID_APDE vs the prior run (the SAME ApdeXwalk chain over
    * the history slice loaded before the month-first deliveries),
    * distinct mcaid/phousing ids vs the IDH history universe, and the
    * four unique-pairing WARNING checks — over the q155 build. The
    * Medicare arm sits behind the reference's skip_mcare flag and the
    * xwalk carries no mcare links, so it is skipped the same way. */
  def q305XwalkQa(s: SparkSession, dir: String): DataFrame = {
    val history = BuildQueries.xwalkHistory(s, dir)
    val stage = graft.builds.ApdeXwalk.build(history)
      .localCheckpoint(true)
    val prior = graft.builds.ApdeXwalk.build(
      history.filter(dayofmonth(col("LAST_TOUCHED")) =!= 1))
    val cur = history.filter(col("IS_HISTORICAL") === "N" &&
      col("KCMASTER_ID").isNotNull)
    val idh = cur.agg(
      count_distinct(when(col("SOURCE_SYSTEM") === "MEDICAID" &&
        col("MBR_H_SID").rlike("^[0-9]+$"), col("MBR_H_SID"))),
      count_distinct(when(length(col("PHOUSING_ID")) === 64,
        col("PHOUSING_ID")))).head()
    graft.qa.CombinedQa.xwalkQa(stage, prior, idh.getLong(0),
        idh.getLong(1), "claims.stage_xwalk_apde_mcaid_mcare_pha")
      .orderBy(col("qa_item"))
  }

  /** §5 combined claim-header pc-visit duplicate probe (q306,
    * qa_stage.mcaid_mcare_claim_header.sql:1-20): mcaid and mcare
    * pc-visit slices unioned through their crosswalks, grouped to
    * (id_apde, first_service_date), groups with both sources emitted —
    * the reference's TOP 100 made deterministic (ordered by the group
    * key). The fixture coarsens the probe dates to month so planted
    * cross-source collisions exist at every scale. */
  def q306MmHeaderDupQa(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
      .withColumn("d", to_date(col("o_orderdate")))
    val ok = col("o_orderkey")
    val mcaidPc = orders.filter(ok % 2 === 0 && ok % 5 === 0).select(
      (col("o_custkey") % 70).as("id_mcaid"),
      trunc(col("d"), "month").as("first_service_date"))
    val mcarePc = orders.filter(ok % 2 === 1 && ok % 5 === 0).select(
      concat(lit("C"), (col("o_custkey") % 80).cast("string"))
        .as("id_mcare"),
      trunc(col("d"), "month").as("first_service_date"))
    val cust = t(s, dir, "customer")
    val xw1 = cust.select((col("c_custkey") % 70).as("id_mcaid"))
      .distinct().filter(col("id_mcaid") % 9 =!= 8)
      .withColumn("id_apde", lit(100) + col("id_mcaid") % 50)
    val xw2 = cust.select((col("c_custkey") % 80).as("n")).distinct()
      .filter(col("n") % 7 =!= 6)
      .select(concat(lit("C"), col("n").cast("string")).as("id_mcare"),
        (lit(100) + col("n") % 50).as("id_apde"))
    graft.qa.CombinedQa.headerDupProbe(mcaidPc, xw1, mcarePc, xw2)
  }

  /** §5 combined claim-CCW QA battery (q307,
    * qa_stage.mcaid_mcare_claim_ccw.sql:1-80 and its mcare sibling
    * qa_tmp.mcare_claim_ccw.sql): the crosswalk-coverage counts over
    * the q105 combined header (mcare claims whose id_apde has no
    * mcare-linked xwalk row; null-id_apde rows), the distinct-condition
    * count over the CCW frame, and the 2016-style FFS denominators —
    * person-level min/max part-flag aggregation over the timevar slice
    * inside the study year (temp1: King + A + B + no C; temp2: A or B,
    * no C), the fixture's 1996 standing in for the reference's 2016.
    * Output: (qa_item, qa_value) rows — the reference runs these as
    * bare analyst SELECTs, not metadata inserts. */
  def q307MmCcwQa(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hdr = BuildQueries.q105McaidMcareHeader(s, dir)
      .localCheckpoint(true)
    val cust = t(s, dir, "customer")
    val xw2Apde = cust.select((col("c_custkey") % 80).as("n")).distinct()
      .filter(col("n") % 7 =!= 6)
      .select((lit(100) + col("n") % 50).as("x_apde")).distinct()
    val orphanMcare = hdr.filter(col("source_desc") === "mcare")
      .join(xw2Apde, col("id_apde") === col("x_apde"), "left")
      .filter(col("x_apde").isNull)
      .agg(count_distinct(col("id_apde"))).head().getLong(0)
    val nullApde = hdr.filter(col("id_apde").isNull).count()
    val condCount = graft.builds.ConditionLoop.build(t(s, dir, "orders"))
      .agg(count_distinct(col("condition"))).head().getLong(0)
    // part-flag timevar slice: person-level min/max flags inside the
    // study year, the reference's #temp1/#temp2 construction
    val k = (col("o_custkey") % 60) + year(to_date(col("o_orderdate")))
    val tv = t(s, dir, "orders").select(
      (col("o_custkey") % 60).as("id_apde"),
      trunc(to_date(col("o_orderdate")), "month").as("from_date"),
      last_day(to_date(col("o_orderdate"))).as("to_date"),
      lit(1).as("mcare"),
      when(k % 7 === 0, lit(null).cast("int"))
        .otherwise((k % 3 =!= 0).cast("int")).as("part_a"),
      when(k % 11 === 0, lit(null).cast("int"))
        .otherwise((k % 4 =!= 0).cast("int")).as("part_b"),
      when(k % 13 === 0, lit(null).cast("int"))
        .otherwise((k % 5 === 0).cast("int")).as("part_c"),
      (col("o_custkey") % 2).cast("int").as("geo_kc"))
    val inYear = tv.filter(col("from_date") <= lit("1996-12-31") &&
      col("to_date") >= lit("1996-01-01"))
    val flags = inYear.groupBy(col("id_apde")).agg(
      max(col("geo_kc")).as("geo_kc_max"),
      min(col("mcare")).as("mcare_min"),
      min(coalesce(col("part_a"), lit(0))).as("part_a_min"),
      min(coalesce(col("part_b"), lit(0))).as("part_b_min"),
      max(coalesce(col("part_c"), lit(0))).as("part_c_max"))
    val r = flags.agg(
      count_distinct(when(col("geo_kc_max") === 1 &&
        col("mcare_min") === 1 && col("part_a_min") === 1 &&
        col("part_b_min") === 1 && col("part_c_max") === 0,
        col("id_apde"))),
      count_distinct(when(col("mcare_min") === 1 &&
        (col("part_a_min") === 1 || col("part_b_min") === 1) &&
        col("part_c_max") === 0, col("id_apde")))).head()
    Seq(
      ("distinct_ccw_conditions", condCount),
      ("ffs_ab_1996", r.getLong(1)),
      ("ffs_full_dual_kc_1996", r.getLong(0)),
      ("mcare_claims_without_mcare_xwalk", orphanMcare),
      ("null_id_apde_rows", nullApde))
      .toDF("qa_item", "qa_value")
      .orderBy(col("qa_item"))
  }

  /** §5 APCD claim-provider line-level QA (q317,
    * qa_stage.apcd_claim_provider.sql): the reference reads ONE header
    * (629250074914541) from stage.apcd_claim_provider and eyeballs its
    * four provider slots + service dates against
    * stage.apcd_medical_claim; at population scale that is set-equality
    * per slot type plus a date-ride-along check
    * ([[graft.qa.ApcdLineQa.claimProviderQa]]). The delivered-rows
    * fixture plants missing rendering rows (header % 37) and off-by-one
    * billing ids (header % 41), so billing/rendering FAIL with equal
    * missing+extra and missing-only signatures respectively while
    * attending/referring PASS. */
  def q317ApcdClaimProviderQa(s: SparkSession, dir: String): DataFrame = {
    val stage = graft.builds.ApcdClaimDetail.provider(
      BuildQueries.Apcd.providerDelivered(s, dir))
    graft.qa.ApcdLineQa.claimProviderQa(stage,
        BuildQueries.Apcd.medicalClaim(s, dir))
      .orderBy(col("provider_type"))
  }

  /** §5 APCD elig_demo line-level QA (q318,
    * qa_stage.apcd_elig_demo.sql): every reference spot-check category
    * run over the FULL member population, re-derived with different
    * mechanics than the audited q152 build (pair self-join / max_by /
    * grouped aggregation — see [[graft.qa.ApcdLineQa.eligDemoQa]]).
    * The demo frame feeds three check families, so it is materialized
    * once (the q246 discipline). */
  def q318ApcdEligDemoQa(s: SparkSession, dir: String): DataFrame = {
    val demo = graft.builds.ApcdEligDemo.build(
        BuildQueries.ApcdElig.memberMonth(s, dir),
        BuildQueries.ApcdElig.eligibility(s, dir),
        BuildQueries.ApcdElig.ethMap(s))
      .localCheckpoint(true)
    graft.qa.ApcdLineQa.eligDemoQa(demo,
        BuildQueries.ApcdElig.memberMonth(s, dir),
        BuildQueries.ApcdElig.eligibility(s, dir),
        BuildQueries.ApcdElig.ethMap(s))
      .orderBy(col("qa_category"))
  }

  /** §5 APCD elig_plr line-level QA (q319,
    * qa_stage.apcd_elig_plr.sql): the reference's pregap / geographic /
    * demographic / cohort-rule-out spot checks re-derived over every
    * member ([[graft.qa.ApcdLineQa.eligPlrQa]] — exists-a-better-zip
    * anti-test, ref re-attach, ACH-day recompute, rounded-percent
    * cohort flags, clip bounds, capped-age ride-along). Audits the
    * exact frames the catalog's q166 row pins; the PLR frame feeds six
    * check families, so it is materialized once. */
  def q319ApcdEligPlrQa(s: SparkSession, dir: String): DataFrame = {
    val (tv, dm, zg) = BuildQueries.ApcdPlr.frames(s, dir)
    val plr = graft.builds.ApcdEligPlr
      .build(tv, dm, zg, "1995-01-01", "1995-12-31")
      .localCheckpoint(true)
    graft.qa.ApcdLineQa.eligPlrQa(plr, tv, dm, zg,
        "1995-01-01", "1995-12-31")
      .orderBy(col("qa_category"))
  }

  /** §5 APCD claim_ccw line-level QA (q320,
    * qa_stage.apcd_claim_ccw_10009.sql): per configured condition,
    * re-derive the qualifying person set + encounter span from
    * header/icdcm/ref with set mechanics (per-condition joins, any-
    * pair-within-window self join) and count disagreements against the
    * q244 build ([[graft.qa.ApcdLineQa.ccwLineQa]]). Audits the exact
    * frames the catalog's q244 row pins. */
  def q320ApcdCcwLineQa(s: SparkSession, dir: String): DataFrame = {
    val build = graft.queries.BuildQueries.q244ApcdCcw(s, dir)
      .localCheckpoint(true)
    graft.qa.ApcdLineQa.ccwLineQa(build,
        BuildQueries.ApcdCcw.header(s, dir),
        BuildQueries.ApcdCcw.icdcm(s, dir),
        BuildQueries.Ccw.icdcmRef(s), BuildQueries.Ccw.conds, "id_apcd")
      .orderBy(col("ccw_code"))
  }

  /** §5 APCD elig_timevar monthly member census (q325,
    * qa_stage.apcd_elig_timevar.sql): the 44-minute outlier review —
    * month-allocation via interval overlap against the ref.date
    * dimension (the q290 build), the King-Medicaid cohort census, the
    * reference's nine per-coverage UNION scans fused into ONE
    * conditional-aggregation pass, and a per-covgrp member census in
    * place of the commented exemplar hunts
    * ([[graft.qa.ApcdLineQa.timevarMonthQa]]). Audits the exact
    * timevar frame the q166/q319 rows pin. */
  def q325ApcdTimevarMonthQa(s: SparkSession, dir: String): DataFrame = {
    val (tv, _, _) = BuildQueries.ApcdPlr.frames(s, dir)
    val dim = graft.queries.LifecycleQueries.q290DateDim(s, dir)
    graft.qa.ApcdLineQa.timevarMonthQa(tv, dim, 199201, 199812)
      .orderBy(col("section"), col("coverage"), col("year_month"))
  }

  /** §5 tmp-mode mcare CCW QA battery (q331,
    * stage/tables/qa_tmp.mcare_claim_ccw.sql STEP 1): the five
    * table-wide checks over the SAME q230 build frame, a demo fixture
    * whose dob arms land every age_grp7 bucket PLUS the T-SQL
    * -1→0 clamp (dob mid-1996 vs the 1995-12-31 asof) and the <-1
    * NULL fall-through (dob 1997), missing persons (eid%11==10 —
    * the LEFT join's null-age arm), and a timevar whose 1995-overlap
    * slice excludes eid%4==3. Year parameterized to 1995 (the
    * fixture's TPC-H date range; the reference hardcodes 2017). */
  def q331McareCcwTmpQa(s: SparkSession, dir: String): DataFrame = {
    val ccw = BuildQueries.q230McareCcw(s, dir)
    val eid = col("eid")
    val base = t(s, dir, "customer")
      .select((col("c_custkey") % 75).as("eid")).distinct()
    val mcId = concat(lit("mc"), eid.cast("string"))
    val dob = when(eid % 9 === 0, to_date(lit("1992-07-01")))
      .when(eid % 9 === 1, to_date(lit("1989-07-01")))
      .when(eid % 9 === 2, to_date(lit("1982-07-01")))
      .when(eid % 9 === 3, to_date(lit("1975-07-01")))
      .when(eid % 9 === 4, to_date(lit("1960-07-01")))
      .when(eid % 9 === 5, to_date(lit("1940-07-01")))
      .when(eid % 9 === 6, to_date(lit("1920-07-01")))
      .when(eid % 9 === 7, to_date(lit("1996-06-01")))
      .otherwise(to_date(lit("1997-06-01")))
    val demo = base.filter(eid % 11 =!= 10)
      .select(mcId.as("id_mcare"), dob.as("dob"))
    val timevar = base.filter(eid % 4 =!= 3)
      .select(mcId.as("id_mcare"),
        to_date(lit("1994-03-01")).as("from_date"),
        to_date(lit("1995-05-31")).as("to_date"))
      .unionByName(base.select(mcId.as("id_mcare"),
        to_date(lit("1998-01-01")).as("from_date"),
        to_date(lit("1998-06-30")).as("to_date")))
    graft.qa.McareCcwTmpQa.battery(ccw, demo, timevar, 1995)
      .orderBy(col("qa_section"), col("ccw_code"), col("ccw_desc"),
        col("age_grp7"))
  }

  /** §5 raw mcaid CLAIM partial-load QA (q332,
    * load_load_raw.mcaid_claim_partial.R:70-140): the post-copy_into
    * battery — loaded rows vs the batch's etl_log expectation (with
    * the qa_load_file.R PASS-note double-assignment quirk), the
    * address-EXCLUDED distinctness vs COUNT(DISTINCT CLM_LINE_TCN)
    * (the fixture plants resubmitted lines differing ONLY in
    * BILLING_PRVDR_ADDRESS — without the exclusion the check would
    * fail), and the FROM_SRVC_DATE range vs the batch. Expectations
    * come from one bounded 1-row aggregate standing in for the
    * etl_log row the file inventory stamped. */
  def q332RawClaimLoadQa(s: SparkSession, dir: String): DataFrame = {
    // the synthetic lineitem carries duplicate (orderkey, linenumber)
    // pairs — the claim-line fixture starts from the DISTINCT key
    // grain so CLM_LINE_TCN is genuinely line-unique (the raw file's
    // contract) and every attribute derives from the key pair
    val keys = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"),
        col("l_linenumber").as("ln")).distinct()
    val (ok, ln) = (col("ok"), col("ln"))
    val f = keys.select(
      (ok * 10 + ln).as("CLM_LINE_TCN"),
      ok.as("TCN"),
      date_add(to_date(lit("1992-01-01")), (ok % 2000).cast("int"))
        .as("FROM_SRVC_DATE"),
      ((ok + ln) % 31).cast("string").as("CLM_TYPE_CID"),
      concat(lit("ADDR "), (ok % 100).cast("string"))
        .as("BILLING_PRVDR_ADDRESS"),
      concat(lit("SRV "), (ln * 7 % 50).cast("string"))
        .as("SERVICING_PRVDR_ADDRESS"),
      when((ok + ln) % 3 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("MCO "), (ok % 7).cast("string")))
        .as("MCO_PRVDR_ADDRESS"),
      concat(lit("C"), (ok % 39).cast("string"))
        .as("MCO_PRVDR_COUNTY"))
    val dup = f
      .filter(col("TCN") % 37 === 0 && col("CLM_LINE_TCN") % 10 === 1)
      .withColumn("BILLING_PRVDR_ADDRESS", lit("ADDR RESUBMIT"))
    val raw = f.unionByName(dup)
    val e = raw.agg(count(lit(1)),
      min(col("FROM_SRVC_DATE")).cast("string"),
      max(col("FROM_SRVC_DATE")).cast("string")).head()
    graft.qa.RawLoadQa.mcaidClaimPartial(s, raw,
        graft.qa.RawLoadQa.Batch(4001, e.getLong(0), e.getString(1),
          e.getString(2)))
      .orderBy(col("qa_item"))
  }

  /** §5 raw mcaid ELIG partial-load QA (q333,
    * load_load_raw.mcaid_elig_partial.R:113-270): the six-check
    * battery — row count, the 8-column-key distinctness (with the
    * reference's outcome-DEPENDENT qa_item label), the
    * CLNDR_YEAR_MNTH range, the 11-char Medicaid-ID and 4-char
    * RAC-code fixed-width gates, and the ≤2% NULL RAC_FROM_DATE
    * share with its exact milli-percent note rendering. The fixture
    * plants ~1/80 NULL from-dates (comfortably under the bar) and a
    * per-row-unique MEDICAID_RECIPIENT_ID so the key is distinct. */
  def q333RawEligLoadQa(s: SparkSession, dir: String): DataFrame = {
    val k = col("o_orderkey")
    val raw = t(s, dir, "orders").select(
      concat(lit("H"), lpad((col("o_custkey") % 800).cast("string"),
        6, "0")).as("MBR_H_SID"),
      (year(to_date(col("o_orderdate"))) * 100 +
        month(to_date(col("o_orderdate")))).as("CLNDR_YEAR_MNTH"),
      concat(lit("R"), lpad(k.cast("string"), 10, "0"))
        .as("MEDICAID_RECIPIENT_ID"),
      when(k % 80 === 0, lit(null).cast("date"))
        .otherwise(to_date(col("o_orderdate"))).as("RAC_FROM_DATE"),
      date_add(to_date(col("o_orderdate")), 59).as("RAC_TO_DATE"),
      (k % 9000 + 1000).cast("string").as("RAC_CODE"),
      when(k % 4 === 0, "Aged Out").when(k % 4 === 1, "Review Done")
        .when(k % 4 === 2, lit(null).cast("string"))
        .otherwise("Other").as("END_REASON_NAME"),
      when(k % 3 === 0, "DualEligible").when(k % 3 === 1, "PartialDual")
        .otherwise("N/A").as("DUALELIGIBLE_INDICATOR"))
    val e = raw.agg(count(lit(1)),
      min(col("CLNDR_YEAR_MNTH")).cast("string"),
      max(col("CLNDR_YEAR_MNTH")).cast("string")).head()
    graft.qa.RawLoadQa.mcaidEligPartial(s, raw,
        graft.qa.RawLoadQa.Batch(4002, e.getLong(0), e.getString(1),
          e.getString(2)))
      .orderBy(col("qa_item"))
  }

  /** §5 pre-load delivery QA (q336,
    * db_loader/mcaid/new_files_download.R:150-260): the two-file
    * battery — the elig arm derives its month span from
    * CLNDR_YEAR_MNTH and lands PASS on the expected-dates step
    * (previous delivery exactly one month behind on both bounds);
    * the claims arm derives months from FROM_SRVC_DATE, has its
    * declared column order SWAPPED (the positional col_qa FAIL), a
    * wrong previous-month span (monvprev FAIL), and previous bounds
    * 0/2 months behind (expdates FAIL). The month-distribution
    * section is the reviewer's eyeball table at both grains. */
  def q336DeliveryQa(s: SparkSession, dir: String): DataFrame = {
    import graft.qa.DeliveryQa
    val elig = t(s, dir, "orders").select(
      (year(to_date(col("o_orderdate"))) * 100 +
        month(to_date(col("o_orderdate")))).as("CLNDR_YEAR_MNTH"),
      concat(lit("R"), lpad(col("o_orderkey").cast("string"), 10, "0"))
        .as("MEDICAID_RECIPIENT_ID"))
    val claims = t(s, dir, "lineitem").select(
      to_date(col("l_shipdate")).as("FROM_SRVC_DATE"),
      col("l_orderkey").as("TCN"))
    DeliveryQa.battery(s, Seq(
        ("mcaid_elig_20250415.txt", elig,
          Seq("CLNDR_YEAR_MNTH", "MEDICAID_RECIPIENT_ID"),
          DeliveryQa.PrevDelivery(18.0, 80, "1994-12-01",
            "2001-07-31")),
        ("mcaid_claims_20250415.txt", claims,
          Seq("TCN", "FROM_SRVC_DATE"),   // swapped vs the frame
          DeliveryQa.PrevDelivery(700.0, 5, "1995-01-01",
            "2001-09-30"))))
      .orderBy(col("section"), col("file_name"), col("ym"))
  }
}
