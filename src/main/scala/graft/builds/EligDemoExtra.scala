package graft.builds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** mcaid elig_demo "extra" — the noncisgender demographic flag
  * (load_stage.mcaid_elig_demo_extra.R), a pure set-algebra cascade
  * over dx / procedure / pharmacy evidence:
  *
  *  - dx sets: gender-dysphoria codes (F64* / F651* / Z87890*) and
  *    endocrine-NOS codes (the E-code charclass battery, :31-44);
  *  - six procedure sets: three transmasculine (one unconditional
  *    list; '58661' minus uterine/ovarian-cancer claims; a second list
  *    minus vaginal-cancer claims — both exclusions CLAIM-level
  *    anti-joins on claim_header_id) and three transfeminine
  *    (unconditional; orchiectomy minus testicular cancer; penectomy
  *    minus penile cancer), :45-150;
  *  - four hormone sets resolved through the NDC reference by
  *    nonproprietary-name LIKE, two further gated on parsed
  *    ACTIVE_NUMERATOR_STRENGTH (first ';'-piece, first token,
  *    numeric) × dosage form: testosterone ≥7 injectable / ≥2
  *    gel-patch, spironolactone ≥50 (:151-215);
  *  - assembly (:248-285): trans-unknown = dysphoria minus both proc
  *    sets; endo∩proc, proc∩hormones, and endo∩hormones gated by
  *    recorded gender (masc requires gender_me='Female', fem 'Male');
  *    ids in BOTH final sides conflict out; the union flags
  *    noncisgender = 1 on the demographics table.
  *
  * The reference also pulls two exclusion tables (tbl4e sexual-
  * dysfunction, tbl4f spironolactone-indication dx) that its assembly
  * never references — dead pulls, not reproduced.
  *
  * Scale shape: every set is an id projection deduped once; set ops
  * are semi/anti joins on the person id; the code dims broadcast.
  */
object EligDemoExtra {

  private def idsWhere(df: DataFrame, pred: Column): DataFrame =
    df.filter(pred).select(col("id_mcaid")).distinct()

  /** Claim-level exclusion: procedure pull minus claims carrying any
    * excluded dx (anti-join on claim_header_id). */
  private def procMinusDx(proc: DataFrame, procCodes: Seq[String],
      icdcm: DataFrame, dxPred: Column): DataFrame =
    proc.filter(col("procedure_code").isin(procCodes: _*))
      .join(icdcm.filter(dxPred).select(col("claim_header_id")).distinct(),
        Seq("claim_header_id"), "left_anti")
      .select(col("id_mcaid")).distinct()

  private def union(dfs: DataFrame*): DataFrame =
    dfs.reduce(_ union _).distinct()

  private def inter(a: DataFrame, b: DataFrame): DataFrame =
    a.join(b, Seq("id_mcaid"), "left_semi")

  private def minus(a: DataFrame, b: DataFrame): DataFrame =
    a.join(b, Seq("id_mcaid"), "left_anti")

  /** @param icdcm  (id_mcaid, claim_header_id, icdcm_norm,
    *               icdcm_version)
    * @param proc   (id_mcaid, claim_header_id, procedure_code)
    * @param pharm  (id_mcaid, ndc)
    * @param demo   (id_mcaid, gender_me)
    * @param ndcRef (ndc, nonproprietaryname, dosageformname,
    *               active_numerator_strength, active_ingred_unit)
    * @return demo + noncisgender flag */
  def build(icdcm: DataFrame, proc: DataFrame, pharm: DataFrame,
      demo: DataFrame, ndcRef: DataFrame): DataFrame = {
    val norm = col("icdcm_norm")
    val v9 = col("icdcm_version") === 9
    val v10 = col("icdcm_version") === 10

    val dysphoria = idsWhere(icdcm, norm.rlike("^(F64|F651|Z87890)"))
    val endoNos = idsWhere(icdcm, norm.rlike(
      "^(E34[89]|E0[0-7]|E2[0-7]|E31|E34[0-4]|E7|E8[03457]|E88[0-4])"))

    // the reference's '0W4NOK1' carries a letter O (ICD-10-PCS never
    // does) and can never match — the evident intent '0W4N0K1' is
    // implemented, same discipline as ClaimNaloxone's 'G2216 ' literal
    val ftmProc = idsWhere(proc, col("procedure_code").isin(
      "0W4N071", "0W4N0J1", "0W4N0K1", "15757", "53410", "55175",
      "55180", "55899", "55980", "57120", "64856"))
    val ftmNoUter = procMinusDx(proc, Seq("58661"), icdcm,
      (v9 && norm.startsWith("183")) ||
        (v10 && norm.rlike("^C5[67]")))
    val ftmNoVag = procMinusDx(proc,
      Seq("58661", "704", "7162", "0UTG0ZZ", "0UTG4ZZ", "0UTG7ZZ",
        "0UTG8ZZ", "0UTM0ZZ", "0UTMXZZ"), icdcm,
      (v9 && norm.startsWith("184")) ||
        (v10 && norm.rlike("^C5[12]")))
    val transmascProc = union(ftmProc, ftmNoUter, ftmNoVag)

    val mtfProc = idsWhere(proc, col("procedure_code").isin(
      "0W4M070", "0W4M0J0", "0W4M0K0", "0W4M0Z0", "21209", "31899",
      "53430", "54125", "55970", "56805", "57335", "58999"))
    val mtfNoTest = procMinusDx(proc, Seq("54520", "54690"), icdcm,
      (v9 && norm.rlike("^187[5-9]")) || (v10 && norm.rlike("^C6[23]")))
    val mtfNoPen = procMinusDx(proc,
      Seq("643", "0VTS0ZZ", "0VTS4ZZ", "0VTSXZZ"), icdcm,
      (v9 && norm.rlike("^187[1-4]")) || (v10 && norm.startsWith("C60")))
    val transfemProc = union(mtfProc, mtfNoTest, mtfNoPen)

    val name = upper(col("nonproprietaryname"))
    val strength = split(split(col("active_numerator_strength"), ";")
      .getItem(0), " ").getItem(0).cast("double")
    def hormoneIds(refPred: Column): DataFrame =
      pharm.join(broadcast(ndcRef.filter(refPred)
          .select(col("ndc")).distinct()), Seq("ndc"))
        .select(col("id_mcaid")).distinct()
    val femNoReq = hormoneIds(name.contains("ESTRAD") ||
      name.contains("ESTRO") || name.contains("ESTRIOL") ||
      name.contains("ESTR/PRG"))
    val mascNoReq = hormoneIds(
      name.contains("DIHYDROTESTOSTERONE PROPIONATE") ||
        name.contains("NANDROLONE") || name.contains("STANOLONE") ||
        name.contains("STANOZOLOL"))
    val mascMinReq = hormoneIds(name.contains("TESTOSTERONE") &&
      ((strength >= 7 && col("dosageformname")
          .isin("INJECTION", "INJECTION, SOLUTION")) ||
        (strength >= 2 && col("dosageformname")
          .isin("GEL", "PATCH", "GEL, METERED"))))
    val femMinReq = hormoneIds(name.contains("SPIRONOLACTONE") &&
      strength >= 50)
    val mascHormones = union(mascNoReq, mascMinReq)
    val femHormones = union(femNoReq, femMinReq)

    val transUnknown = minus(dysphoria, union(transmascProc, transfemProc))
    val enosMascFSex = inter(
      idsWhere(demo, col("gender_me") === "Female"),
      inter(endoNos, mascHormones))
    val enosFemMSex = inter(
      idsWhere(demo, col("gender_me") === "Male"),
      inter(endoNos, femHormones))
    val transmascIds = union(transmascProc, inter(endoNos, transmascProc),
      inter(transmascProc, mascHormones), enosMascFSex)
    val transfemIds = union(transfemProc, inter(endoNos, transfemProc),
      inter(transfemProc, femHormones), enosFemMSex)
    val conflicts = inter(transmascIds, transfemIds)
    val flagged = union(
      minus(transmascIds, conflicts),
      minus(transfemIds, conflicts),
      minus(minus(transUnknown, transmascIds), transfemIds))

    demo.join(flagged.withColumn("noncisgender", lit(1)),
        Seq("id_mcaid"), "left")
      .select(col("id_mcaid"), col("gender_me"),
        coalesce(col("noncisgender"), lit(0)).as("noncisgender"))
  }
}
