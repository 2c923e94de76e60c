package graft.builds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Address cleaning + geocoding stage — the pipeline that mints every
  * geo_* column the eligibility builds consume
  * (load_stage.address_clean_partial.R — identically the
  * stage/tables/load_stage_address_clean_partial.R wrapper whose
  * step 1 is the same hash anti-join + Informatica export and step 2
  * the manual-correction-aware append — and
  * load_stage.address_geocode.R):
  *
  *  1. [[newAddresses]] — new-address detection: DISTINCT stage
  *     addresses anti-joined against the ref table's geo_hash_raw
  *     (partial.R:31-50);
  *  2. [[stubClean]] — the reference exports new addresses to an
  *     EXTERNAL cleaning service (Informatica) and reads results back.
  *     No such service exists here, so a clearly-marked deterministic
  *     normalizer stands in (trim/uppercase/collapse whitespace, blank →
  *     NULL, PO-box extraction); the surrounding plumbing — detection,
  *     normalization rules, override trim, hash minting — is the real
  *     surface;
  *  3. [[normalizePostClean]] — the reference's post-clean rules
  *     (partial.R:125-137): '#'-prefixed raw add1 backfills a missing
  *     add2, the PO box folds into add1 (when add1 missing) or add2
  *     (append when both present), and po_box collapses to a flag;
  *  4. [[applyOverrides]] — the curated manual-fix table replaces
  *     matching raw-key rows entirely (inner-join pick + anti-trim,
  *     NULL-safe on every key, matching R's NA-equal join semantics);
  *  5. [[withHashes]] — SHA-256 identity hashes over pipe-joined
  *     null-blanked fields, uppercased: geo_hash_raw (6 raw fields,
  *     backfilled only where missing), geo_hash_clean (5 clean fields),
  *     geo_hash_geocode (clean minus add2 — the geocoding grain);
  *  6. [[geocodeAttach]] — the ESRI-first / HERE-fallback source
  *     selection (geocode.R:137-168): HERE wins when it returned a
  *     house number or ESRI had no locator; zip/street centroid flags;
  *     the geocoded ZIP harvested by regex from the matched address
  *     (including the reference's leading-space artifact on the HERE
  *     side, kept faithfully); coordinate pick by source.
  *
  * Scale: addresses are person-scale (not claim-scale) and the stage is
  * vocabulary-style: DISTINCT first, every ref broadcast, one anti-join
  * shuffle.
  */
object AddressClean {

  private val rawKeys = Seq("geo_add1_raw", "geo_add2_raw", "geo_city_raw",
    "geo_state_raw", "geo_zip_raw")

  /** Step 1: distinct new addresses not yet in the ref table. */
  def newAddresses(stage: DataFrame, ref: DataFrame): DataFrame =
    stage.select((rawKeys :+ "geo_hash_raw").map(col): _*).distinct()
      .join(ref.select(col("geo_hash_raw")).distinct(),
        Seq("geo_hash_raw"), "left_anti")

  private def norm(c: Column): Column =
    nullif(regexp_replace(trim(upper(c)), " +", " "), lit(""))

  /** STUB stand-in for the external cleaning service (see scaladoc). */
  def stubClean(newAdds: DataFrame): DataFrame = {
    val a1 = norm(col("geo_add1_raw"))
    val po = regexp_extract(a1, "^P\\.? ?O\\.? BOX ([0-9]+)$", 1)
    newAdds.select(
      when(po =!= "", lit(null)).otherwise(a1).as("add1"),
      norm(col("geo_add2_raw")).as("add2"),
      when(po =!= "", concat(lit("PO BOX "), po)).as("po_box"),
      norm(col("geo_city_raw")).as("city"),
      norm(col("geo_state_raw")).as("state"),
      norm(col("geo_zip_raw")).as("zip"),
      col("geo_add1_raw").as("old_add1"), col("geo_add2_raw").as("old_add2"),
      col("geo_city_raw").as("old_city"), col("geo_state_raw").as("old_state"),
      col("geo_zip_raw").as("old_zip"))
  }

  /** Step 3: the reference's post-clean folding rules, applied in the
    * reference's sequential order. */
  def normalizePostClean(cleaned: DataFrame): DataFrame = {
    val s1 = cleaned.withColumn("add2",
      when(col("add2").isNull && col("old_add1").startsWith("#"),
        col("old_add1")).otherwise(col("add2")))
    val s2 = s1.withColumn("add1",
      when(col("add1").isNull && col("po_box").isNotNull, col("po_box"))
        .otherwise(col("add1")))
    s2.withColumn("add2",
        when(col("add1") === col("po_box"), col("add2"))
          .when(col("add2").isNull && col("po_box").isNotNull &&
            col("add1").isNotNull, col("po_box"))
          .when(col("add2").isNotNull && col("po_box").isNotNull &&
            col("add1").isNotNull,
            concat(col("add2"), lit(" "), col("po_box")))
          .otherwise(col("add2")))
      .withColumn("po_box",
        when(col("po_box").isNotNull, 1).otherwise(0))
      .select(col("old_add1").as("geo_add1_raw"),
        col("old_add2").as("geo_add2_raw"),
        col("old_city").as("geo_city_raw"),
        col("old_state").as("geo_state_raw"),
        col("old_zip").as("geo_zip_raw"),
        col("add1").as("geo_add1_clean"), col("add2").as("geo_add2_clean"),
        col("city").as("geo_city_clean"), col("state").as("geo_state_clean"),
        col("zip").as("geo_zip_clean"))
  }

  private val cleanCols = Seq("geo_add1_clean", "geo_add2_clean",
    "geo_city_clean", "geo_state_clean", "geo_zip_clean")

  /** Step 4: manual-fix rows (keyed on the 5 raw fields, NULL-safe —
    * matching R's NA-equal join semantics) replace the service-cleaned
    * rows wholesale. `manual` carries the raw keys and the curated
    * clean columns. */
  def applyOverrides(cleaned: DataFrame, manual: DataFrame): DataFrame = {
    val m = manual.select((rawKeys ++ cleanCols)
      .map(k => col(k).as(s"m_$k")): _*)
    val cond = rawKeys.map(k => col(k) <=> col(s"m_$k")).reduce(_ && _)
    val inManual = cleaned.select(rawKeys.map(col): _*).distinct()
      .join(broadcast(m), cond)
      .select(rawKeys.map(col) ++ cleanCols.map(k => col(s"m_$k").as(k)): _*)
    val trimmed = cleaned
      .join(broadcast(m.select(rawKeys.map(k => col(s"m_$k")): _*)), cond,
        "left_anti")
    trimmed.unionByName(inManual)
  }

  private def pipeHash(cols: Seq[Column]): Column =
    upper(sha2(concat_ws("|", cols.map(c => coalesce(c, lit(""))): _*), 256))

  /** Step 5: identity hashes (raw backfilled only where missing). */
  def withHashes(df: DataFrame): DataFrame =
    df.withColumn("geo_add3_raw", lit(null).cast("string"))
      .withColumn("geo_hash_raw",
        when(col("geo_hash_raw").isNull, pipeHash(Seq(col("geo_add1_raw"),
          col("geo_add2_raw"), col("geo_add3_raw"), col("geo_city_raw"),
          col("geo_state_raw"), col("geo_zip_raw"))))
          .otherwise(col("geo_hash_raw")))
      .withColumn("geo_hash_clean", pipeHash(Seq(col("geo_add1_clean"),
        col("geo_add2_clean"), col("geo_city_clean"),
        col("geo_state_clean"), col("geo_zip_clean"))))
      .withColumn("geo_hash_geocode", pipeHash(Seq(col("geo_add1_clean"),
        col("geo_city_clean"), col("geo_state_clean"),
        col("geo_zip_clean"))))
      .withColumn("geo_geocode_skip", lit(0))

  /** Steps 1-5 composed: the ref-table increment. `manual` rows that
    * match a new address replace its cleaned values; hashes are minted
    * at the end (the cleaning service returns rows hash-less, and
    * geo_hash_raw is a pure function of the raw fields, so recomputing
    * reproduces the incoming hash exactly — same as the reference's
    * NA-backfill). */
  def build(stage: DataFrame, ref: DataFrame, manual: DataFrame): DataFrame = {
    val fresh = newAddresses(stage, ref)
    val cleaned = normalizePostClean(stubClean(fresh))
    withHashes(applyOverrides(cleaned, manual)
        .withColumn("geo_hash_raw", lit(null).cast("string")))
      .select(col("geo_add1_raw"), col("geo_add2_raw"), col("geo_add3_raw"),
        col("geo_city_raw"), col("geo_state_raw"), col("geo_zip_raw"),
        col("geo_hash_raw"), col("geo_add1_clean"), col("geo_add2_clean"),
        col("geo_city_clean"), col("geo_state_clean"), col("geo_zip_clean"),
        col("geo_hash_clean"), col("geo_hash_geocode"),
        col("geo_geocode_skip"))
  }

  /** R's `ifelse(x == "" | x == "NA", NA, x)` blank/literal-"NA" fold
    * (address_clean_full.R:87,126-129,355-356). */
  def foldNa(c: Column): Column =
    when(c === "" || c === "NA", lit(null).cast("string")).otherwise(c)

  /** Full-refresh two-source combine (load_stage.address_clean_full.R:
    * 52-129): distinct Medicaid addresses (source flag 1/NULL), distinct
    * partially-cleaned PHA addresses (blank/"NA" folded, flag NULL/1),
    * their NA-equal intersection carrying BOTH flags, the NA-equal
    * anti-joined residuals, the manual-correction trim, and the final
    * blank/"NA" fold over the key columns. The PHA fold happens AFTER
    * its distinct (reference order), so a ''/NULL pair can survive as
    * two NULL rows — faithfully kept (the stage's later distinct is what
    * collapses them). */
  def fullCombine(mcaid: DataFrame, pha: DataFrame,
      manual: DataFrame): DataFrame = {
    val nullInt = lit(null).cast("int")
    val m = mcaid.select(rawKeys.map(col): _*).distinct()
      .withColumn("geo_source_mcaid", lit(1))
      .withColumn("geo_source_pha", nullInt)
    val p = pha.select(rawKeys.map(col): _*).distinct()
      .select(rawKeys.map(c => foldNa(col(c)).as(c)): _*)
      .withColumn("geo_source_mcaid", nullInt)
      .withColumn("geo_source_pha", lit(1))
    val pk = p.select(rawKeys.map(k => col(k).as(s"p_$k")): _*)
    val cond = rawKeys.map(k => col(k) <=> col(s"p_$k")).reduce(_ && _)
    val joint = m.drop("geo_source_pha").join(pk, cond)
      .select(rawKeys.map(col) :+ col("geo_source_mcaid"): _*)
      .withColumn("geo_source_pha", lit(1))
    val jk = joint.select(rawKeys.map(k => col(k).as(s"p_$k")): _*)
    val mOnly = m.join(jk, cond, "left_anti")
    val pOnly = p.join(
      joint.select(rawKeys.map(k => col(k).as(s"p_$k")): _*), cond,
      "left_anti")
    val mk = manual.select(rawKeys.map(k => col(k).as(s"p_$k")): _*)
    mOnly.unionByName(pOnly).unionByName(joint)
      .join(broadcast(mk), cond, "left_anti")
      .select(rawKeys.map(c => foldNa(col(c)).as(c)) ++
        Seq(col("geo_source_mcaid"), col("geo_source_pha")): _*)
  }

  /** Full-refresh PHA restore (address_clean_full.R:354-399): NA-equal
    * full join back to the complete PHA address table; PHA-only rows the
    * cleaning service never matched copy raw→clean (`pha_xfer`); PHA
    * rows then restore their ORIGINAL unit_* raw fields (and add3 =
    * unit_apt2); source flags recomputed (overridden rows count as
    * Medicaid) and maxed per final raw key; distinct.
    *
    * `full` needs rawKeys + the 5 clean cols + po_box + overridden +
    * geo_source_mcaid/_pha; `phaFull` needs rawKeys + unit_add/apt/apt2/
    * city/state/zip (all folded here, matching the R mutate_all). */
  def phaRestore(full: DataFrame, phaFull: DataFrame): DataFrame = {
    val units = Seq("unit_add", "unit_apt", "unit_apt2", "unit_city",
      "unit_state", "unit_zip")
    val py = phaFull.select(
      rawKeys.map(k => foldNa(col(k)).as(s"y_$k")) ++
        units.map(u => foldNa(col(u)).as(u)) :+
        lit(1).as("y_pha"): _*)
    val cond = rawKeys.map(k => col(k) <=> col(s"y_$k")).reduce(_ && _)
    val joined = full.join(py, cond, "full")
      // dplyr full_join merges the by= keys into one coalesced column
      .select(rawKeys.map(k => coalesce(col(k), col(s"y_$k")).as(k)) ++
        Seq("geo_add1_clean", "geo_add2_clean", "geo_city_clean",
          "geo_state_clean", "geo_zip_clean", "po_box", "overridden",
          "geo_source_mcaid", "geo_source_pha", "y_pha").map(col) ++
        units.map(col): _*)
    val xfer = (col("y_pha").isNotNull &&
      col("geo_add1_clean").isNull && col("geo_add2_clean").isNull &&
      col("geo_city_clean").isNull && col("geo_state_clean").isNull &&
      col("geo_zip_clean").isNull).cast("int")
    val isPha = col("y_pha") === 1 && col("y_pha").isNotNull
    val restored = joined
      .withColumn("pha_xfer", xfer)
      // clean backfill reads the PRE-restore raw keys (R mutate order)
      .withColumn("geo_add1_clean", when(col("pha_xfer") === 1,
        col("geo_add1_raw")).otherwise(col("geo_add1_clean")))
      .withColumn("geo_add2_clean", when(col("pha_xfer") === 1,
        col("geo_add2_raw")).otherwise(col("geo_add2_clean")))
      .withColumn("geo_city_clean", when(col("pha_xfer") === 1,
        col("geo_city_raw")).otherwise(col("geo_city_clean")))
      .withColumn("geo_state_clean", when(col("pha_xfer") === 1,
        col("geo_state_raw")).otherwise(col("geo_state_clean")))
      .withColumn("geo_zip_clean", when(col("pha_xfer") === 1,
        col("geo_zip_raw")).otherwise(col("geo_zip_clean")))
      .withColumn("geo_add1_raw",
        when(isPha, col("unit_add")).otherwise(col("geo_add1_raw")))
      .withColumn("geo_add2_raw",
        when(isPha, col("unit_apt")).otherwise(col("geo_add2_raw")))
      .withColumn("geo_add3_raw", col("unit_apt2"))
      .withColumn("geo_city_raw",
        when(isPha, col("unit_city")).otherwise(col("geo_city_raw")))
      .withColumn("geo_state_raw",
        when(isPha, col("unit_state")).otherwise(col("geo_state_raw")))
      .withColumn("geo_zip_raw",
        when(isPha, col("unit_zip")).otherwise(col("geo_zip_raw")))
      .withColumn("geo_source_mcaid",
        when(col("geo_source_mcaid") === 1, 1)
          .when(col("overridden") === 1, 1).otherwise(0))
      .withColumn("geo_source_pha",
        when(col("geo_source_pha") === 1, 1)
          .when(col("y_pha") === 1, 1).otherwise(0))
      .withColumn("overridden",
        when(col("overridden").isNull, 0).otherwise(1))
    val finalKeys = Seq("geo_add1_raw", "geo_add2_raw", "geo_add3_raw",
      "geo_city_raw", "geo_state_raw", "geo_zip_raw")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(finalKeys.map(col): _*)
    restored
      .withColumn("geo_source_mcaid", max(col("geo_source_mcaid")).over(w))
      .withColumn("geo_source_pha", max(col("geo_source_pha")).over(w))
      .select((finalKeys ++ Seq("geo_add1_clean", "geo_add2_clean",
        "geo_city_clean", "geo_state_clean", "geo_zip_clean",
        "geo_source_mcaid", "geo_source_pha", "po_box", "overridden"))
        .map(col): _*)
      .distinct()
  }

  private val cleanKeys = Seq("geo_add1_clean", "geo_city_clean",
    "geo_state_clean", "geo_zip_clean")

  /** Step 6: ESRI-first / HERE-fallback geocode selection. esri carries
    * (clean keys, loc_name, status, match_addr, esri_lon, esri_lat);
    * here carries (clean keys, address_type, formatted_address,
    * here_lon, here_lat). */
  def geocodeAttach(esri: DataFrame, here: DataFrame): DataFrame = {
    val joined = esri.join(
      here.withColumn("geo_check_here", lit(1)), cleanKeys, "left")
    joined
      .withColumn("geo_check_esri", lit(1))
      .withColumn("geo_check_here", coalesce(col("geo_check_here"), lit(0)))
      .withColumn("geo_geocode_source",
        when(col("here_lat").isNotNull &&
          (col("address_type") === "houseNumber" || col("loc_name").isNull),
          "here").otherwise("esri"))
      .withColumn("geo_zip_centroid",
        when((col("geo_geocode_source") === "esri" &&
          col("loc_name") === "zip_5_digit_gc") ||
          (col("geo_geocode_source") === "here" &&
            col("address_type").isin("postalCode", "district")), 1)
          .otherwise(0))
      .withColumn("geo_street_centroid",
        when(col("geo_geocode_source") === "here" &&
          col("address_type") === "street", 1).otherwise(0))
      .withColumn("geo_add_geocoded",
        when(col("geo_geocode_source") === "esri", upper(col("match_addr")))
          .otherwise(upper(col("formatted_address"))))
      // the HERE branch keeps the pattern's leading space — a faithful
      // reproduction of the reference's str_sub(start, end-1) harvest
      .withColumn("geo_zip_geocoded",
        when(col("geo_geocode_source") === "esri",
          nullif(regexp_extract(col("match_addr"), "[0-9]{5}$", 0), lit("")))
          .otherwise(nullif(concat(lit(" "), regexp_extract(
            col("formatted_address"), " ([0-9]{5}),", 1)), lit(" "))))
      .withColumn("geo_add_type",
        when(col("geo_geocode_source") === "esri", col("loc_name"))
          .otherwise(col("address_type")))
      .withColumn("geo_lon",
        when(col("geo_geocode_source") === "esri", col("esri_lon"))
          .otherwise(col("here_lon")))
      .withColumn("geo_lat",
        when(col("geo_geocode_source") === "esri", col("esri_lat"))
          .otherwise(col("here_lat")))
      .select((cleanKeys.map(col) ++ Seq(col("geo_check_esri"),
        col("geo_check_here"), col("geo_geocode_source"),
        col("geo_zip_centroid"), col("geo_street_centroid"),
        col("geo_add_geocoded"), col("geo_zip_geocoded"),
        col("geo_add_type"), col("geo_lon"), col("geo_lat"))): _*)
  }
}
