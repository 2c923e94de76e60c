package graft.builds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Combined mcaid + mcare claim DETAIL tables — the line / dx / procedure
  * grain siblings of [[McaidMcareClaimHeader]]:
  *
  *   - `load_stage.mcaid_mcare_claim_line.R` (:219-258): per-source
  *     crosswalk to id_apde, NULL-pad the drift columns (mcaid carries
  *     rac_code_line, mcare carries place_of_service_code /
  *     type_of_service / filetype_mcare), UNION distinct;
  *   - `load_stage.mcaid_mcare_claim_icdcm_header.R` (:25-62): same shape
  *     at diagnosis grain (drift: filetype_mcare only);
  *   - `load_stage.mcaid_mcare_claim_procedure.R` (:10-68): same shape at
  *     procedure grain.
  *
  * Plus the two steps unique to the line script:
  *
  *   - [[remapIds]] — the partial-load id migration (:192-206): when the
  *     apde crosswalk is re-cut, rows already loaded under an OLD id_apde
  *     must move to the NEW one. The reference UPDATEs through
  *     old-xwalk LEFT JOIN new-xwalk on an OR of null-guarded source-id
  *     equalities; an OR join is a nested loop at xwalk scale (~10^8
  *     persons), so here it is decomposed into its three mutually
  *     exclusive equi-join branches (the null guards on the OLD side
  *     partition its rows: mcaid-only, mcare-only, both) and made
  *     deterministic with a min() pick where the reference's UPDATE would
  *     be arbitrary under duplicate new-xwalk matches.
  *   - [[refresh]] — the two-source partial-date refresh (:160-215):
  *     each source's refresh window is cut at a DIFFERENT grain (mcaid: a
  *     YYYY-MM-DD day cutoff on first_service_date; mcare: a calendar-
  *     year cutoff), rows of the existing table inside their source's
  *     window are dropped, and the freshly built rows for those windows
  *     take their place.
  *
  * Scale shape: the union is two broadcast crosswalk joins + one DISTINCT
  * shuffle on the detail grain (the only wide exchange — at 100 TB the
  * detail table dominates, and it is touched exactly once). remapIds joins
  * xwalk-to-xwalk first (person-count sized, orders of magnitude below
  * claim-line count) and broadcasts the resulting old→new map into the
  * fact; refresh is a narrow filter + union, no shuffle at all.
  */
object McaidMcareClaimDetail {

  /** Crosswalked drift union shared by every combined table: left joins
    * (claims of un-crosswalked persons keep NULL id_apde, exactly like
    * the reference), missing drift columns NULL-pad, UNION distinct. */
  def xwalkUnion(mcaid: DataFrame, mcare: DataFrame, xwalkMcaid: DataFrame,
      xwalkMcare: DataFrame): DataFrame = {
    val m1 = mcaid.join(broadcast(xwalkMcaid), Seq("id_mcaid"), "left")
      .drop("id_mcaid").withColumn("source_desc", lit("mcaid"))
    val m2 = mcare.join(broadcast(xwalkMcare), Seq("id_mcare"), "left")
      .drop("id_mcare").withColumn("source_desc", lit("mcare"))
    m1.unionByName(m2, allowMissingColumns = true).distinct()
  }

  /** Old→new id_apde migration map. Both xwalks carry
    * (id_apde, id_mcaid, id_mcare); the reference's OR-of-equalities join
    * condition (line.R:199-201) null-guards BOTH sides in each disjunct
    * (`x.id_mcare IS NULL AND y.id_mcare IS NULL` etc.), so it splits
    * into three mutually-exclusive equi-join branches keyed by the null
    * pattern of BOTH rows:
    *   - old mcaid-only rows match NEW mcaid-only rows on id_mcaid,
    *   - old mcare-only rows match NEW mcare-only rows on id_mcare,
    *   - dual-id rows match dual rows on BOTH ids.
    * A person whose id pattern CHANGED in the re-cut (e.g. mcaid-only →
    * dual) matches no branch and maps to NULL — that is the reference
    * semantics too (its dual disjunct compares `x.id_mcare = y.id_mcare`
    * with a NULL old side → UNKNOWN). min(new id) per old id replaces
    * the reference UPDATE's arbitrary pick under duplicate matches.
    * Old ids with no new-xwalk match map to NULL — the reference's LEFT
    * JOIN UPDATE nulls them too (the person fell out of the re-cut
    * crosswalk, so their claims are no longer linkable). */
  def idMigrationMap(xwalkOld: DataFrame, xwalkNew: DataFrame): DataFrame = {
    val x = xwalkOld.select(col("id_apde"), col("id_mcaid"), col("id_mcare"))
    val y = xwalkNew.select(col("id_apde").as("id_apde_new"),
      col("id_mcaid").as("y_mcaid"), col("id_mcare").as("y_mcare"))
    val mcaidOnly = x.filter(col("id_mcaid").isNotNull && col("id_mcare").isNull)
      .join(y.filter(col("y_mcaid").isNotNull && col("y_mcare").isNull),
        col("id_mcaid") === col("y_mcaid"), "left")
    val mcareOnly = x.filter(col("id_mcaid").isNull && col("id_mcare").isNotNull)
      .join(y.filter(col("y_mcaid").isNull && col("y_mcare").isNotNull),
        col("id_mcare") === col("y_mcare"), "left")
    val dual = x.filter(col("id_mcaid").isNotNull && col("id_mcare").isNotNull)
      .join(y.filter(col("y_mcaid").isNotNull && col("y_mcare").isNotNull),
        col("id_mcaid") === col("y_mcaid") && col("id_mcare") === col("y_mcare"),
        "left")
    mcaidOnly.unionByName(mcareOnly).unionByName(dual)
      .groupBy(col("id_apde"))
      .agg(min(col("id_apde_new")).as("id_apde_new"))
  }

  /** Apply [[idMigrationMap]] to an already-loaded combined table:
    * every row's id_apde is rewritten to the new crosswalk's id (NULL if
    * the person no longer crosswalks — reference semantics). The map is
    * person-count sized, so it broadcasts into the fact scan. */
  def remapIds(existing: DataFrame, xwalkOld: DataFrame,
      xwalkNew: DataFrame): DataFrame = {
    val mapping = idMigrationMap(xwalkOld, xwalkNew)
    existing.join(broadcast(mapping), Seq("id_apde"), "left")
      .withColumn("id_apde", col("id_apde_new"))
      .drop("id_apde_new")
  }

  /** Rows inside a source's refresh window (line.R:160-186): mcaid cut at
    * a day boundary on first_service_date, mcare at a calendar-year
    * boundary — deliberately asymmetric, matching how the two sources
    * deliver data (mcaid monthly, mcare by annual file). */
  private def inRefreshWindow(mcaidDate: Option[String],
      mcareYear: Option[Int]): Column = {
    val m1 = mcaidDate.map(d => col("source_desc") === "mcaid" &&
      col("first_service_date") >= to_date(lit(d)))
    val m2 = mcareYear.map(y => col("source_desc") === "mcare" &&
      year(col("first_service_date")) >= y)
    (m1.toSeq ++ m2.toSeq).reduceOption(_ || _).getOrElse(lit(false))
  }

  /** Two-source partial refresh: DELETE existing rows in each source's
    * window, INSERT the freshly built rows for those windows (line.R's
    * delete/insert pair, re-expressed as filter + union — append-only, no
    * in-place mutation, so it composes with immutable storage). With both
    * cutoffs None the existing table passes through untouched (full
    * loads replace the table wholesale upstream instead). */
  def refresh(existing: DataFrame, rebuilt: DataFrame,
      mcaidDate: Option[String], mcareYear: Option[Int]): DataFrame = {
    val w = inRefreshWindow(mcaidDate, mcareYear)
    // DELETE-where-w keeps rows whose predicate is UNKNOWN (a NULL
    // service date must survive the refresh) — a bare filter(!w) would
    // silently drop them
    existing.filter(coalesce(!w, lit(true)))
      .unionByName(rebuilt.filter(w))
  }
}
