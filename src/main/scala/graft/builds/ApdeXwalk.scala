package graft.builds

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The apde identity crosswalk — the reference's
  * load_stage.xwalk_apde_mcaid_mcare_pha.R build over the IDH
  * IM_HISTORY_TABLE:
  *
  *  - three extracts of the current (IS_HISTORICAL = 'N') history rows:
  *    all master ids, the MEDICAID-source links, and the public-housing
  *    links (:113-135);
  *  - pattern gates exactly as the R validates them: KCMASTER_ID must
  *    match `^[0-9]{9}KC$`, id_mcaid must be all-digits, phousing_id
  *    must be 64 chars (:142-147);
  *  - per id_mcaid / phousing_id only the MOST RECENTLY touched master
  *    link survives (:149-157). The reference's data.table `.SD[1]`
  *    after `setorder(-touched)` leaves ties in arbitrary physical
  *    order; we pin the tie with KCMASTER_ID ascending so the pick is
  *    deterministic — the only divergence, and only on exact-tie rows;
  *  - a 1:1 10-char [a-z0-9] id_apde per KCMASTER_ID (:159-160). The
  *    reference draws seeded random strings (id_nodups); the
  *    deterministic stand-in is the first 10 hex chars of
  *    md5(KCMASTER_ID) — same alphabet and width, reproducible across
  *    engines (collision odds at any realistic id count are ~n²/2^41,
  *    and a collision would only merge two persons' ids, which QA's
  *    distinctness check would catch);
  *  - FULL merges by KCMASTER_ID: a master id with m medicaid links and
  *    p housing links intentionally yields m×p rows ("there can be
  *    multiple rows for each KCMASTER_ID", :10-11); id_mcare is the
  *    documented NULL placeholder (:169-173).
  *
  * Scale shape: two window passes keyed on the link ids, two full
  * joins keyed on KCMASTER_ID (person-cardinality, no skew beyond a
  * person's own link counts), one projection. Nothing collected.
  */
object ApdeXwalk {

  /** @param history IM_HISTORY_TABLE-shaped frame: (KCMASTER_ID,
    *                SOURCE_SYSTEM, MBR_H_SID, PHOUSING_ID, LAST_TOUCHED,
    *                IS_HISTORICAL)
    * @return (id_apde, KCMASTER_ID, id_mcaid, id_mcare, phousing_id) */
  def build(history: DataFrame): DataFrame = {
    val current = history.filter(col("IS_HISTORICAL") === "N" &&
      col("KCMASTER_ID").isNotNull)
    val idh = current
      .filter(col("KCMASTER_ID").rlike("^[0-9]{9}KC$"))
      .select(col("KCMASTER_ID")).distinct()
      .withColumn("id_apde", substring(md5(col("KCMASTER_ID")), 1, 10))

    def mostRecent(links: DataFrame, idCol: String): DataFrame = {
      val w = Window.partitionBy(col(idCol))
        .orderBy(col("touched").desc, col("KCMASTER_ID").asc)
      links.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("KCMASTER_ID"), col(idCol))
    }
    val mcaid = mostRecent(
      current.filter(col("SOURCE_SYSTEM") === "MEDICAID" &&
          col("MBR_H_SID").rlike("^[0-9]+$"))
        .select(col("KCMASTER_ID"), col("MBR_H_SID").as("id_mcaid"),
          col("LAST_TOUCHED").cast("date").as("touched"))
        .distinct(),
      "id_mcaid")
    val pha = mostRecent(
      current.filter(col("PHOUSING_ID").isNotNull &&
          length(col("PHOUSING_ID")) === 64)
        .select(col("KCMASTER_ID"), col("PHOUSING_ID").as("phousing_id"),
          col("LAST_TOUCHED").cast("date").as("touched"))
        .distinct(),
      "phousing_id")

    idh
      .join(mcaid, Seq("KCMASTER_ID"), "full")
      .join(pha, Seq("KCMASTER_ID"), "full")
      .select(col("id_apde"), col("KCMASTER_ID"), col("id_mcaid"),
        lit(null).cast("string").as("id_mcare"), col("phousing_id"))
  }
}
