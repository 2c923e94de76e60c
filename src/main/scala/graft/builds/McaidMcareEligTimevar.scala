package graft.builds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Intervals

/** Combined mcaid+mcare elig_timevar — the reference's dual-enrollment
  * timeline merge (load_stage.mcaid_mcare_elig_timevar.R):
  *
  *   1. crosswalk each source to the common person id (:33-57) and keep
  *      one row per (person, from, to) — the reference consolidates
  *      multi-match crosswalk dupes with a seeded-random pick (:62-74);
  *      here the pick is a deterministic total order over the attribute
  *      columns so reruns and oracles agree;
  *   2. overlay the two interval sets into elementary segments labeled
  *      with each side's attributes ([[Intervals.overlaySegments]] — the
  *      sweep-line re-expression of the reference's cartesian +
  *      overlap-type expansion + repair rules, :98-340, and of its
  *      foverlaps attribute join, :342-364);
  *   3. collapse date-contiguous segments that agree on every attribute
  *      (:370-374);
  *   4. flags (:376-430): mcare = any of part a/b/c, mcaid = cov_type
  *      present, apde_dual = both, dual promoted to 1 for duals;
  *      full_criteria replicating the reference EXACTLY AS THE R
  *      EXECUTES — in `y1114 & dual & fb & tpl | (part_a | part_b)` R's
  *      `&` binds tighter than `|`, so the part-A/B disjunct applies to
  *      EVERY row, subsuming the mcare-only partial-data rules (:394) —
  *      plus NULL→0 fills for the uncovered side's flags, a
  *      contiguous-with-previous-row flag, cov_time_day, zip coalesce
  *      (mcaid wins, :419), and the King-County flag from county code or
  *      zip membership (:424-428).
  *
  * The 2011-2014 "years without partial data" window (:390-392) is the
  * `noPartialFrom`/`noPartialTo` parameter so tests can place it inside
  * the synthetic date range.
  *
  * Scale: the crosswalk joins broadcast (the xwalk is person-level but
  * each side filters to matched ids — at statewide scale it shuffle-joins
  * on the id; Spark picks by size). Everything after is keyed on the
  * person id: one boundary-distinct shuffle, two co-keyed attach joins,
  * one island window + collapse groupBy sharing the same hash, and one
  * final lag window. No driver-side state, no cartesian anywhere.
  */
object McaidMcareEligTimevar {

  /** One deterministic row per (id, from, to): total-order the attribute
    * columns (nulls first) and keep row 1 — replaces the reference's
    * set.seed(98104) random sorter (:62-74) with a pick an oracle can
    * reproduce. */
  def dedupPerInterval(df: DataFrame, idCol: String, from: String,
      to: String): DataFrame =
    McaidMcareEligDemo.dedupPerKey(df, Seq(idCol, from, to))

  /** @param xwalk `id_apde`, `id_mcaid`, `id_mcare`
    * @param mcaidTv `id_mcaid, from_date, to_date, dual, tpl,
    *   full_benefit, cov_type, geo_zip, geo_county_code`
    * @param mcareTv `id_mcare, from_date, to_date, part_a, part_b,
    *   part_c, partial, buy_in, geo_zip_mcare`
    * @param kcZips zip codes counted as King County when the county code
    *   is absent (ref: zip_city_region_scc.csv — a small curated list, so
    *   an IN literal; join a broadcast dim if it ever grows) */
  def build(xwalk: DataFrame, mcaidTv: DataFrame, mcareTv: DataFrame,
      kcZips: Seq[String],
      noPartialFrom: String = "2011-01-01",
      noPartialTo: String = "2014-12-31"): DataFrame = {
    val ma = dedupPerInterval(
      mcaidTv.join(xwalk.select(col("id_mcaid"), col("id_apde")), "id_mcaid")
        .drop("id_mcaid"),
      "id_apde", "from_date", "to_date")
    val mc = dedupPerInterval(
      mcareTv.join(xwalk.select(col("id_mcare"), col("id_apde")), "id_mcare")
        .drop("id_mcare"),
      "id_apde", "from_date", "to_date")

    val segs = Intervals.overlaySegments(ma, mc, "id_apde", "from_date",
      "to_date")
    val attrs = segs.columns
      .filterNot(Seq("id_apde", "from_date", "to_date").contains).toSeq
    val collapsed = Intervals.collapse(
      Intervals.islandIds(segs, Seq("id_apde"), "from_date", "to_date",
        maxGapDays = 1, attrs = attrs),
      Seq("id_apde"), "from_date", "to_date", attrs)

    val one = (c: Column) => when(c, 1).otherwise(0)
    val flagged = collapsed
      .withColumn("mcare", one(col("part_a") === 1 || col("part_b") === 1 ||
        col("part_c") === 1))
      .withColumn("mcaid", one(col("cov_type").isNotNull))
      .withColumn("apde_dual", col("mcare") * col("mcaid"))
      .withColumn("dual", when(col("apde_dual") === 1, 1)
        .otherwise(col("dual")))
      .filter(!(col("mcare") === 0 && col("mcaid") === 0))

    val y1114 = one(
      col("from_date").between(lit(noPartialFrom), lit(noPartialTo)) ||
      col("to_date").between(lit(noPartialFrom), lit(noPartialTo)))
    val partAb = col("part_a") === 1 || col("part_b") === 1
    val fullBen = col("full_benefit") === 1 && col("tpl") =!= 1
    val fullCriteria = one(
      (col("mcaid") === 1 && col("mcare") === 0 && col("dual") === 0 &&
        fullBen) ||
      (y1114 === 1 && col("mcaid") === 0 && col("mcare") === 1 && partAb) ||
      (y1114 === 0 && col("mcaid") === 0 && col("mcare") === 1 && partAb &&
        col("partial") === 0) ||
      // the R-precedence quirk: `y1114 & dual & fb | (partAb)` — the
      // partAb disjunct is unconditional (R `&` > `|`)
      (y1114 === 1 && col("apde_dual") === 1 && fullBen) || partAb ||
      (y1114 === 0 && col("apde_dual") === 1 &&
        (fullBen || (partAb && col("partial") === 0))))

    val wPrev = Window.partitionBy(col("id_apde")).orderBy(col("from_date"))
    // NULL-fill source flags to 0 only on rows where that source is
    // absent (a NULL inside a covered row stays NULL, like the R).
    val zeroFills = Seq(
      "mcare" -> Seq("part_a", "part_b", "part_c", "partial", "buy_in"),
      "mcaid" -> Seq("full_benefit"))
    val filled = zeroFills.foldLeft(
      flagged.withColumn("full_criteria", fullCriteria)) {
        case (d, (gate, cols)) => cols.foldLeft(d) { (d2, c) =>
          d2.withColumn(c, when(col(gate) === 0, coalesce(col(c), lit(0)))
            .otherwise(col(c)))
        }
      }
    filled
      .withColumn("contiguous", coalesce(one(
        datediff(col("from_date"), lag(col("to_date"), 1).over(wPrev)) === 1),
        lit(0)))
      .withColumn("cov_time_day",
        datediff(col("to_date"), col("from_date")) + 1)
      .withColumn("geo_zip", coalesce(col("geo_zip"), col("geo_zip_mcare")))
      .drop("geo_zip_mcare")
      .withColumn("geo_kc", one(col("geo_county_code") === "033" ||
        (col("geo_county_code").isNull && col("geo_zip").isin(kcZips: _*))))
      .select(col("id_apde"), col("from_date"), col("to_date"),
        col("contiguous"), col("apde_dual"), col("dual"), col("part_a"),
        col("part_b"), col("part_c"), col("partial"), col("buy_in"),
        col("full_benefit"), col("cov_type"), col("tpl"), col("mcare"),
        col("mcaid"), col("full_criteria"), col("geo_zip"),
        col("geo_county_code"), col("geo_kc"), col("cov_time_day"))
  }
}
