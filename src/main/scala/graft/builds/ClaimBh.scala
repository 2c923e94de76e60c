package graft.builds

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Intervals

/** claim_bh — the behavioral-health condition-span build: three per-source
  * person-month frames (diagnosis, pharmacy, procedure evidence) FULL OUTER
  * joined with coalesced keys (claim_bh.R:232-309), then per-person
  * contiguous evidence months collapsed to condition episodes with
  * min/max dates and per-source totals (claim_bh.R:193-202).
  *
  * Scale: the two full-outer joins shuffle on (id, month-index) — person-
  * month grain, already aggregated, so volume is bounded by active person-
  * months, not claims; the episode islands reuse one (id)-partitioned
  * window pass (arithmetic islands — no lag chain).
  */
object ClaimBh {

  /** @param dx (id, mi, n_dx) person-month diagnosis evidence
    * @param rx (id, mi, n_rx) person-month pharmacy evidence
    * @param px (id, mi, n_px) person-month procedure evidence
    *           where `mi` is a dense month index (year*12 + month).
    * @return one row per (person, episode): month span, per-source claim
    *         totals, and a multi-source confirmation flag. */
  def build(dx: DataFrame, rx: DataFrame, px: DataFrame): DataFrame = {
    val a = dx.alias("a")
    val b = rx.alias("b")
    val j1 = a.join(b,
        col("a.id") === col("b.id") && col("a.mi") === col("b.mi"), "full")
      .select(
        coalesce(col("a.id"), col("b.id")).as("id"),
        coalesce(col("a.mi"), col("b.mi")).as("mi"),
        coalesce(col("a.n_dx"), lit(0L)).as("n_dx"),
        coalesce(col("b.n_rx"), lit(0L)).as("n_rx"))
      .alias("j")
    val c = px.alias("c")
    val merged = j1.join(c,
        col("j.id") === col("c.id") && col("j.mi") === col("c.mi"), "full")
      .select(
        coalesce(col("j.id"), col("c.id")).as("id"),
        coalesce(col("j.mi"), col("c.mi")).as("mi"),
        coalesce(col("j.n_dx"), lit(0L)).as("n_dx"),
        coalesce(col("j.n_rx"), lit(0L)).as("n_rx"),
        coalesce(col("c.n_px"), lit(0L)).as("n_px"))

    // contiguous evidence months -> episodes (arithmetic islands on the
    // dense month index; same-key rows are unique post-join)
    Intervals.islandKeyByStep(merged, Seq("id"), "mi")
      .groupBy(col("id"), col("island_id"))
      .agg(
        min(col("mi")).as("from_mi"),
        max(col("mi")).as("to_mi"),
        count(lit(1)).as("n_months"),
        sum(col("n_dx")).as("n_dx"),
        sum(col("n_rx")).as("n_rx"),
        sum(col("n_px")).as("n_px"))
      .withColumn("multi_source",
        ((col("n_dx") > 0).cast("int") + (col("n_rx") > 0).cast("int") +
          (col("n_px") > 0).cast("int")) >= 2)
      .drop("island_id")
  }
}
