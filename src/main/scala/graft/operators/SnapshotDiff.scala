package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — the row-level generalization of the
  * reference's prior-load QA: every monthly rebuild is checked against
  * the previous release with per-year count monotonicity
  * (qa_stage.mcaid_claim_header.R:150-199) and expected-vs-actual load
  * counts (qa_load_file.R:384-415). Counts say THAT a load drifted;
  * at lake scale the useful artifact is WHICH rows — added, removed,
  * changed, unchanged — so a bad extract is diagnosable without
  * re-pulling the source.
  *
  * Shape: ONE key-partitioned full-outer join. Payload equality is the
  * null-safe conjunction of `<=>` per carried column — no canonical
  * hash to disagree on across engines, NULL = NULL by design (the
  * T-SQL QA's `EXCEPT`-style semantics). Both sides' payloads ride the
  * join, so consumers can select before/after values of changed rows.
  *
  * Scale: the join shuffles both snapshots on the key once; bucketed
  * snapshot layouts (the q74 discipline) make it exchange-free. No
  * window, no skew (keys are unique per side by contract — assert
  * upstream with the q187-style dup probe if unsure).
  */
object SnapshotDiff {

  /** @param prev  prior snapshot, unique on keyCols
    * @param cur   new snapshot, unique on keyCols
    * @return keyCols ++ diff_status ++ prev/cur payload columns
    *         (prefixed `prev_` / `cur_`) */
  def diff(prev: DataFrame, cur: DataFrame, keyCols: Seq[String],
      payloadCols: Seq[String]): DataFrame = {
    // Presence is decided by marker columns, NOT key-null tests: a
    // side's row with a NULL key never equi-joins, and a key-null test
    // would then mislabel a prev-only NULL-key row as "added".
    val p = prev.select(keyCols.map(col) ++ payloadCols.map(col) :+
      lit(1).as("_in_p"): _*).alias("p")
    val c = cur.select(keyCols.map(col) ++ payloadCols.map(col) :+
      lit(1).as("_in_c"): _*).alias("c")
    val joinCond = keyCols.map(k => col(s"p.$k") === col(s"c.$k"))
      .reduce(_ && _)
    val inPrev = col("p._in_p").isNotNull
    val inCur = col("c._in_c").isNotNull
    val samePayload: Column = payloadCols
      .map(f => col(s"p.$f") <=> col(s"c.$f"))
      .foldLeft(lit(true))(_ && _)
    val status = when(!inPrev, "added")
      .when(!inCur, "removed")
      .when(samePayload, "unchanged")
      .otherwise("changed")
    p.join(c, joinCond, "full")
      .select(
        keyCols.map(k => coalesce(col(s"p.$k"), col(s"c.$k")).as(k)) ++
          Seq(status.as("diff_status")) ++
          payloadCols.map(f => col(s"p.$f").as(s"prev_$f")) ++
          payloadCols.map(f => col(s"c.$f").as(s"cur_$f")): _*)
  }
}
