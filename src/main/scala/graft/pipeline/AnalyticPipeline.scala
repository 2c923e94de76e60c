package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.qa.Qa

/** Composed analytic-pipeline runner — the reference's master build
  * orchestration (claims_db/db_loader/mcaid/master_mcaid_analytic.R:
  * 66-143 and 345-371, claims_db/phclaims/table_dependencies.csv):
  * the analytic tables form a dependency DAG (the csv's (schema, table,
  * parent_schema, parent_table) rows), the master script executes the
  * loads in dependency order, runs each table's qa_stage battery
  * between the stage load and the final promote, and hard-gates
  * mcaid_claim_header behind the four claim tables it reads — a QA
  * failure there `stop()`s the whole script
  * (master_mcaid_analytic.R:355-358), killing every later stage.
  *
  * Re-expression:
  *  - [[StageDef]] carries a table, its IN-CHAIN parents (the csv rows
  *    restricted to tables the chain itself builds — external inputs
  *    like stage.mcaid_elig and the ref tables are ambient), and the
  *    stage build as a function.
  *  - [[topoOrder]] is deterministic Kahn: among ready stages, always
  *    the earliest-DECLARED one. Stages are declared in the csv's
  *    physical row order (alphabetical — NOT a valid execution order),
  *    so the sort is load-bearing, and the tie-break makes the
  *    resulting schedule a pure function of the declared rows.
  *  - [[run]] executes each stage in topo order: build → write the
  *    stage table → [[Qa.loadGate]] against the run's metadata log
  *    (the metadata.qa_mcaid analog; a fresh run-scoped log, so the
  *    gate has first-load semantics and the verdict is deterministic)
  *    → exact-duplicate check (the grain-distinctness QA every
  *    qa_stage battery opens with) → on pass, promote stage → final as
  *    a directory RENAME (the reference's sp_rename / alter_schema —
  *    a metadata move, not a rewrite) and re-count the final table
  *    (master_mcaid_analytic.R's rows_claim_stage == rows_claim_final
  *    check). A failed stage does not promote but the chain continues
  *    (the master script messages and moves on) — EXCEPT the hard
  *    gate: once a gated stage's gate fails, that stage and everything
  *    after it abort (the `stop()`).
  *
  * Output: one verdict frame — (stage_seq, table_name, item, pass,
  * observed, expected) with three rows per executed stage (load_gate,
  * distinct_rows, promote_rows) and one 'aborted' row per killed
  * stage.
  *
  * The reference's per-table qa_stage batteries (the full check lists
  * each stage runs) are pinned as their own catalog rows — q288/q289
  * (elig demo/timevar), q292-q295 (the four claim tables), q296-q300
  * (bh/moud/naloxone/preg/housing) — each with verbatim note
  * rendering. The runner's in-chain gate is deliberately the fused
  * count + grain-distinctness pair: the chain row pins ORDER and gate
  * SEMANTICS, the battery rows pin each battery's full content, and
  * composing all ten batteries into the chain would make the chain
  * row re-execute every build twice for no added coverage.
  *
  * Scale: every check is a distributed aggregate (count / distinct
  * count / anti-join-free re-count of the renamed final); only the
  * per-stage VERDICT reaches the driver (3 rows/stage). The promote is
  * a filesystem rename. The builds themselves are the audited catalog
  * builds (q61/q64/q66/q67/q68/q79/q80/q81/q83/q169) — the runner adds
  * one stage-table write each, which the reference also pays (its
  * stage loads are physical tables).
  */
object AnalyticPipeline {

  /** One chain stage: the table it builds, its in-chain parents
    * (table_dependencies.csv rows restricted to chain tables), and the
    * stage load. */
  case class StageDef(table: String, parents: Seq[String],
      build: (SparkSession, String) => DataFrame)

  /** Deterministic Kahn topological sort: repeatedly emit the
    * earliest-DECLARED stage whose in-chain parents have all been
    * emitted. Unknown parents (external inputs) are ignored; a cycle
    * throws. */
  def topoOrder(stages: Seq[StageDef]): Seq[StageDef] = {
    val known = stages.map(_.table).toSet
    val emitted = scala.collection.mutable.LinkedHashSet.empty[String]
    val out = scala.collection.mutable.ArrayBuffer.empty[StageDef]
    while (out.length < stages.length) {
      val next = stages.find(st => !emitted.contains(st.table) &&
        st.parents.forall(p => !known.contains(p) || emitted.contains(p)))
      next match {
        case Some(st) => emitted += st.table; out += st
        case None =>
          val stuck = stages.filterNot(st => emitted.contains(st.table))
            .map(_.table).mkString(", ")
          throw new IllegalArgumentException(
            s"dependency cycle among: $stuck")
      }
    }
    out.toSeq
  }

  /** The mcaid analytic chain, declared in table_dependencies.csv ROW
    * order (alphabetical by table — the csv's physical order, which is
    * not an execution order; [[topoOrder]] derives one). Parents are
    * the csv's in-chain rows: the claim tables carry
    * final.mcaid_elig_demo / final.mcaid_elig_timevar
    * (table_dependencies.csv:3-9 qa dependencies), claim_header
    * additionally the four claim tables it rolls up
    * (table_dependencies.csv stage,mcaid_claim_header rows), and
    * ccw/bh the header+icdcm(+pharm) frames load_ccw / load_bh read
    * (scripts_general/load_ccw.R, claim_bh.R). */
  def mcaidChain: Seq[StageDef] = Seq(
    StageDef("mcaid_claim_bh",
      Seq("mcaid_claim_header", "mcaid_claim_icdcm_header",
        "mcaid_claim_pharm"),
      graft.queries.PlrBhQueries.q83ClaimBh),
    StageDef("mcaid_claim_ccw",
      Seq("mcaid_claim_header", "mcaid_claim_icdcm_header"),
      graft.queries.BuildQueries.q61ConditionLoop),
    StageDef("mcaid_claim_header",
      Seq("mcaid_claim_line", "mcaid_claim_icdcm_header",
        "mcaid_claim_procedure", "mcaid_claim_pharm",
        "mcaid_elig_demo", "mcaid_elig_timevar"),
      graft.queries.BuildQueries.q66ClaimHeader),
    StageDef("mcaid_claim_icdcm_header",
      Seq("mcaid_elig_demo", "mcaid_elig_timevar"),
      graft.queries.NormalizeQueries.q79ClaimIcdcm),
    StageDef("mcaid_claim_line",
      Seq("mcaid_elig_demo", "mcaid_elig_timevar"),
      graft.queries.BuildQueries.q169McaidClaimStage),
    StageDef("mcaid_claim_pharm",
      Seq("mcaid_elig_demo", "mcaid_elig_timevar"),
      graft.queries.NormalizeQueries.q81ClaimPharm),
    StageDef("mcaid_claim_procedure",
      Seq("mcaid_elig_demo", "mcaid_elig_timevar"),
      graft.queries.NormalizeQueries.q80ClaimProcedure),
    StageDef("mcaid_elig_demo", Nil,
      graft.queries.BuildQueries.q67EligDemo),
    StageDef("mcaid_elig_month", Nil,
      graft.queries.BuildQueries.q68EligMonth),
    StageDef("mcaid_elig_timevar", Nil,
      graft.queries.BuildQueries.q64EligTimevar))

  /** The master script's hard gate: mcaid_claim_header aborts the
    * chain unless ALL FOUR claim tables passed QA
    * (master_mcaid_analytic.R:355-358 — `stop()` on any fail). */
  def mcaidHardGate: Map[String, Seq[String]] = Map(
    "mcaid_claim_header" -> Seq("mcaid_claim_line",
      "mcaid_claim_icdcm_header", "mcaid_claim_procedure",
      "mcaid_claim_pharm"))

  /** The COMBINED mcaid+mcare analytic chain
    * (db_loader/mcaid_mcare/master_mcaid_mcare_analytic.R:43-266 +
    * the csv's stage,mcaid_mcare_* rows): identity crosswalk first,
    * then the dual elig tables and the crosswalked claim tables, the
    * header over its rollups, CCW last. Same csv-alphabetical
    * declaration discipline; this master has NO hard gate (each
    * table section runs unconditionally), and its promote is
    * archive-then-rename (alter_schema final→archive, stage→final —
    * master_mcaid_mcare_analytic.R:232-237); the archive leg only
    * differs from [[run]]'s rename on a RE-run against an existing
    * final, which a single execution never sees. claim_provider
    * (Table 4) is a placeholder in the reference itself ("once
    * mcaid_claim_provider table exists") — absent here too. */
  def mcaidMcareChain: Seq[StageDef] = Seq(
    StageDef("mcaid_mcare_claim_ccw",
      Seq("mcaid_mcare_claim_header", "mcaid_mcare_claim_icdcm_header"),
      graft.queries.BuildQueries.q154McaidMcareCcw),
    StageDef("mcaid_mcare_claim_header",
      Seq("mcaid_mcare_claim_line", "mcaid_mcare_claim_icdcm_header",
        "mcaid_mcare_claim_procedure", "xwalk_apde_mcaid_mcare_pha"),
      graft.queries.BuildQueries.q105McaidMcareHeader),
    StageDef("mcaid_mcare_claim_icdcm_header",
      Seq("xwalk_apde_mcaid_mcare_pha"),
      graft.queries.BuildQueries.q140McaidMcareIcdcm),
    StageDef("mcaid_mcare_claim_line",
      Seq("xwalk_apde_mcaid_mcare_pha"),
      graft.queries.BuildQueries.q139McaidMcareLine),
    StageDef("mcaid_mcare_claim_procedure",
      Seq("xwalk_apde_mcaid_mcare_pha"),
      graft.queries.BuildQueries.q141McaidMcareProcedure),
    StageDef("mcaid_mcare_elig_demo",
      Seq("xwalk_apde_mcaid_mcare_pha"),
      graft.queries.BuildQueries.q119McaidMcareDemo),
    StageDef("mcaid_mcare_elig_timevar",
      Seq("xwalk_apde_mcaid_mcare_pha"),
      graft.queries.BuildQueries.q118McaidMcareTimevar),
    StageDef("xwalk_apde_mcaid_mcare_pha", Nil,
      graft.queries.BuildQueries.q155ApdeXwalk))

  /** Execute the chain. Returns the verdict frame (see object doc). */
  def run(s: SparkSession, dir: String, stages: Seq[StageDef],
      hardGate: Map[String, Seq[String]] = Map.empty): DataFrame = {
    val work = Files.createTempDirectory("graft_pipeline")
    val metaPath = work.resolve("qa_log").toString
    val failed = scala.collection.mutable.Set.empty[String]
    var aborted = false
    val rows = topoOrder(stages).zipWithIndex.flatMap { case (st, i) =>
      val seq = i + 1
      val gateBroken = hardGate.getOrElse(st.table, Nil).exists(failed)
      if (aborted || gateBroken) {
        // the reference stop(): this stage and everything after it die
        aborted = true
        failed += st.table
        Seq((seq, st.table, "aborted", 0, 0L, 0L))
      } else {
        // stage load: write the stage table, QA the WRITTEN table (the
        // reference QAs stage.<table> in the database, not the query).
        // The row count and the exact-duplicate check FUSE into one
        // aggregation (one scan, one partial-agg shuffle) — a separate
        // loadGate count plus a distinct().count() job would triple
        // the per-stage QA scans (the Qa.fusedTableChecks rule).
        val stageDir = work.resolve(s"stage_${st.table}")
        st.build(s, dir).write.parquet(stageDir.toString)
        val staged = s.read.parquet(stageDir.toString)
        val allCols = struct(staged.columns.map(col).toIndexedSeq: _*)
        val qaRow = staged.agg(count(lit(1)).as("n"),
          count_distinct(allCols).as("d")).head()
        val n = qaRow.getLong(0)
        val d = qaRow.getLong(1)
        val gate = Qa.loadGateCounted(s, n, st.table, metaPath)
        val pass = gate.pass && d == n && n > 0
        if (!pass) failed += st.table
        val finalN = if (pass) {
          // promote: the sp_rename / alter_schema metadata move
          val finalDir = work.resolve(s"final_${st.table}")
          Files.move(stageDir, finalDir)
          s.read.parquet(finalDir.toString).count()
        } else 0L
        Seq(
          (seq, st.table, "load_gate", if (gate.pass) 1 else 0, n,
            gate.expected),
          (seq, st.table, "distinct_rows", if (d == n) 1 else 0, d, n),
          (seq, st.table, "promote_rows", if (pass && finalN == n) 1 else 0,
            finalN, n))
      }
    }
    import s.implicits._
    rows.toDF("stage_seq", "table_name", "item", "pass", "observed",
      "expected")
  }
}
