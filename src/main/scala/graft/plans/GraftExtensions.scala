package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Union, Window => LWindow}
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst extensions (SURVEY §4's two candidate rules), registered via
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => OrEqualityJoinRewrite)
    e.injectOptimizerRule(_ => GlobalWindowGuard)
  }
}

/** Rewrites an inner join whose condition is an OR of pure equality pairs
  * (the reference's telehealth proc x modifier join —
  * load_stage.mcaid_claim_header.R:296-309) into a UNION of equi-joins.
  *
  * Why: Catalyst can only plan an OR-condition join as a nested-loop join
  * — fine when one side broadcasts, catastrophic when both sides are big
  * (100 TB x ref-table-too-big-to-broadcast = per-row scans). Each rewritten
  * branch carries an equality, so it plans as a hash/sort-merge join and
  * shuffles on its key. Multiset semantics are preserved by conjoining each
  * branch with the NEGATION of all earlier disjuncts (a row matching two
  * disjuncts appears in exactly one branch), handling NULL semantics via
  * IsNull (NOT(NULL)=NULL would wrongly drop the row).
  *
  * Disable with spark.graft.rewriteOrJoins=false. */
object OrEqualityJoinRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.rewriteOrJoins", "true").toBoolean) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val disjuncts = splitOr(cond)
        if (disjuncts.length >= 2 && disjuncts.length <= 8 &&
            disjuncts.forall(isEquiPair(_, left, right))) {
          val branches = disjuncts.zipWithIndex.map { case (d, i) =>
            val notPrior: Seq[Expression] =
              disjuncts.take(i).map(p => Or(IsNull(p), Not(p)))
            val c = (d +: notPrior).reduce(And)
            Join(left, right, Inner, Some(c), hint)
          }
          Union(branches)
        } else j
    }

  private def splitOr(e: Expression): Seq[Expression] = e match {
    case Or(a, b) => splitOr(a) ++ splitOr(b)
    case other => Seq(other)
  }

  private def isEquiPair(e: Expression, l: LogicalPlan, r: LogicalPlan): Boolean =
    e match {
      case EqualTo(a, b) =>
        (a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)) ||
          (a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet))
      case _ => false
    }
}

/** Planner guard for the reference's one Spark-hostile idiom: global
  * DENSE_RANK/unpartitioned windows (SURVEY §4, §7.5.1). Default: warn.
  * With spark.graft.failOnGlobalWindow=true the query fails fast instead of
  * silently funneling all rows through one task. */
object GlobalWindowGuard extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan.foreach {
      case w: LWindow if w.partitionSpec.isEmpty =>
        if (conf.getConfString("spark.graft.failOnGlobalWindow", "false").toBoolean)
          throw new IllegalStateException(
            "graft: unpartitioned Window would funnel all rows through one " +
              "task; partition it or unset spark.graft.failOnGlobalWindow")
        else logWarning("graft: unpartitioned Window detected — " +
          "single-partition execution hazard at scale")
      case _ => ()
    }
    plan
  }
}
