package graft

import org.apache.spark.sql.catalyst.expressions.{Alias, ExprId, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LocalLimit, LocalRelation, LogicalPlan, OneRowRelation, Project, Window => LWindow}

/** The no-global-window gate's plan analysis, factored out of ContractSpec so
  * the negative case — the round-10 constant-partition evasion — stays pinned
  * by its own fixture test alongside the registry-wide sweep.
  *
  * "Constant" is TRACED, not just foldable: outputs of global (or
  * constant-grouped) aggregates, and aliases computed only from those, are
  * constant partition keys — the `crossJoin(broadcast(agg))` fingerprint that
  * smuggled a single-task user-grain sort past the foldable-only check.
  */
object WindowGate {

  def constAttrs(plan: LogicalPlan): Set[ExprId] = {
    var consts = Set.empty[ExprId]
    def isConst(e: Expression): Boolean =
      e.foldable || (e.references.nonEmpty &&
        e.references.forall(a => consts.contains(a.exprId)))
    plan.foreachUp {
      case a: Aggregate if a.groupingExpressions.forall(isConst) =>
        consts ++= a.aggregateExpressions.map(_.exprId)
      case p: Project =>
        p.projectList.foreach {
          case al: Alias if isConst(al.child) => consts += al.exprId
          case _ => ()
        }
      case _ => ()
    }
    consts
  }

  /** Windows whose every partition expression is foldable or constant-traced
    * — the all-input-to-one-task shape unless the input is bounded.
    */
  def flaggedWindows(plan: LogicalPlan): Seq[LWindow] = {
    val consts = constAttrs(plan)
    def constSpec(e: Expression): Boolean =
      e.foldable || e.references.forall(a => consts.contains(a.exprId))
    plan.collect {
      case w: LWindow if w.partitionSpec.forall(constSpec) => w
    }
  }

  def hasLimit(p: LogicalPlan): Boolean = p.collectFirst {
    case _: GlobalLimit | _: LocalLimit | _: LocalRelation | _: OneRowRelation => ()
  }.nonEmpty

  /** Flagged windows with no Limit bound — the ones that must prove their
    * input is a bounded model via the cross-SF scale-invariance check.
    */
  def unboundedFlagged(plan: LogicalPlan): Seq[LWindow] =
    flaggedWindows(plan).filterNot(w => hasLimit(w.child))
}
