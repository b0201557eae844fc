package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, HintInfo, Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Custom optimizer `Rule[LogicalPlan]` exemplar (SURVEY.md §4.3): the
  * engine knows its registry's dimension tables (region/nation/supplier)
  * are small, so any un-hinted join against one gets a BROADCAST hint —
  * catalog knowledge Catalyst's size-estimate threshold can't always see
  * (e.g. after selective filters, or when the threshold is tuned down for
  * a 100 TB fact workload). Attach via
  * `spark.experimental.extraOptimizations :+= DimBroadcastRule` or the
  * `GraftExtensions` session-extension hook.
  *
  * The rule only adds a planner hint — results are provably unchanged;
  * RuleSpec asserts the physical-plan flip (SortMergeJoin →
  * BroadcastHashJoin) with the auto-broadcast threshold disabled.
  */
object DimBroadcastRule extends Rule[LogicalPlan] {

  // leading separator: a bare endsWith("region.parquet") would also match
  // a user table named ".../myregion.parquet" and pin a spurious broadcast
  // hint on an arbitrarily large relation — the one failure mode a
  // hint-only rule must never have
  private val smallDimFiles =
    Seq("/region.parquet", "/nation.parquet", "/supplier.parquet")

  /** True when the subtree bottoms out in exactly one scan of a known
    * small dimension file (filters/projections above it are fine).
    */
  private def isSmallDimScan(p: LogicalPlan): Boolean =
    p.collectLeaves() match {
      case Seq(lr: LogicalRelation) =>
        lr.relation match {
          case fs: HadoopFsRelation =>
            // nonEmpty: forall on a pathless location is vacuously true
            fs.location.rootPaths.nonEmpty &&
              fs.location.rootPaths.forall(path =>
                smallDimFiles.exists(path.toString.endsWith))
          case _ => false
        }
      case _ => false
    }

  private val broadcastHint = Some(HintInfo(strategy = Some(BROADCAST)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, _, _, JoinHint(None, None)) if isSmallDimScan(r) =>
      j.copy(hint = JoinHint(None, broadcastHint))
    case j @ Join(l, r, _, _, JoinHint(None, None)) if isSmallDimScan(l) =>
      j.copy(hint = JoinHint(broadcastHint, None))
  }
}
