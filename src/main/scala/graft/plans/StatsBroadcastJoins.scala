package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Filter, HintInfo, Join, JoinHint, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Stats-driven join strategy: hint BROADCAST from MEASURED table stats
  * instead of the static `autoBroadcastJoinThreshold` file-size
  * heuristic.
  *
  * For every join side that is a bare scan (modulo Project/Filter/alias)
  * of a relation profiled by [[StatsStore.analyze]], compare the
  * measured in-memory estimate (rows × measured row width) against the
  * budget (`spark.graft.statsBroadcastThreshold`, default 10 MiB) and
  * set the side's broadcast hint when it fits. Catalyst's JoinSelection
  * then plans a BroadcastHashJoin exactly as it would for a user
  * `broadcast()` call — the rule changes WHERE the size knowledge comes
  * from, not how the join executes.
  *
  * Why this beats the static threshold at 100 TB: the built-in
  * heuristic prices a scan at its FILE size, and compressed parquet
  * under-reports the hashed-relation memory a broadcast build actually
  * allocates (2–5× is routine — an executor-OOM class of mistake).
  * Measured rowcount × measured width — refreshed by ANALYZE, the
  * discipline every warehouse CBO imposes — prices the build side's
  * memory correctly. Deliberately NOT addressed: a selective filter
  * still prices at the unfiltered relation (the rule has no
  * selectivity model and a wrong broadcast is an OOM, so it stays
  * conservative in that direction — the per-column NDV the store
  * collects is the raw material for an equality-predicate selectivity
  * estimate if that trade ever flips).
  *
  * Safety: opt-in per session (`spark.graft.statsBroadcast=true`),
  * conservative by construction — a side with ANY un-profiled leaf, a
  * join/aggregate below it (cardinality no longer the relation's), or
  * an existing user hint is left untouched. Stale stats are the
  * operator's contract, same as ANALYZE TABLE anywhere else. */
object StatsBroadcastJoins extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(StatsStore.EnabledConf, "false").toBoolean) plan
    else {
      val budget = conf.getConfString(StatsStore.ThresholdConf,
        (10L * 1024 * 1024).toString).toLong
      plan.transformUp {
        case j: Join =>
          def hintOf(existing: Option[HintInfo],
              side: LogicalPlan): Option[HintInfo] =
            existing.orElse {
              if (measuredBytes(side).exists(_ <= budget))
                Some(HintInfo(strategy = Some(BROADCAST)))
              else None
            }
          val lh = hintOf(j.hint.leftHint, j.left)
          val rh = hintOf(j.hint.rightHint, j.right)
          if (lh == j.hint.leftHint && rh == j.hint.rightHint) j
          else j.copy(hint = JoinHint(lh, rh))
      }
    }
  }

  /** Measured size of a join side iff it is a narrow wrapper over ONE
    * profiled relation — Project/Filter/alias keep cardinality bounded
    * by the relation's rowcount (a filter only shrinks it), anything
    * else (join, aggregate, union, generate) changes cardinality in
    * ways the relation's stats no longer bound, so: None. */
  private def measuredBytes(p: LogicalPlan): Option[Long] = p match {
    case Project(_, c) => measuredBytes(c)
    case Filter(_, c) => measuredBytes(c)
    case SubqueryAlias(_, c) => measuredBytes(c)
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        val paths = fs.location.rootPaths.map(_.toString)
        val stats = paths.flatMap(StatsStore.statsByPath.get)
        if (paths.nonEmpty && stats.size == paths.size)
          Some(stats.map(_.estBytes).sum)
        else None
      case _ => None
    }
    case _ => None
  }
}
