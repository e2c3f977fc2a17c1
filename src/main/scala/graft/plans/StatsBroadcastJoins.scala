package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualNullSafe, EqualTo, Expression, In, Literal, Or}
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
  * memory correctly.
  *
  * Selectivity (round 13): an EQUALITY predicate over a profiled column
  * scales the estimate by `SkewSafety / ndv(col)` — the uniform 1/ndv
  * estimate every CBO uses, padded 4× so a key up to 4× the average
  * frequency still fits the budget before the hint fires (a wrong
  * broadcast is an OOM; the padding is the skew insurance). Only
  * equality/IN over literals reduces the estimate — ranges, LIKEs and
  * udf predicates price at selectivity 1, and any side whose scan isn't
  * ONE profiled relation skips selectivity entirely. Compound
  * predicates use the standard independence assumption (AND multiplies,
  * OR adds capped at 1).
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

  /** Skew padding on the 1/ndv equality estimate: the hint fires only if
    * the side fits the budget even when the probed key is 4× the average
    * key's frequency. */
  private val SkewSafety = 4.0

  /** Measured size of a join side iff it is a narrow wrapper over ONE
    * profiled relation — Project/Filter/alias keep cardinality bounded
    * by the relation's rowcount, anything else (join, aggregate, union,
    * generate) changes cardinality in ways the relation's stats no
    * longer bound, so: None. Filters over a single profiled relation
    * scale the estimate by the NDV-based equality selectivity. */
  private def measuredBytes(p: LogicalPlan): Option[Long] =
    estimate(p).map(_._1)

  /** Per-side relation context for selectivity: the single profiled
    * relation's stats plus its OUTPUT attributes keyed by exprId —
    * filter columns resolve against the relation's own attributes, never
    * by name (ADVICE r13: a Project aliasing a different expression to a
    * profiled column's NAME would otherwise price the predicate against
    * the wrong NDV, an under-estimate that fires a broadcast that may
    * not fit). An attribute introduced above the relation has a fresh
    * exprId, misses the map, and prices at 1.0 — the safe direction. */
  private final case class RelCtx(stats: StatsStore.TableStats,
      colByExprId: Map[org.apache.spark.sql.catalyst.expressions.ExprId, String])

  /** (bytes, relation-context-if-single-relation). Selectivity only
    * applies when exactly one profiled relation backs the scan — a
    * multi-path union has no single NDV map to price equality against. */
  private def estimate(p: LogicalPlan): Option[(Long, Option[RelCtx])] = p match {
    case Project(_, c) => estimate(c)
    case SubqueryAlias(_, c) => estimate(c)
    case Filter(cond, c) => estimate(c).map { case (bytes, ctx) =>
      (ctx.map(x => math.max(1L,
          math.ceil(bytes * selectivity(cond, x)).toLong))
        .getOrElse(bytes), ctx)
    }
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        val paths = fs.location.rootPaths.map(_.toString)
        val stats = paths.flatMap(StatsStore.statsByPath.get)
        if (paths.nonEmpty && stats.size == paths.size)
          Some((stats.map(_.estBytes).sum,
            if (stats.size == 1)
              Some(RelCtx(stats.head,
                lr.output.map(a => a.exprId -> a.name).toMap))
            else None))
        else None
      case _ => None
    }
    case _ => None
  }

  /** Fraction of the relation's rows the predicate keeps, under the
    * standard CBO independence assumption. ONLY literal equality/IN over
    * attributes that resolve (by exprId) to the relation's own output
    * reduce the estimate (padded by [[SkewSafety]]); everything
    * unrecognized prices at 1.0 — the conservative direction, since an
    * over-estimate merely skips a broadcast while an under-estimate
    * builds one that may not fit. */
  private def selectivity(e: Expression, ctx: RelCtx): Double = e match {
    case And(l, r) => selectivity(l, ctx) * selectivity(r, ctx)
    case Or(l, r) => math.min(1.0, selectivity(l, ctx) + selectivity(r, ctx))
    case EqualTo(a: AttributeReference, _: Literal) => ndvSel(a, ctx)
    case EqualTo(_: Literal, a: AttributeReference) => ndvSel(a, ctx)
    case EqualNullSafe(a: AttributeReference, _: Literal) => ndvSel(a, ctx)
    case EqualNullSafe(_: Literal, a: AttributeReference) => ndvSel(a, ctx)
    case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      math.min(1.0, vs.size * ndvSel(a, ctx))
    case _ => 1.0
  }

  private def ndvSel(a: AttributeReference, ctx: RelCtx): Double =
    ctx.colByExprId.get(a.exprId)
      .flatMap(ctx.stats.ndv.get).filter(_ > 0)
      .map(n => math.min(1.0, SkewSafety / n)).getOrElse(1.0)
}
