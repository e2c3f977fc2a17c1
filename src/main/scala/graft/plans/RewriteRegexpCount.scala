package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Literal, RegExpExtractAll, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

import graft.functions.RxCountExpr

/** Optimizer rule: recognize the match-COUNT idiom
  *
  * {{{ size(regexp_extract_all(s, p, 0)) }}}
  *
  * (which Spark's own `regexp_count` runtime-replaces to as well) and
  * substitute the allocation-free counting kernel
  * [[graft.functions.RxCountExpr]]. The rewrite is semantics-preserving
  * by construction — same `java.util.regex` matcher walk — and fires
  * only for group index 0 with modern null semantics
  * (`legacySizeOfNull=false`, i.e. null in → null out on both sides);
  * a non-zero group index keeps Spark's group-count validation behavior,
  * so it is left alone.
  */
object RewriteRegexpCount extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(RegExpExtractAll(subject, regexp, Literal(0, IntegerType)), false) =>
        RxCountExpr(subject, regexp)
    }
}
