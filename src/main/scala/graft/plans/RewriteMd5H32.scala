package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Expression, Literal, Md5, Substring}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, LongType, StringType}

import graft.functions.H32Md5

/** Optimizer rule: recognize the PORTABLE md5-h32 idiom
  *
  * {{{ conv(substring(md5(x), 1, 8), 16, 10) :: long }}}
  *
  * (the cross-engine fingerprint every oracle uses — see
  * [[graft.functions.TextFns.h32]]) and substitute the fused native
  * [[H32Md5]] kernel, which is numerically identical but skips the
  * 32-char hex materialization, the substring copy and the base-16
  * re-parse. With this rule installed (via
  * `spark.sql.extensions=graft.plans.GraftExtensions` or
  * [[graft.GraftSession.registerFunctions]]), a user can write the
  * portable declarative form — e.g. paste the DuckDB oracle's hash
  * expression — and still execute the native kernel: the optimization
  * is a plan property, not a library-call requirement.
  */
object RewriteMd5H32 extends Rule[LogicalPlan] {

  /** The string argument of `md5(x)` as analysis leaves it: either bare
    * (already binary-typed upstream of a string source is impossible for
    * this idiom) or wrapped in the implicit string→binary cast. */
  private def stringArg(e: Expression): Option[Expression] = e match {
    case Cast(s, BinaryType, _, _) if s.dataType == StringType => Some(s)
    case s if s.dataType == StringType => Some(s)
    case _ => None
  }

  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, _) => Some(v)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case cast @ Cast(conv: Conv, LongType, _, _) =>
        conv.children match {
          case Seq(Substring(Md5(m), IntLit(1), IntLit(8)),
              IntLit(16), IntLit(10)) =>
            stringArg(m).map(H32Md5(_): Expression).getOrElse(cast)
          case _ => cast
        }
    }
}
