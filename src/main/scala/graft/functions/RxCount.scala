package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native non-overlapping regex match COUNTER.
  *
  * `size(regexp_extract_all(s, p, 0))` — and Spark's own `regexp_count`,
  * which is runtime-replaced to exactly that — materializes an
  * ArrayData of every match string just to take its length. This kernel
  * runs the same `java.util.regex` find loop and counts, allocating
  * nothing per match. PII scans (q126) and any corpus-wide pattern audit
  * call this once per document per pattern — at 100 TB the avoided
  * per-match UTF8String allocations are pure win, and the semantics are
  * identical by construction (same Matcher, same non-overlapping
  * left-to-right walk, same zero-width advancement).
  *
  * [[graft.plans.RewriteRegexpCount]] rewrites the declarative form to
  * this kernel, so the optimization is a plan property: the portable
  * oracle-friendly spelling still executes natively.
  */
object RxCount {
  /** Compiled-pattern cache: regex compilation is ~µs and the pattern
    * set of a workload is tiny (plan literals), so a global concurrent
    * map keyed by pattern string is the right shape. Bounded as a
    * defense against adversarial per-row dynamic patterns — on
    * overflow the map is cleared, never grown without limit
    * ([[Pattern]] itself is immutable and thread-safe; matchers are
    * created per call). */
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Pattern]()
  private val MaxPatterns = 1024

  private def pattern(p: String): Pattern = {
    val hit = cache.get(p)
    if (hit != null) hit
    else {
      if (cache.size >= MaxPatterns) cache.clear()
      cache.computeIfAbsent(p, Pattern.compile(_))
    }
  }

  /** Row-level kernel shared by interpreted eval and generated code. */
  def count(s: UTF8String, regex: UTF8String): Int = {
    val m = pattern(regex.toString).matcher(s.toString)
    var n = 0
    while (m.find()) n += 1
    n
  }

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "rx_count(s, pattern) takes 2 arguments")
    RxCountExpr(exprs.head, exprs(1))
  }

  /** Register `rx_count` on a session (idempotent). */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("rx_count")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "rx_count", builder, "built-in")
}

/** `rx_count(string, pattern) -> int`; see [[RxCount]]. */
case class RxCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckSuccess
      case other => TypeCheckFailure(s"rx_count expects (string, string), got $other")
    }
  }

  override protected def nullSafeEval(s: Any, r: Any): Any =
    RxCount.count(s.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, r) => s"graft.functions.RxCount.count($s, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RxCountExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "rx_count"
}
