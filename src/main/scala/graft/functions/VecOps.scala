package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native vector arithmetic for the similarity pack.
  *
  * `dot_f64(a, b)` computes the strict left-to-right dot product of two
  * `array<double>` columns — the exact floating-point sequence of the
  * declarative form `aggregate(zip_with(a, b, *), 0.0, +)` (and of
  * DuckDB's `list_reduce`), so swapping it into an oracle-checked query
  * changes the plan, not the bits.
  *
  * Why an expression and not the fold: the fold builds an intermediate
  * zipped array per row and evaluates a chain of lambda nodes per
  * element; this is a single static call inside whole-stage codegen —
  * one tight loop over the unsafe array data, no per-row allocation.
  * On the 100 TB path the dot product is the innermost loop of every
  * ANN re-rank; it is the one place where expression overhead is paid
  * O(N·k·dim) times.
  */
object VecOps {
  /** Row-level kernel shared by interpreted eval and generated code.
    * Strict contract (documented divergence from the fold's null
    * propagation, which cannot occur on the embeddings surface): arrays
    * must be same-length and element-non-null, else this throws. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"dot_f64: length mismatch ($n vs ${b.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(s"dot_f64: null element at $i")
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Column form; requires [[register]] (or the extensions entry point)
    * to have installed `dot_f64` on the session. */
  def dotCol(a: Column, b: Column): Column = call_function("dot_f64", a, b)

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "dot_f64(a, b) takes 2 arguments")
    DotF64(exprs.head, exprs(1))
  }

  /** Register `dot_f64` on a session (idempotent). */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("dot_f64")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "dot_f64", builder, "built-in")
}

/** `dot_f64(array<double>, array<double>) -> double`; see [[VecOps]]. */
case class DotF64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"dot_f64 expects (array<double>, array<double>), got $other")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecOps.dot($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF64 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_f64"
}
