package graft.functions

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import scala.util.matching.Regex

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** trollsift-style template composition (reference: `compose` filling
  * `{platform_name}_{start_time:%Y%m%d_%H%M}` patterns from row attrs,
  * used at plugins/__init__.py:211-212, 528, 534).
  *
  * `{key}` substitutes verbatim; `{key:%FMT}` parses the value as an ISO
  * instant and renders it with strftime-style codes. Missing keys raise —
  * same contract as Python's str.format.
  */
object Compose {
  private val Placeholder: Regex = """\{([A-Za-z0-9_]+)(?::([^}]+))?\}""".r

  /** Driver-side / plain-Scala compose (used by the pipeline plugins). */
  def compose(pattern: String, values: Map[String, String]): String =
    Placeholder.replaceAllIn(pattern, m => {
      val v = values.getOrElse(m.group(1),
        throw new IllegalArgumentException(s"compose: missing key ${m.group(1)}"))
      val out = Option(m.group(2)) match {
        case Some(fmt) if fmt.startsWith("%") =>
          DateTimeFormatter.ofPattern(strftimeToJava(fmt)).format(
            Instant.parse(v).atZone(ZoneOffset.UTC))
        case _ => v
      }
      Regex.quoteReplacement(out)
    })

  private def strftimeToJava(fmt: String): String =
    fmt.replace("%Y", "yyyy").replace("%m", "MM").replace("%d", "dd")
      .replace("%H", "HH").replace("%M", "mm").replace("%S", "ss").replace("%j", "DDD")

  /** Row-level entry point invoked from both interpreted eval and the
    * generated code — a single static call, so the expression stays inside
    * whole-stage codegen (no per-row closure/UDF dispatch). */
  def composeRow(pattern: UTF8String, map: MapData): UTF8String = {
    val n = map.numElements()
    val keys = map.keyArray()
    val vals = map.valueArray()
    var m = Map.empty[String, String]
    var i = 0
    while (i < n) {
      m += keys.getUTF8String(i).toString ->
        (if (vals.isNullAt(i)) null else vals.getUTF8String(i).toString)
      i += 1
    }
    UTF8String.fromString(compose(pattern.toString, m))
  }

  /** Register `compose_tpl(pattern, map<string,string>)` on a session so it
    * is usable from SQL and `expr(...)`. */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("compose_tpl")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "compose_tpl",
      exprs => {
        require(exprs.length == 2, "compose_tpl(pattern, map) takes 2 arguments")
        ComposeExpr(exprs.head, exprs(1))
      },
      "built-in")
}

/** Native Catalyst expression for [[Compose.compose]] over a
  * `map<string,string>` column (SURVEY §7.3's custom-expression slot: a
  * codegen'd expression beats a Scala UDF — no serialization of closures,
  * null handling for free, participates in whole-stage codegen). */
case class ComposeExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (left.dataType, right.dataType) match {
      case (StringType, MapType(StringType, StringType, _)) => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"compose_tpl expects (string, map<string,string>), got $other")
    }
  }

  override protected def nullSafeEval(pattern: Any, map: Any): Any =
    Compose.composeRow(pattern.asInstanceOf[UTF8String], map.asInstanceOf[MapData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, m) =>
      s"${ev.value} = graft.functions.Compose.composeRow($p, $m);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ComposeExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "compose_tpl"
}
