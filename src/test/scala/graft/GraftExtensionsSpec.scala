package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.ComposeExpr
import graft.plans.GraftExtensions

class GraftExtensionsSpec extends SparkSpec {

  test("extensions builder constructs and evaluates compose_tpl") {
    val (ident, info, builder) = GraftExtensions.composeTpl
    assert(ident.funcName == "compose_tpl")
    assert(info.getName == "compose_tpl")
    val expr = builder(Seq(
      Literal(UTF8String.fromString("{k}!"), org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.catalyst.expressions.CreateMap(Seq(
        Literal(UTF8String.fromString("k"), org.apache.spark.sql.types.StringType),
        Literal(UTF8String.fromString("v"), org.apache.spark.sql.types.StringType)))))
    assert(expr.isInstanceOf[ComposeExpr])
    assert(expr.eval(null).toString == "v!")
    intercept[IllegalArgumentException] { builder(Seq.empty) }
  }

  test("applying the extensions class injects without error") {
    // builder-time injection can't be observed on the already-running
    // shared session (extensions apply to new sessions only) and the
    // registry hookup is private[sql]; this verifies the injection call
    // path itself is sound
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }
}
