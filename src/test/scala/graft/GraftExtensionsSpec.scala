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

  test("md5-h32 idiom rewrites to the native kernel and stays bit-identical") {
    import org.apache.spark.sql.functions._
    // the portable declarative fingerprint, exactly as the oracles write it
    val decl = conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long")
    val df = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), decl.as("h"))
    // GraftSession installed RewriteMd5H32 on this session: the physical
    // plan must carry the fused kernel, not the conv/substring chain
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("h32_md5"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("conv("), s"declarative chain survived:\n$plan")
    // and the rewritten result is bit-identical to the explicit kernel
    val native = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), graft.functions.TextFns.h32(col("text")).as("h"))
    assert(df.exceptAll(native).count() == 0 &&
      native.exceptAll(df).count() == 0)
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
