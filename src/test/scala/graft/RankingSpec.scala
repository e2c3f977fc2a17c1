package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Ranking

class RankingSpec extends SparkSpec {

  test("two-phase global rank is bit-identical to the naive global window") {
    val d = graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"))
    val naive = d.withColumn("rk",
      row_number().over(Window.orderBy(col("o_totalprice"), col("o_orderkey")))
        .cast("long"))
    // integer price bucket: order-aligned with the sort key
    val twoPhase = Ranking.globalRank(d,
      floor(col("o_totalprice") / 10000).cast("int"),
      Seq(col("o_totalprice"), col("o_orderkey")))
    assert(naive.exceptAll(twoPhase).count() == 0 &&
      twoPhase.exceptAll(naive).count() == 0)
    assert(twoPhase.count() == d.count())
  }

  test("string-prefix blocks work and ranks are a 1..n permutation") {
    val d = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val ranked = Ranking.globalRank(d, substring(col("text"), 1, 1),
      Seq(col("text"), col("doc_id")))
    val n = d.count()
    val rks = ranked.select("rk").collect().map(_.getLong(0)).sorted
    assert(rks.toSeq == (1L to n).toSeq, "ranks are not a dense 1..n range")
  }

  test("no corpus-wide window: every window partitions by the block") {
    val d = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val plan = Ranking.globalRank(d, substring(col("text"), 1, 1),
      Seq(col("text"), col("doc_id")))
      .queryExecution.executedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.contains("__rk_b"),
      s"corpus-wide window crept in: $w"))
  }
}
