package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the sketch/graph/time-series pack (q78-q82) —
  * properties the DuckDB oracle can't see because both engines could get
  * them wrong the same way. */
class AnalyticsOpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q78 HLL estimate is within the m=64 error envelope of the exact count") {
    val r = run("q78_hll_sketch").collect().head
    val est = r.getAs[Double]("est")
    val exact = r.getAs[Long]("exact_cnt")
    assert(r.getAs[Long]("n_regs") <= 64)
    // 1.04/sqrt(64) = 13% standard error; 4 sigma is a generous, stable bound
    assert(math.abs(est - exact) / exact < 0.52,
      s"HLL estimate $est vs exact $exact outside the error envelope")
  }

  test("q79 compaction: one surviving state per user, tombstones shadow") {
    val ev = graft.sources.Tables.events(spark, sf)
    val total = ev.select(col("user_id")).distinct().count()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_ns").desc, col("event_id").desc)
    val tombstoned = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("event_type") === "error")
      .count()
    val out = run("q79_changelog_compact")
      .agg(sum(col("n_users"))).collect().head.getLong(0)
    assert(out == total - tombstoned,
      s"survivors $out != $total users - $tombstoned tombstoned")
  }

  test("q81 PageRank mass is conserved across the three iterations") {
    val ranks = run("q81_pagerank").collect()
    assert(ranks.length == 25)
    val mass = ranks.map(_.getAs[Double]("pr")).sum
    // dense trade graph -> no dangling leakage beyond rounding
    assert(math.abs(mass - 1.0) < 1e-3, s"rank mass $mass drifted from 1")
  }

  test("q80 SemDeDup partitions the corpus and removals never exceed members") {
    val rows = run("q80_semdedup").collect()
    val members = rows.map(_.getAs[Long]("n_members")).sum
    val total = graft.sources.Tables.embeddings(spark, sf).count()
    assert(members == total, "cluster assignment must partition the corpus")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_removed") < r.getAs[Long]("n_members"),
        "a cluster may never remove all of its members (lowest id survives)")
    }
  }

  test("q84 sketch error is bounded by one bin width") {
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_extendedprice").as("x"))
    val Array(mn, mx) = li.agg(min(col("x")), max(col("x"))).collect()
      .head.toSeq.map(_.asInstanceOf[Double]).toArray
    val width = (mx - mn) / 256.0
    run("q84_quantile_sketch").collect().foreach { r =>
      assert(r.getAs[Double]("abs_err") <= width + 1e-6,
        s"sketch error ${r.getAs[Double]("abs_err")} exceeds bin width $width " +
          s"at q=${r.getAs[Double]("q")}")
    }
  }

  test("q83 reported spans equal the true longest common token substring") {
    val rows = run("q83_dup_spans").collect()
    assert(rows.nonEmpty, "fixture surfaces no duplicated spans")
    val need = rows.take(5).flatMap(r =>
      Seq(r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet
    val texts = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id").isInCollection(need))
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
      .toMap
    def lcs(a: Array[String], b: Array[String]): Int = {
      var best = 0
      val dp = Array.fill(b.length + 1)(0)
      for (i <- 1 to a.length) {
        var diagPrev = 0 // dp(i-1)(j-1) before overwrite
        for (j <- 1 to b.length) {
          val tmp = dp(j)
          dp(j) = if (a(i - 1) == b(j - 1)) diagPrev + 1 else 0
          best = math.max(best, dp(j))
          diagPrev = tmp
        }
      }
      best
    }
    rows.take(5).foreach { r =>
      val (da, db) = (r.getAs[Long]("da"), r.getAs[Long]("db"))
      val truth = lcs(texts(da), texts(db))
      assert(r.getAs[Long]("max_span") == truth.toLong,
        s"pair ($da,$db): reported ${r.getAs[Long]("max_span")}, true LCS $truth")
    }
  }

  test("q82 gap-fill emits a dense 72-hour grid per user with correct gap flags") {
    val out = run("q82_gap_fill").persist()
    val perUser = out.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .select(col("n")).distinct().collect()
    assert(perUser.map(_.getLong(0)).toSeq == Seq(72L), "grid is not dense")
    // observed cells carry a value; a gap is null only before the first obs
    assert(out.filter(col("is_gap") === 0 && col("value").isNull).count() == 0)
    val badNull = out
      .withColumn("seen", sum(lit(1) - col("is_gap")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
          .orderBy(col("hour_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .filter(col("value").isNull && col("seen") > 0)
      .count()
    out.unpersist()
    assert(badNull == 0, "null after first observation — forward fill broken")
  }
}
