package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("every declared query runs non-empty at sf0.001 and has an oracle") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    qs.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
    val missingOracle = qs.keySet -- SparkEntry.oracleSql.keySet
    assert(missingOracle.isEmpty, s"queries without oracle: $missingOracle")
  }

  test("entry flagship returns the 6 returnflag/linestatus groups") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 6)
    val cols = SparkEntry.entry(spark).columns
    assert(cols.contains("sum_qty") && cols.contains("count_order"))
  }

  test("q01 aggregates reconcile with raw scan") {
    val li = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
    val total = li.count()
    val sumCounts = graft.queries.Relational.q01PricingSummary(spark, sf)
      .agg(sum("count_order")).collect()(0).getLong(0)
    assert(sumCounts == total)
  }

  test("q13 set ops: result nations all have both customers and suppliers") {
    import spark.implicits._
    val got = graft.queries.Relational.q13NationSetOps(spark, sf)
      .as[Int].collect().toSet
    val cust = graft.sources.Tables.customer(spark, sf)
      .select($"c_nationkey").distinct().as[Int].collect().toSet
    val supp = graft.sources.Tables.supplier(spark, sf)
      .select($"s_nationkey").distinct().as[Int].collect().toSet
    assert(got.subsetOf(cust & supp))
  }

  test("q115 min-cost supplier: chosen offer is the true per-part minimum") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q115_min_cost_supplier")(spark, sf).collect()
    assert(rows.nonEmpty)
    // recompute each reported part's minimum unit price directly
    val mins = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_partkey"),
        round(lit(1e-9) + col("l_extendedprice") / col("l_quantity"), 4)
          .as("unit"))
      .groupBy(col("l_partkey")).agg(min(col("unit")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val pk = r.getAs[Long]("p_partkey")
      assert(math.abs(r.getAs[Double]("min_price") - mins(pk)) < 1e-9,
        s"part $pk: reported min is not the true minimum")
    }
    // one row per part, parts unique
    val parts = rows.map(_.getAs[Long]("p_partkey"))
    assert(parts.distinct.length == parts.length)
  }
}
