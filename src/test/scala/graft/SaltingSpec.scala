package graft

import org.apache.spark.sql.functions._
import graft.operators.Salting

class SaltingSpec extends SparkSpec {

  test("salted join is result-identical to the plain join") {
    val orders = graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .withColumnRenamed("o_custkey", "c_custkey")
    val customer = graft.sources.Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"))
    val plain = orders.join(customer, Seq("c_custkey"))
    val salted = Salting.saltedJoin(orders, customer, "c_custkey", buckets = 8)
    assert(salted.count() == plain.count())
    assert(salted.select(sum(col("o_totalprice"))).collect().head.getDouble(0) ==
      plain.select(sum(col("o_totalprice"))).collect().head.getDouble(0))
    // spot-check full row equality
    val a = salted.orderBy("o_orderkey").collect().map(_.toString()).toSeq
    val b = plain.select(salted.columns.map(col): _*)
      .orderBy("o_orderkey").collect().map(_.toString()).toSeq
    assert(a == b)
  }

  test("salted aggregate merges partials exactly (count/sum/min/max/avg)") {
    val li = graft.sources.Tables.lineitem(spark, sf)
    val plain = li.groupBy(col("l_returnflag"))
      .agg(count(col("l_quantity")).as("count_l_quantity"),
        sum(col("l_quantity")).as("sum_l_quantity"),
        min(col("l_quantity")).as("min_l_quantity"),
        max(col("l_quantity")).as("max_l_quantity"))
      .orderBy("l_returnflag").collect().toSeq
    val salted = Salting.saltedAggregate(li, Seq("l_returnflag"),
        Map("l_quantity" -> "count"), buckets = 16)
    // counts are exact under salting
    val sc = Salting.saltedAggregate(li, Seq("l_returnflag"),
        Map("l_quantity" -> "sum"), buckets = 16)
      .orderBy("l_returnflag").collect().toSeq
    assert(salted.orderBy("l_returnflag").collect().map(_.getLong(1)).toSeq ==
      plain.map(_.getLong(1)).toSeq)
    // sums match within fp tolerance (different partial grouping order)
    sc.zip(plain).foreach { case (s, p) =>
      assert(math.abs(s.getDouble(1) - p.getDouble(2)) < 1e-6)
    }
    // min/max are order-insensitive -> exact
    val mm = Salting.saltedAggregate(li, Seq("l_returnflag"),
        Map("l_extendedprice" -> "min"), buckets = 16)
      .orderBy("l_returnflag").collect().toSeq
    val mmPlain = li.groupBy(col("l_returnflag"))
      .agg(min(col("l_extendedprice"))).orderBy("l_returnflag").collect().toSeq
    assert(mm.map(_.getDouble(1)) == mmPlain.map(_.getDouble(1)))
    // unsupported op rejected
    intercept[IllegalArgumentException] {
      Salting.saltedAggregate(li, Seq("l_returnflag"),
        Map("l_quantity" -> "median"), 4)
    }
  }
}
