package graft

import org.apache.spark.sql.functions._
import graft.functions.{Hll, TextFns}

class HllSpec extends SparkSpec {

  private def hashes = graft.sources.Tables.documents(spark, sf)
    .select(TextFns.h32(col("doc_id")).as("h"))

  test("estimate is invariant under partitioning (mergeable sketch)") {
    val one = hashes.repartition(1)
      .agg(Hll.approxDistinct(col("h"))).collect().head.getDouble(0)
    val many = hashes.repartition(13)
      .agg(Hll.approxDistinct(col("h"))).collect().head.getDouble(0)
    assert(one == many, s"partitioning changed the estimate: $one vs $many")
  }

  test("aggregator matches the declarative q78 register chain exactly") {
    val est = hashes.agg(Hll.approxDistinct(col("h"))).collect().head.getDouble(0)
    val regs = hashes
      .select(col("h").bitwiseAND(lit(63L)).as("bucket"),
        shiftright(col("h"), 6).as("w"))
      .withColumn("rho",
        when(col("w") === 0, lit(27)).otherwise(lit(27) - length(bin(col("w")))))
      .groupBy(col("bucket")).agg(max(col("rho")).as("reg"))
    val Array(nRegs, sPresent) = regs
      .agg(count(lit(1)).cast("double"), sum(pow(lit(2.0), -col("reg"))))
      .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
    val declarative = 0.709 * 4096.0 / (sPresent + (64 - nRegs))
    assert(est == declarative,
      s"aggregator $est != declarative $declarative (must be bit-equal)")
  }

  test("duplicates do not move the estimate") {
    val base = hashes.agg(Hll.approxDistinct(col("h"))).collect().head.getDouble(0)
    val dup = hashes.union(hashes).union(hashes)
      .agg(Hll.approxDistinct(col("h"))).collect().head.getDouble(0)
    assert(base == dup)
  }
}
