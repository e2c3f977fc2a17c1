package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed accessors for the fixture star schema (TESTDATA.md).
  *
  * All reads are plain parquet scans: Catalyst pushes filters and prunes
  * columns into the scan, so callers should express selection declaratively
  * rather than pre-trimming here. At 100 TB these would be partitioned
  * directories; the API stays identical.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** `events` carries parquet TIMESTAMP(NANOS); Spark reads it as a raw
    * int64 under `spark.sql.legacy.parquet.nanosAsLong=true`. We keep the
    * raw nanos as `ts_ns` (lossless, used for gap arithmetic) and derive a
    * micro-precision `ts` timestamp (what DuckDB's CAST(ts AS TIMESTAMP)
    * yields, floor division — values are all post-1970).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }
}
