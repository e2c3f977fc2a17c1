package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Hive-partitioned parquet layout — the partition-pruning counterpart
  * of [[Bucketing]] (which buys shuffle-free joins): laying data out by
  * a low-cardinality predicate column means a filter on that column
  * becomes a DIRECTORY listing decision, before any file is opened. At
  * 100 TB, `lang=en/` vs a full scan is the difference between touching
  * 1/26th of the corpus and all of it; combined with a sort column the
  * parquet min/max row-group stats prune within files too.
  */
object Layout {

  /** Write `df` partitioned by `partitionCols`. The repartition on the
    * partition columns routes every output directory's rows to one task
    * (no N-tasks × M-dirs small-file explosion); `sortCols` cluster rows
    * inside each file so row-group min/max stats are selective. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       sortCols: Seq[String] = Nil): Unit = {
    val routed = df.repartition(partitionCols.map(col): _*)
    val sorted =
      if (sortCols.isEmpty) routed
      else routed.sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
    sorted.write
      .partitionBy(partitionCols: _*)
      .mode(SaveMode.Overwrite)
      .parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
