package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.operators.Layout

class LayoutSpec extends SparkSpec {

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get

  test("partition layout: lang filter prunes directories, not just rows") {
    val dir = Files.createTempDirectory("graft_layout").toString
    val docs = graft.sources.Tables.documents(spark, sf)
    Layout.writePartitioned(docs, dir, Seq("lang"), sortCols = Seq("doc_id"))

    val all = Layout.read(spark, dir)
    val one = all.filter(col("lang") === "en")
    // correctness: same rows as filtering the unpartitioned source
    assert(one.count() == docs.filter(col("lang") === "en").count())
    // the filter shows up as a partition filter on the scan...
    val scan = scanOf(one)
    assert(scan.partitionFilters.exists(_.toString.contains("lang")))
    // ...and the scan touches a strict subset of the files
    val langs = docs.select(col("lang")).distinct().count()
    assert(langs > 1)
    assert(scanOf(one).selectedPartitions.partitionCount == 1)
    assert(scanOf(all).selectedPartitions.partitionCount.toLong == langs)
  }

  test("non-partition predicate is pushed to parquet (row-group stats)") {
    val dir = Files.createTempDirectory("graft_layout2").toString
    val docs = graft.sources.Tables.documents(spark, sf)
    Layout.writePartitioned(docs, dir, Seq("lang"), sortCols = Seq("doc_id"))
    val q = Layout.read(spark, dir).filter(col("doc_id") < 10)
    val scan = scanOf(q)
    assert(scan.metadata("PushedFilters").contains("LessThan(doc_id,10)"))
    assert(q.count() == docs.filter(col("doc_id") < 10).count())
  }

  test("curated corpus materializes split-partitioned and prunes on read") {
    val dir = Files.createTempDirectory("graft_curated").toString
    val docs = graft.sources.Tables.documents(spark, sf)
    val curated = graft.queries.Curation.curatedDocs(spark, sf)
      .join(docs, Seq("doc_id"))
    Layout.writePartitioned(curated, dir, Seq("split"), sortCols = Seq("doc_id"))
    val back = Layout.read(spark, dir)
    // per-split counts match the q60 aggregate view
    val expected = graft.queries.Curation.q60CuratedCorpus(spark, sf)
      .select(col("split"), col("n_docs")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = back.groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // a training reader touching only train/ prunes to one directory
    val train = back.filter(col("split") === "train")
    assert(scanOf(train).selectedPartitions.partitionCount == 1)
  }
}
