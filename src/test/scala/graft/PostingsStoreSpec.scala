package graft

import org.apache.spark.sql.functions._

import graft.queries.{PostingsStore, SharedFrames}

/** Incremental maintenance of the on-disk postings family: index half
  * the corpus, APPEND the other half, and every consumer must answer
  * exactly as if the full corpus had been indexed in one shot — the
  * grow-the-corpus path a production index lives on (appends are
  * O(batch); only the df-capped compaction is O(postings)). */
class PostingsStoreSpec extends SparkSpec {

  test("materialize half + append half == materialize full, for every consumer") {
    val consumers = Seq("q29_ngram_jaccard", "q30_minhash_lsh",
      "q56_contamination", "q124_bloom_decontam",
      "q137_paragraph_dedup", "q152_boilerplate_removal",
      "q83_dup_spans")
    def rows(name: String): Set[Seq[Any]] =
      SparkEntry.queries(name)(spark, sf).collect().map(_.toSeq.map {
        case d: Double => math.rint(d * 1e6) / 1e6
        case x => x
      }.toSeq).toSet
    try {
      SharedFrames.invalidate(spark, sf)
      // ground truth: the session-memoized memory path over the full corpus
      val expected = consumers.map(n => n -> rows(n)).toMap
      val docs = graft.sources.Tables.documents(spark, sf)
      val firstHalf = docs.filter(col("doc_id") % 2 === 0)
      val secondHalf = docs.filter(col("doc_id") % 2 === 1)
      PostingsStore.materializeFrom(spark, sf, firstHalf)
      // sanity: the half-index really is half-sized before the append
      val half = spark.table(PostingsStore.tableName(sf, "sh"))
        .select(countDistinct(col("doc_id"))).head().getLong(0)
      PostingsStore.append(spark, sf, secondHalf)
      val full = spark.table(PostingsStore.tableName(sf, "sh"))
        .select(countDistinct(col("doc_id"))).head().getLong(0)
      assert(half < full && full == docs.count(),
        s"append did not grow the index: $half -> $full")
      // appended buckets keep the zero-Exchange per-doc contract
      import org.apache.spark.sql.execution.exchange.Exchange
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val perDoc = spark.table(PostingsStore.tableName(sf, "sh"))
        .groupBy(col("doc_id")).agg(count(lit(1)))
      assert(perDoc.queryExecution.executedPlan
        .collect { case e: Exchange => e }.isEmpty,
        "per-doc aggregation shuffled after append")
      // same contract on the ph-bucketed paragraph table (q137/q152's
      // canonical-instance and document-frequency aggregations)
      val perPh = spark.table(PostingsStore.tableName(sf, "para"))
        .groupBy(col("ph")).agg(count(lit(1)))
      assert(perPh.queryExecution.executedPlan
        .collect { case e: Exchange => e }.isEmpty,
        "per-paragraph aggregation shuffled after append")
      // and on the h-bucketed positional index (q83's df aggregation)
      val perH = spark.table(PostingsStore.tableName(sf, "pos8"))
        .groupBy(col("h")).agg(count(lit(1)))
      assert(perH.queryExecution.executedPlan
        .collect { case e: Exchange => e }.isEmpty,
        "per-shingle aggregation over pos8 shuffled after append")
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      // THE equivalence: consumers over the incrementally-built store
      consumers.foreach { n =>
        assert(rows(n) == expected(n),
          s"$n diverged on the incrementally-built index")
      }
    } finally {
      PostingsStore.drop(spark, sf)
      SharedFrames.invalidate(spark, sf)
    }
  }

  test("materialize succeeds over a dead JVM's stale warehouse directories") {
    // regression (round-13 bench failure): drop() used to issue only
    // catalog DROP TABLE — a no-op in a fresh in-memory-catalog JVM —
    // so managed-table directories left behind by a crashed/unclean
    // prior run killed the next materialize at its FIRST saveAsTable
    // with LOCATION_ALREADY_EXISTS. drop() now deletes the managed
    // locations via Hadoop FS, so a build starts clean from any
    // warehouse state. This spec simulates the cross-JVM case the
    // single-JVM suite could never see: a directory at the managed
    // location with data files and NO catalog entry.
    val docs = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") % 4 === 0)
    val staleLoc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(
          PostingsStore.tableName(sf, "sh"))))
    val fs = staleLoc.getFileSystem(spark.sessionState.newHadoopConf())
    try {
      fs.mkdirs(staleLoc)
      val junk = new org.apache.hadoop.fs.Path(staleLoc, "part-stale.parquet")
      val out = fs.create(junk)
      out.write(Array[Byte](1, 2, 3)); out.close()
      assert(!spark.catalog.tableExists(PostingsStore.tableName(sf, "sh")),
        "fixture broken: the stale dir must have no catalog entry")
      PostingsStore.materializeFrom(spark, sf, docs) // must not throw
      assert(PostingsStore.lookup(spark, sf, "sh").get.count() > 0)
      assert(!fs.exists(junk), "stale junk file survived the rebuild")
    } finally {
      PostingsStore.drop(spark, sf)
      SharedFrames.invalidate(spark, sf)
      // drop() must leave no directory behind either — the property the
      // NEXT JVM depends on
      assert(!fs.exists(staleLoc), "drop left the managed location on disk")
    }
  }

  test("append precondition failure leaves a healthy store untouched") {
    // the round-12 ADVICE fix: append's require() used to sit INSIDE the
    // drop-on-failure region, so calling it from a session not in
    // bucketed mode (the default after any restart) deleted all the
    // bucketed tables — the guard destroyed the store it guarded. Now
    // the precondition throws BEFORE the all-or-nothing region.
    val docs = graft.sources.Tables.documents(spark, sf)
    try {
      PostingsStore.materializeFrom(spark, sf,
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0))
      // simulate the restart: mode reset to memory, store still on disk
      spark.conf.set(PostingsStore.ModeConf, "memory")
      intercept[IllegalArgumentException] {
        PostingsStore.append(spark, sf,
          docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 1))
      }
      PostingsStore.Keys.foreach { k =>
        assert(spark.catalog.tableExists(PostingsStore.tableName(sf, k)),
          s"precondition failure dropped the $k table")
      }
      // and the store still serves once the mode is restored
      spark.conf.set(PostingsStore.ModeConf, "bucketed")
      assert(PostingsStore.lookup(spark, sf, "sh").get.count() > 0)
    } finally {
      PostingsStore.drop(spark, sf)
      SharedFrames.invalidate(spark, sf)
    }
  }
}
