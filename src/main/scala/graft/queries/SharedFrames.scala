package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** One Dataset object per (session, dir, key) for session-shared
  * intermediates — seven families as of round 12: the 3-gram and 8-gram
  * postings, the source-grain postings, the paragraph-instance table,
  * the positional 8-gram span index, the corpus-trained bigram LM, and
  * the BM25 inverted index. Without the
  * memo every call built a NEW Dataset over an identical plan and
  * re-`persist()`ed it; Spark's CacheManager plan-matches those into one
  * cache entry, but each re-registration raced recomputation of the same
  * cached partitions ("Block rdd_N already exists" churn all over the
  * round-7 bench tail). One object per key means one registration, zero
  * churn. Entries hold only logical plans; stale entries for stopped
  * test sessions are bytes.
  *
  * Warm-up contract: Bench and QTime call [[warmFor]] UNTIMED before
  * timing a consumer of a shared family, so pack and isolated numbers
  * both report warm-postings cost — the number that matters at scale,
  * where the postings/signature table is written once and joined many
  * times, not rebuilt inside every query.
  */
private[graft] object SharedFrames {
  private val memo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  /** Memoized, persisted frame. Re-arms after any
    * `cacheManager.clearCache()` (Bench/QTime drop all caches between
    * timed runs): persist() is lazy and idempotent here — storageLevel
    * reads NONE exactly when the cache entry is gone. */
  def cached(spark: SparkSession, dir: String, key: String)(
      build: => DataFrame): DataFrame = {
    val df = memo.getOrElseUpdate((spark, dir, key), build)
    if (df.storageLevel == StorageLevel.NONE) df.persist()
    df
  }

  /** Drop every memo entry for (session, dir) — required when the
    * underlying layout changes (e.g. [[PostingsStore.materialize]]/
    * [[PostingsStore.drop]] rewrites or removes the bucketed tables a
    * derived frame may have been built over). */
  def invalidate(spark: SparkSession, dir: String): Unit =
    memo.keys.filter(k => k._1 == spark && k._2 == dir).foreach { k =>
      memo.remove(k).foreach(df =>
        scala.util.Try(df.unpersist(blocking = false)))
    }

  /** Short qNN ids of every query that reads the 3-gram postings family
    * ([[Dedup.shPostings]] and derivatives, incl. [[Curation]]'s q98). */
  val consumers3: Set[String] =
    Set("q29", "q30", "q31", "q98", "q108", "q119", "q120", "q129", "q143")
  // NOT q121: winnowing builds its own 5-gram fingerprint selection and
  // never reads the 3-gram family — warming it there only added cache
  // pressure to q121's own timed run

  /** Short qNN ids of every query reading the 8-gram postings
    * ([[Curation.sh8Postings]]). */
  val consumers8: Set[String] = Set("q56", "q107", "q124", "q149")

  /** Queries reading the source-grain postings derived from the 3-gram
    * family ([[Dedup]]'s `srcsh`). */
  val consumersSrc: Set[String] = Set("q111")

  /** Queries reading the paragraph-instance table
    * ([[Dedup.paraInstances]] — paragraph dedup and boilerplate
    * removal share one CDC segmentation + hash pass). */
  val consumersPara: Set[String] = Set("q137", "q152")

  /** Queries reading the positional 8-gram span index
    * ([[Dedup]]'s `pos8`/`pos8c` — exact duplicated-span detection). */
  val consumersPos8: Set[String] = Set("q83")

  /** Queries scoring with the corpus-trained bigram LM
    * ([[TextAnalysis.lmModel]] — the pre-trained-artifact analogue:
    * trained once per corpus, loaded by every scorer). */
  val consumersLm: Set[String] = Set("q61", "q101")

  /** Queries scoring against the BM25 inverted index
    * ([[Search.bm25Index]] — the materialize-once search artifact). */
  val consumersBm25: Set[String] = Set("q46", "q132")

  /** Queries reading the tile-row raster layout
    * ([[TiledRaster.tiles]] — the write-once dask-chunk analog; timed
    * warm like every stored layout, no bucketed-table home). */
  val consumersTiles: Set[String] = Set("q164", "q165", "q166", "q167", "q168")

  /** Does `queryName` read any shared postings family? (The bench/QTime
    * harnesses insert an untimed GC breather after warming exactly these
    * — the warm's allocation debt must not land inside the timed run.) */
  def isConsumer(queryName: String): Boolean = {
    val id = queryName.takeWhile(_ != '_')
    consumers3(id) || consumers8(id) || consumersSrc(id) ||
    consumersPara(id) || consumersPos8(id) || consumersLm(id) ||
    consumersBm25(id) || consumersTiles(id)
  }

  /** Does `queryName` read a family with an ON-DISK layout home —
    * [[PostingsStore]]'s bucketed tables or [[TileStore]]'s parquet
    * tile store? Bench's "bucketed" section times exactly these — the
    * LM and BM25 consumers (q61/q101, q46/q132) have no on-disk home,
    * so timing them under that key would mislabel in-memory numbers as
    * disk-layout results. `consumersSrc` qualifies: the source-grain
    * postings derive FROM the bucketed `sh` scan in bucketed mode. */
  def isBucketedConsumer(queryName: String): Boolean = {
    val id = queryName.takeWhile(_ != '_')
    consumers3(id) || consumers8(id) || consumersSrc(id) ||
    consumersPara(id) || consumersPos8(id) || consumersTiles(id)
  }

  /** Materialize (untimed) whatever shared frames `queryName` reads — a
    * fast no-op when they are already warm, or when the query reads
    * none. */
  def warmFor(queryName: String, spark: SparkSession, dir: String): Unit = {
    val id = queryName.takeWhile(_ != '_')
    if (consumers3(id)) Dedup.warmShared(spark, dir)
    if (consumers8(id)) Curation.warmShared(spark, dir)
    if (consumersSrc(id)) Dedup.warmSrcShared(spark, dir)
    if (consumersPara(id)) Dedup.warmParaShared(spark, dir)
    if (consumersPos8(id)) Dedup.warmPos8Shared(spark, dir)
    if (consumersLm(id)) TextAnalysis.warmLmShared(spark, dir)
    if (consumersBm25(id)) Search.warmBm25Shared(spark, dir)
    if (consumersTiles(id)) TiledRaster.warmTilesShared(spark, dir)
  }
}
