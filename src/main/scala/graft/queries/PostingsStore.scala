package graft.queries

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast

import graft.operators.Bucketing

/** On-disk home of the shared postings/signature family — the cluster
  * face of [[SharedFrames]]' in-session memoization.
  *
  * The warm-bench contract SURVEY §6 describes ("the postings table is
  * written once and joined by every dedup query") has two
  * implementations with identical plans downstream:
  *
  *  - '''memory''' (default): [[SharedFrames]] persists the postings
  *    Dataset in the session cache. Right when the postings fit in
  *    cluster memory and the session is long-lived — and what the
  *    bench pack times.
  *  - '''bucketed''': [[materialize]] pays the build + shuffle ONCE by
  *    writing each family through [[graft.operators.Bucketing]] as a
  *    `doc_id`-bucketed, in-bucket-sorted warehouse table; every
  *    consumer's `shPostings`/`cappedShPostings`/`sh8Postings` call
  *    then reads the table straight off disk with
  *    `HashPartitioning(doc_id, n)` already satisfied by the scan —
  *    per-doc signature/count aggregations and doc_id co-bucketed
  *    joins run with ZERO Exchange on the postings side (pinned by
  *    PlanAuditSpec). This is the 100 TB path: postings for a 100 TB
  *    corpus don't fit in memory, but a bucketed table scan is
  *    exchange-free no matter how large it grows, and the one-time
  *    write amortizes over every downstream consumer exactly like the
  *    in-memory persist does within a session.
  *
  * Mode is per-session via `spark.graft.postingsStore` = `memory` |
  * `bucketed`; consumers are completely unaware (the builders in
  * [[Dedup]]/[[Curation]] consult [[lookup]] first). Bucket count is
  * the session's default parallelism — at 100 TB pick thousands
  * (see [[graft.operators.Bucketing]]'s rules of engagement).
  */
object PostingsStore {

  val ModeConf = "spark.graft.postingsStore"

  /** The family keys with an on-disk representation. `df`/`bands`/
    * `srcsh` stay session-derived: they are narrow single-pass
    * derivatives of these three and their own hot keys (`h`,
    * `(band, bh)`, `source`) are not the doc_id bucketing. */
  val Keys: Seq[String] = Seq("sh", "capped", "sh8")

  def bucketedMode(spark: SparkSession): Boolean =
    spark.conf.getOption(ModeConf).contains("bucketed")

  /** Stable warehouse table name per (data dir, family key): the dir
    * fingerprint keeps sf0.001 and sf0.1 stores from colliding in one
    * warehouse. */
  def tableName(dir: String, key: String): String = {
    val fp = MessageDigest.getInstance("MD5").digest(dir.getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
    s"graft_bkt_${key}_$fp"
  }

  /** The bucketed table for (dir, key), iff bucketed mode is on AND the
    * table exists — otherwise None and the caller falls back to the
    * [[SharedFrames]] memory path. */
  def lookup(spark: SparkSession, dir: String, key: String): Option[DataFrame] = {
    if (!bucketedMode(spark)) None
    else {
      val name = tableName(dir, key)
      if (spark.catalog.tableExists(name)) Some(spark.table(name)) else None
    }
  }

  /** Write the whole family for `dir` as bucketed tables and switch the
    * session to bucketed mode. Build order matters: `capped` is derived
    * FROM the just-written bucketed `sh` (its df-counts aggregation is
    * already exchange-free on the bucketed scan), so the raw
    * explode+md5 expansion runs exactly once per family. Existing
    * tables are dropped first and the session memo invalidated, so a
    * re-materialize never reads a table it is about to overwrite. */
  def materialize(spark: SparkSession, dir: String): Unit = {
    drop(spark, dir)
    spark.conf.set(ModeConf, "bucketed")
    val buckets = spark.sparkContext.defaultParallelism
    Bucketing.writeBucketed(
      Dedup.shPostingsPlan(spark, dir), tableName(dir, "sh"),
      "doc_id", buckets)
    // reads sh via lookup (bucketed) — the anti-join's broadcast side
    // (hot shingles over the df-counts) aggregates off the bucketed scan
    Bucketing.writeBucketed(
      Dedup.shPostings(spark, dir)
        .join(broadcast(Dedup.hotShingles(spark, dir)), Seq("h"), "left_anti"),
      tableName(dir, "capped"), "doc_id", buckets)
    Bucketing.writeBucketed(
      Curation.sh8PostingsPlan(spark, dir), tableName(dir, "sh8"),
      "doc_id", buckets)
  }

  /** Drop the family's tables and any session memo built over them;
    * resets the mode to memory. */
  def drop(spark: SparkSession, dir: String): Unit = {
    spark.conf.set(ModeConf, "memory")
    SharedFrames.invalidate(spark, dir)
    Keys.foreach(k => spark.sql(s"DROP TABLE IF EXISTS ${tableName(dir, k)}"))
  }
}
