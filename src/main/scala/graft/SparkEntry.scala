package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are grouped into packs (one object per capability family); each
  * pack exposes `defs` (name -> (spark, sfDir) => DataFrame) and `oracles`
  * (name -> DuckDB SQL with identical column names/ordering).
  */
object SparkEntry {
  private val packs: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Relational.defs, Relational.oracles),
      (EventOps.defs, EventOps.oracles),
      (TextAnalysis.defs, TextAnalysis.oracles),
      (Dedup.defs, Dedup.oracles),
      (Similarity.defs, Similarity.oracles),
      (Media.defs, Media.oracles),
      (Trollflow.defs, Trollflow.oracles),
      (TiledRaster.defs, TiledRaster.oracles),
      (Search.defs, Search.oracles),
      (Curation.defs, Curation.oracles)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary(GraftSession.prime(spark), "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Lazy val, not
    * def: Bench/QTime/ScaleProbe look a query up per timed rep — a def
    * would rebuild the ~160-entry map from all 9 packs on every lookup.
    * The per-call prime() in the wrapper stays (the driver may hand any
    * session) but is a marker-guarded no-op after the first call. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_._1).toMap.map { case (name, fn) =>
      name -> ((s: SparkSession, dir: String) => fn(GraftSession.prime(s), dir))
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] = packs.flatMap(_._2).toMap
}
