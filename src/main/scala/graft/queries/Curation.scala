package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.functions.TextFns.{h32, tokens}

/** Corpus-curation pack: the selection/splitting stage of a training-data
  * pipeline. Both operators are pure per-row hash/rank arithmetic — no
  * RNG, so assignments are reproducible across runs, engines, and
  * cluster sizes (the property that makes a 100 TB split auditable).
  */
object Curation {
  type Q = (SparkSession, String) => DataFrame

  /** Deterministic train/val/test split by content-independent key hash
    * (90/5/5): split = h32("split_" + doc_id) % 100. Per-split stats
    * verify the assignment is stable and proportional. */
  def q52DataSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("bucket", h32(concat(lit("split_"), col("doc_id"))) % 100)
      .withColumn("split",
        when(col("bucket") < 90, "train")
          .when(col("bucket") < 95, "val")
          .otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("total_chars"),
        min(col("doc_id")).as("first_doc"))
      .orderBy(col("split"))

  val q52Sql: String =
    """WITH d AS (
      |  SELECT doc_id, text,
      |    ('0x' || substr(md5('split_' || doc_id), 1, 8))::BIGINT % 100 AS bucket
      |  FROM documents)
      |SELECT CASE WHEN bucket < 90 THEN 'train'
      |            WHEN bucket < 95 THEN 'val'
      |            ELSE 'test' END AS split,
      |  count(*) AS n_docs,
      |  sum(length(text))::BIGINT AS total_chars,
      |  min(doc_id) AS first_doc
      |FROM d
      |GROUP BY 1
      |ORDER BY split""".stripMargin

  /** Language-balanced sampling: top-5 documents per language by a quality
    * proxy (longest average word length, doc_id tie-break) — the
    * window-rank shape of per-stratum corpus selection. One shuffle on the
    * stratum key regardless of corpus size. */
  def q53BalancedSample(spark: SparkSession, dir: String): DataFrame = {
    val nWords = size(tokens(col("text")))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("awl").desc, col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        (length(regexp_replace(col("text"), " ", "")).cast("double") / nWords).as("awl"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("lang"), col("rk"), col("doc_id"),
        round(lit(1e-9) + col("awl"), 5).as("avg_word_len"))
      .orderBy(col("lang"), col("rk"))
  }

  val q53Sql: String =
    """WITH d AS (
      |  SELECT doc_id, lang,
      |    CAST(length(replace(text, ' ', '')) AS DOUBLE)
      |      / len(list_filter(string_split(text, ' '), t -> len(t) > 0)) AS awl
      |  FROM documents),
      |ranked AS (
      |  SELECT lang, doc_id, awl,
      |    row_number() OVER (PARTITION BY lang ORDER BY awl DESC, doc_id) AS rk
      |  FROM d)
      |SELECT lang, rk, doc_id, round(1e-9 + awl, 5) AS avg_word_len
      |FROM ranked WHERE rk <= 5
      |ORDER BY lang, rk""".stripMargin

  val defs: Map[String, Q] = Map(
    "q52_data_split" -> (q52DataSplit _),
    "q53_balanced_sample" -> (q53BalancedSample _)
  )

  val oracles: Map[String, String] = Map(
    "q52_data_split" -> q52Sql,
    "q53_balanced_sample" -> q53Sql
  )
}
