package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.functions.TextFns.{h32, shingles, tokens}

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

  /** Train/test decontamination: a test document is contaminated if it
    * shares ANY 8-token shingle with ANY train document (the n-gram
    * overlap scan run before every eval; split = q52's hash buckets, so
    * the check composes with the split it audits).
    *
    * Scale design: this is the inverted-index form — one shingle
    * expansion feeds both split sides, the train side collapses to a
    * distinct shingle-hash set, and contamination is a shuffle equi-join
    * on the 8-byte hash. Cost is linear in postings; no test×train
    * document pairing ever materializes. At 100 TB the train set is the
    * big side and the join partitions by `h` exactly as a persisted
    * inverted index would. */
  def q56Contamination(spark: SparkSession, dir: String): DataFrame = {
    val sh = Tables.documents(spark, dir)
      // spread the shingle+md5 expansion across cores (see Dedup.shPostings)
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("bucket", h32(concat(lit("split_"), col("doc_id"))) % 100)
      .select(col("doc_id"), col("bucket"),
        explode(shingles(tokens(col("text")), 8)).as("s"))
      .select(col("doc_id"), col("bucket"), h32(col("s")).as("h"))
      .distinct()
      // both split sides read this once; single-node analog of writing
      // the postings table (see Dedup.shPostings for the full rationale —
      // persist keeps the doc_id partitioning, a checkpoint would not)
      .persist()
    val train = sh.filter(col("bucket") < 90).select(col("h")).distinct()
    val test = sh.filter(col("bucket") >= 95).select(col("doc_id"), col("h"))
    val tot = test.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val hits = test.join(train, Seq("h"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
    tot.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id").as("test_doc"), col("n_sh"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("contaminated", (col("n_hit") > 0).cast("int"))
      .orderBy(col("test_doc"))
  }

  val q56Sql: String =
    """WITH d AS (
      |  SELECT doc_id, text,
      |    ('0x' || substr(md5('split_' || doc_id), 1, 8))::BIGINT % 100 AS bucket
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, bucket,
      |    ('0x' || substr(md5(s), 1, 8))::BIGINT AS h
      |  FROM (
      |    SELECT doc_id, bucket, unnest(list_transform(range(1, len(toks) - 6),
      |      i -> array_to_string(toks[i:i+7], ' '))) AS s
      |    FROM (SELECT doc_id, bucket,
      |            list_filter(string_split(text, ' '), t -> len(t) > 0) AS toks
      |          FROM d))),
      |tr AS (SELECT DISTINCT h FROM sh WHERE bucket < 90),
      |te AS (SELECT doc_id, h FROM sh WHERE bucket >= 95),
      |tot AS (SELECT doc_id, count(*) AS n_sh FROM te GROUP BY 1),
      |hits AS (
      |  SELECT te.doc_id, count(*) AS n_hit
      |  FROM te JOIN tr USING (h) GROUP BY 1)
      |SELECT tot.doc_id AS test_doc, tot.n_sh,
      |  coalesce(hits.n_hit, 0) AS n_hit,
      |  (coalesce(hits.n_hit, 0) > 0)::INT AS contaminated
      |FROM tot LEFT JOIN hits ON tot.doc_id = hits.doc_id
      |ORDER BY test_doc""".stripMargin

  val defs: Map[String, Q] = Map(
    "q52_data_split" -> (q52DataSplit _),
    "q53_balanced_sample" -> (q53BalancedSample _),
    "q56_contamination" -> (q56Contamination _)
  )

  val oracles: Map[String, String] = Map(
    "q52_data_split" -> q52Sql,
    "q53_balanced_sample" -> q53Sql,
    "q56_contamination" -> q56Sql
  )
}
