package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextFns.tokens

/** Text-search pack: BM25 ranking over the documents corpus — the
  * retrieval side of a training-data pipeline (quality-weighted sampling,
  * dedup-aware search, eval-set mining all sit on this primitive).
  *
  * Fully relational: term frequencies and document frequencies come from
  * one explode + two aggregates; scoring is a broadcast join of the tiny
  * query-terms table against the postings. At 100 TB the postings list is
  * the classic inverted index as a DataFrame — partitioned by term hash,
  * pruned by the query's term set before any shuffle.
  */
object Search {
  type Q = (SparkSession, String) => DataFrame

  private val k1 = 1.2
  private val b = 0.75
  private val queryTerms = Seq("spark", "window", "dup")
  private val queryTermsSqlList = queryTerms.map(t => s"('$t')").mkString(", ")

  /** BM25 scores for a fixed query over the corpus; docs above a score
    * floor, ordered by doc_id (rank-free output keeps the result robust to
    * last-ulp log() differences across engines — scores are rounded, and
    * no row's membership depends on another row's score). */
  def q46Bm25(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val qt = queryTerms.toDF("term")
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val docLen = docs.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val corpus = docLen.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avg_dl"))
    val tf = docs.join(broadcast(qt), col("tok") === col("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
    tf.join(broadcast(df_), "term")
      .join(docLen, "doc_id")
      .crossJoin(broadcast(corpus))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("contrib",
        col("idf") * (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avg_dl"))))
      .groupBy(col("doc_id"))
      .agg(round(lit(1e-9) + sum(col("contrib")), 5).as("bm25"),
        count(lit(1)).as("n_terms_hit"))
      .filter(col("bm25") >= 1.0)
      .orderBy(col("doc_id"))
  }

  val q46Sql: String =
    s"""WITH qt(term) AS (VALUES $queryTermsSqlList),
      |toks AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> len(t) > 0)) AS tok
      |  FROM documents),
      |doclen AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
      |corpus AS (SELECT count(*) AS n_docs, avg(dl) AS avg_dl FROM doclen),
      |tf AS (
      |  SELECT doc_id, term, count(*) AS tf
      |  FROM toks JOIN qt ON tok = term
      |  GROUP BY 1, 2),
      |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
      |scored AS (
      |  SELECT tf.doc_id,
      |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
      |      * (tf * (1.2 + 1)) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_dl)) AS contrib
      |  FROM tf
      |  JOIN df USING (term)
      |  JOIN doclen USING (doc_id)
      |  CROSS JOIN corpus)
      |SELECT doc_id, round(1e-9 + sum(contrib), 5) AS bm25, count(*) AS n_terms_hit
      |FROM scored
      |GROUP BY doc_id
      |HAVING round(1e-9 + sum(contrib), 5) >= 1.0
      |ORDER BY doc_id""".stripMargin

  val defs: Map[String, Q] = Map("q46_bm25" -> (q46Bm25 _))
  val oracles: Map[String, String] = Map("q46_bm25" -> q46Sql)
}
