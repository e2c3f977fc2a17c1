package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-lines document ingestion with corrupt-record quarantine — the
  * raw-crawl entry point of a curation pipeline, before any parquet
  * exists. Real dumps always carry broken lines (truncated writes,
  * encoding damage, schema drift); dropping them silently corrupts the
  * corpus-closure audits (q138's funnel), so ingestion must SPLIT the
  * input, never filter it: every non-blank input line lands in exactly
  * one of (clean, quarantine), and [[audit]] counts the
  * whitespace-only lines Spark's JSON source skips so the funnel
  * closes over the physical line count.
  *
  * Spark-first mechanics: JSONL is newline-splittable, so the scan
  * parallelizes by byte range with no coordination, and `PERMISSIVE`
  * parse mode routes unparseable lines into the declared
  * `_corrupt_record` column instead of failing the task (a single bad
  * byte must not kill a 100 TB ingest).
  *
  * Staging contract: [[parse]] returns a PERSISTED frame and
  * [[clean]]/[[quarantine]]/[[audit]] are projections of it. This is
  * deliberate, twice over: Spark refuses corrupt-column-only queries
  * against a raw JSON scan (the quarantine would otherwise re-parse the
  * whole input per consumer), and at production scale the parsed+corrupt
  * frame IS the bronze staging table an ingest job writes once before
  * splitting — the persist is the local stand-in for that write. Callers
  * `unpersist()` when done (or write the frame out and read that).
  *
  * The clean side also quarantines rows that PARSE but violate the
  * document contract (null/negative id, missing text) — parse success
  * is not schema validity.
  */
object JsonDocs {

  /** The document contract: matches the fixture's `documents` table so
    * ingested corpora drop into every existing query. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val corruptCol = "_corrupt_record"

  /** Parse the JSONL at `path` into (contract columns + corrupt line),
    * persisted — see the staging contract above.
    *
    * Parsed as a TEXT scan + `from_json` rather than the JSON file
    * source: the file source expands a top-level-ARRAY line into one
    * row per element (a common batched-dump variant), which breaks the
    * one-line-one-row invariant the closure audit depends on — clean
    * would count N rows for 1 physical line and the funnel would never
    * close. With `from_json`, an array line fails the struct schema and
    * lands in quarantine as unparseable: JSONL means one document per
    * line, and a line that is not one document is a contract violation
    * to surface, not data to silently multiply. */
  def parse(spark: SparkSession, path: String): DataFrame = {
    val full = schema.add(StructField(corruptCol, StringType))
    spark.read.text(path)
      // blank = ANY-whitespace-only (the JSON file source's skip rule —
      // tabs included, which Spark's space-only trim() would miss and
      // misroute into quarantine); counted by audit from the same regex
      .filter(!col("value").rlike("^\\s*$"))
      .select(from_json(col("value"), full,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> corruptCol)).as("r"))
      .select(col("r.*"))
      .persist()
  }

  private def invalidCond =
    col("doc_id").isNull || col("doc_id") < 0 || col("text").isNull

  /** Rows that parsed AND satisfy the contract, in the fixture's
    * `documents` shape (n_chars derived when the input omits it). */
  def clean(parsed: DataFrame): DataFrame =
    parsed
      .filter(col(corruptCol).isNull && !invalidCond)
      .select(col("doc_id"), col("text"),
        coalesce(col("lang"), lit("und")).as("lang"),
        coalesce(col("source"), lit("unknown")).as("source"),
        coalesce(col("n_chars"), length(col("text")).cast("long")).as("n_chars"))

  /** Everything else, with the raw line (or the parsed-but-invalid row
    * re-serialized) and a reason code — the quarantine a pipeline ships
    * to its dead-letter store and counts in the ingest funnel. */
  def quarantine(parsed: DataFrame): DataFrame = {
    val broken = parsed.filter(col(corruptCol).isNotNull)
      .select(col(corruptCol).as("raw"), lit("unparseable").as("reason"))
    val invalid = parsed.filter(col(corruptCol).isNull && invalidCond)
      .select(to_json(struct(schema.fieldNames.map(col): _*)).as("raw"),
        when(col("doc_id").isNull, lit("missing_id"))
          .when(col("doc_id") < 0, lit("negative_id"))
          .otherwise(lit("missing_text")).as("reason"))
    broken.unionByName(invalid)
  }

  /** Ingest-funnel audit: every input line is accounted for exactly once
    * across (clean, quarantined-by-reason, blank). The `blank` bucket
    * exists because Spark's JSON source silently SKIPS whitespace-only
    * lines (they reach neither clean nor quarantine) — common separator
    * noise in concatenated dumps; the audit re-counts them from a raw
    * text scan of the same path so the funnel still closes over the
    * physical line count. */
  def audit(spark: SparkSession, path: String, parsed: DataFrame): DataFrame = {
    val c = clean(parsed).agg(count(lit(1)).as("n"))
      .select(lit("clean").as("bucket"), col("n"))
    val q = quarantine(parsed).groupBy(col("reason").as("bucket"))
      .agg(count(lit(1)).as("n"))
    val blank = spark.read.text(path)
      .filter(col("value").rlike("^\\s*$")) // parse()'s blank rule, inverted
      .agg(count(lit(1)).as("n"))
      .select(lit("blank").as("bucket"), col("n"))
    c.unionByName(q).unionByName(blank).orderBy(col("bucket"))
  }
}
