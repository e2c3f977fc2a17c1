package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextFns.{h32, P}

/** Multimodal-column pack: the oracle-checkable face of
  * [[graft.operators.Multimodal]]. The fixture corpus has no real media
  * payloads, so the UTF-8 bytes of `documents.text` stand in as the opaque
  * payload; the queries exercise exactly the plumbing that matters at
  * scale — metadata derivation over binary columns and fixed-stride frame
  * sampling — with pure built-in expressions.
  */
object Media {
  type Q = (SparkSession, String) => DataFrame

  /** Payload metadata derivation: size, content hash, sniffed format and
    * fake dimensions (same arithmetic as Multimodal.ingest). Narrow
    * per-row projection — no shuffle at any scale. */
  def q37MediaMetadata(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        octet_length(col("text").cast("binary")).as("n_bytes"),
        md5(col("text")).as("content_hash"),
        h32(col("text")).as("h"))
      .select(col("doc_id"), col("n_bytes"), col("content_hash"),
        element_at(array(lit("png"), lit("jpeg"), lit("wav"), lit("mp4")),
          (col("h") % 4 + 1).cast("int")).as("format"),
        (col("h") % 320 + 320).cast("int").as("width_px"),
        (expr("h div 320") % 240 + 240).cast("int").as("height_px"))
      .orderBy(col("doc_id"))

  val q37Sql: String =
    """WITH d AS (
      |  SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS content_hash,
      |    ('0x' || substr(md5(text), 1, 8))::BIGINT AS h
      |  FROM documents)
      |SELECT doc_id, n_bytes, content_hash,
      |  (['png', 'jpeg', 'wav', 'mp4'])[(h % 4 + 1)::INT] AS format,
      |  (h % 320 + 320)::INT AS width_px,
      |  ((h // 320) % 240 + 240)::INT AS height_px
      |FROM d
      |ORDER BY doc_id""".stripMargin

  /** Fixed-stride frame sampling (stride 16, frame length 8) + per-doc
    * frame-set checksum — the relational mirror of
    * Multimodal.sampleFrames/FakeDecoder. Explode is per-row local;
    * the aggregate collapses it right back, so the shuffle carries one
    * row per document. */
  def q38FrameChecksum(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(length(col("text")) >= 8)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0),
          floor((length(col("text")) - 8) / 16).cast("int"))).as("i"))
      .select(col("doc_id"),
        h32(expr("substring(text, i*16+1, 8)")).as("fh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        (sum(col("fh")) % P).as("checksum"))
      .orderBy(col("doc_id"))

  val q38Sql: String =
    """WITH u AS (
      |  SELECT doc_id, text,
      |    unnest(range(0, (length(text) - 8) // 16 + 1)) AS i
      |  FROM documents WHERE length(text) >= 8),
      |f AS (
      |  SELECT doc_id,
      |    ('0x' || substr(md5(substr(text, (i*16+1)::INT, 8)), 1, 8))::BIGINT AS fh
      |  FROM u)
      |SELECT doc_id, count(*) AS n_frames, (sum(fh) % 1000000007)::BIGINT AS checksum
      |FROM f
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  val defs: Map[String, Q] = Map(
    "q37_media_metadata" -> (q37MediaMetadata _),
    "q38_frame_checksum" -> (q38FrameChecksum _)
  )

  val oracles: Map[String, String] = Map(
    "q37_media_metadata" -> q37Sql,
    "q38_frame_checksum" -> q38Sql
  )
}
