package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns with a typed metadata struct
  * riding alongside — the schema a 100 TB multimodal corpus would use
  * (payload + metadata in parquet, partitioned by format/shard). The
  * Spark-side machinery here is real and tested: schema, typed Datasets,
  * per-partition batched decode (the JVM analog of a vectorized pandas-UDF:
  * rows are chunked into fixed-size batches inside `mapPartitions`, so a
  * real decoder could amortize model/codec setup per batch), frame
  * sampling, and feature extraction — all without any driver-side collect.
  *
  * The *decode step itself is a STUB*: real image/audio codecs are not
  * available in this environment, so [[FakeDecoder]] produces deterministic
  * pseudo-features from the bytes. Swapping in a real decoder is a one-line
  * change at the call site; nothing else moves.
  */
object Multimodal {

  /** Typed metadata carried next to the opaque payload. */
  case class MediaMeta(format: String, widthPx: Int, heightPx: Int, nBytes: Long)

  /** One media row: id + opaque payload + typed metadata. */
  case class MediaRecord(id: Long, media: Array[Byte], meta: MediaMeta)

  /** Decoder output: per-item features a downstream pipeline would train on. */
  case class MediaFeatures(id: Long, format: String, nFrames: Int,
                           checksum: Long, thumbFirstByte: Int)

  /** The decode contract. Implementations MUST be pure per-record functions
    * (no shared mutable state) — they run concurrently on executor threads. */
  trait MediaDecoder extends Serializable {
    /** Decode one payload into features. `frameStride`/`frameLen` define
      * the sampling grid a video decoder would honor. */
    def decode(rec: MediaRecord): MediaFeatures
  }

  /** STUB decoder — deterministic pseudo-decode standing in for a real
    * codec (not available in this container). "Frames" are fixed-stride
    * byte slices; the checksum is a rolling hash of sampled frames; the
    * "thumbnail" is the first sampled byte. Everything is reproducible so
    * the plumbing around it can be tested end-to-end. */
  final class FakeDecoder(frameStride: Int = 16, frameLen: Int = 8)
      extends MediaDecoder {
    override def decode(rec: MediaRecord): MediaFeatures = {
      val frames = sampleFrames(rec.media, frameStride, frameLen)
      val checksum = frames.foldLeft(0L) { (acc, f) =>
        (acc * 131 + f.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)) % 1000000007L
      }
      MediaFeatures(rec.id, rec.meta.format, frames.length, checksum,
        if (frames.nonEmpty && frames.head.nonEmpty) frames.head.head & 0xff else -1)
    }
  }

  /** Fixed-stride frame sampling over an opaque payload — the byte-level
    * skeleton of video frame extraction. Pure, allocation-light. */
  def sampleFrames(bytes: Array[Byte], stride: Int, frameLen: Int): Seq[Array[Byte]] = {
    require(stride > 0 && frameLen > 0, s"stride=$stride frameLen=$frameLen must be positive")
    (0 to (bytes.length - frameLen) / stride)
      .filter(i => i * stride + frameLen <= bytes.length)
      .map(i => bytes.slice(i * stride, i * stride + frameLen))
  }

  /** Wrap an (id, payload) DataFrame into the typed media schema, deriving
    * metadata from the payload (format bucketed by content hash — a stand-in
    * for magic-byte sniffing; dimensions faked deterministically). */
  def ingest(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    val h = conv(substring(md5(col(payloadCol)), 1, 8), 16, 10).cast("long")
    df.select(
        col(idCol).cast("long").as("id"),
        col(payloadCol).cast("binary").as("media"),
        struct(
          element_at(array(lit("png"), lit("jpeg"), lit("wav"), lit("mp4")),
            (h % 4 + 1).cast("int")).as("format"),
          (lit(320) + h % 320).cast("int").as("widthPx"),
          (lit(240) + floor(h / 320).cast("long") % 240).cast("int").as("heightPx"),
          octet_length(col(payloadCol).cast("binary")).cast("long").as("nBytes")
        ).as("meta"))
      .as[MediaRecord]
  }

  /** Batched per-partition decode: rows are grouped into `batchSize` chunks
    * inside each partition (the vectorized-UDF batch shape), decoded, and
    * re-flattened. Narrow transformation — partitioning is preserved, no
    * shuffle, no driver involvement. */
  def extractFeatures(ds: Dataset[MediaRecord], decoder: MediaDecoder,
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary: a real codec would set up / tear down here
        batch.iterator.map(decoder.decode)
      }
    }
  }
}
