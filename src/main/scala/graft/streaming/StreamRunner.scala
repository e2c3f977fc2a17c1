package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.pipeline.{Messages, Plugin, ProductList, Runner}

/** Streaming front-end (reference: `generate_messages` →
  * one-job-per-message, launcher.py:146-171, 237-250, SURVEY §2.6).
  *
  * Mapping:
  *  - message intake → a file-source stream (at scale: Kafka source; the
  *    API below only assumes a streaming DataFrame);
  *  - one job per message, strictly sequential (`proc.start(); proc.join()`,
  *    launcher.py:244-245) → `foreachBatch` with `maxFilesPerTrigger=1`:
  *    micro-batches are sequential by contract, so the per-batch chain
  *    keeps the reference's deterministic one-at-a-time semantics;
  *  - old-data admission (`check_metadata start_time: -120`,
  *    plugins/__init__.py:705-711) → event-time watermark + windowed aggs:
  *    state for windows older than the watermark is dropped, which is the
  *    scale-safe version of the same contract (bounded state, late data
  *    ignored);
  *  - graceful SIGTERM drain (launcher.py:151-157) → `stopGracefully`;
  *  - one-shot CLI mode (cli.py) → `Trigger.AvailableNow`: process the
  *    backlog, then stop.
  */
object StreamRunner {

  /** Normalize an event-time column to int64 epoch-nanos. The fixture's
    * physical encoding has drifted across generations (int64
    * TIMESTAMP(NANOS) vs TIMESTAMP(MICROS) read as TIMESTAMP_NTZ), and a
    * streamed events frame carries whichever the files have — so every
    * time-consuming helper below normalizes instead of assuming. Matches
    * [[graft.sources.Tables.events]]; ContractSpec pins the encodings. */
  def normalizeNs(df: DataFrame, c: String): DataFrame =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ =>
        df.withColumn(c, expr(s"unix_micros(cast(`$c` as timestamp)) * 1000L"))
    }

  /** File-source message stream: one file ≈ one message.
    * `maxFilesPerTrigger=1` keeps batches message-sized and sequential. */
  def fileStream(spark: SparkSession, dir: String, schema: StructType,
                 format: String = "parquet"): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .format(format)
      .load(dir)

  /** Watermarked tumbling-window aggregation over the events schema (the
    * streaming form of the batch q18): per (hour, event_type) counts and
    * value sums, with state bounded by the admission watermark. Takes a
    * `ts_ns` event-time column in either fixture encoding. */
  def hourlyVolume(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    normalizeNs(events, "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("sum_value"))

  /** Run a per-batch job over the stream — the `foreachBatch` analog of
    * `process_files`: each micro-batch (= message) runs the supplied chain
    * exactly once, sequentially. Returns the running query. */
  def runPerMessage(stream: DataFrame, checkpointDir: String,
                    availableNow: Boolean = true)
                   (job: (DataFrame, Long) => Unit): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime(0L))
      .foreachBatch { (batch: DataFrame, id: Long) => job(batch, id) }
      .start()

  /** Text-file message stream: one file = one posttroll-style JSON
    * message (the subscriber-socket analog; at scale the same code takes
    * a Kafka `value` column). */
  def messageStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", 1)
      .option("wholetext", true) // one file = one message, newlines and all
      .text(dir)

  /** The full reference main loop, streaming-native: `generate_messages`
    * → `message_to_jobs` → `process_jobs` (launcher.py:146-171, 269-300).
    * Every row of each micro-batch is one JSON message: it is parsed into
    * a [[graft.pipeline.PipelineContext]] ([[Messages.toContext]] — the
    * message's `data` dict becomes `input_mda`), the caller's `mkChain`
    * builds the plugin chain from the message's input paths (prepend a
    * `CreateScene(paths)` for the reference's `create_scene` slot), and
    * the chain runs priority group by priority group via
    * [[Runner.processJobs]]. `onReport` receives each message's job
    * reports (publish/audit hook — the tests' capture point).
    *
    * Scale note: the per-batch `collect()` pulls MESSAGES to the driver,
    * not data — messages are control-plane JSON (the reference holds each
    * one in a Python dict); the frames the chain computes from those
    * paths stay fully distributed. Micro-batches are sequential by
    * contract, so jobs run one message at a time exactly like the
    * reference's `proc.start(); proc.join()`. */
  def runMessages(messages: DataFrame, spec: ProductList,
                  checkpointDir: String,
                  mkChain: Seq[String] => Seq[Plugin],
                  timeoutPerPlugin: scala.concurrent.duration.Duration =
                    scala.concurrent.duration.Duration.Inf,
                  crashHandlers: Seq[Runner.CrashHandler] = Seq.empty,
                  availableNow: Boolean = true)
                 (onReport: (String, Seq[Runner.JobReport]) => Unit): StreamingQuery =
    runPerMessage(messages, checkpointDir, availableNow) { (batch, _) =>
      val spark = batch.sparkSession
      batch.select(col(batch.columns.head).cast("string"))
        .collect().iterator.map(_.getString(0)).filter(_ != null)
        .foreach { json =>
          val (ctx, paths) = Messages.toContext(spark, spec, json)
          val reports = Runner.processJobs(ctx, mkChain(paths),
            timeoutPerPlugin, crashHandlers)
          onReport(json, reports)
        }
    }

  /** Run a streaming aggregation into an in-memory table (tests/dev) or
    * any sink via `format`. Complete mode — the aggregation result is the
    * full current state, like the reference recomputing per job. */
  def runAggregate(agg: DataFrame, queryName: String, checkpointDir: String,
                   availableNow: Boolean = true): StreamingQuery =
    agg.writeStream
      .queryName(queryName)
      .outputMode("complete")
      .format("memory")
      .option("checkpointLocation", checkpointDir)
      .trigger(if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime(0L))
      .start()

  /** Stream-static enrichment: join each micro-batch against a static
    * dimension table (the streaming face of the reference's per-job
    * metadata lookups). The static side is re-read per micro-batch under
    * the hood but planned as a broadcast hash join when small — state-
    * free, so unlike stream-stream joins it needs no watermark. */
  def enrich(stream: DataFrame, dim: DataFrame,
             keys: Seq[String]): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), keys)

  /** Streaming exact-dedup: drop re-deliveries of the same key across
    * micro-batches, with state bounded by the event-time watermark (keys
    * older than the watermark are evicted — the streaming face of the
    * batch dedup pack, and the standard at-least-once → effectively-once
    * repair for replayed message streams). Takes a `ts_ns` event-time
    * column in either fixture encoding. */
  def dedupStream(events: DataFrame, keys: Seq[String],
                  watermark: String = "2 hours"): DataFrame =
    normalizeNs(events, "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .withWatermark("ts", watermark)
      .dropDuplicates(keys :+ "ts")

  /** Streaming admission gate — the streaming face of q100's
    * incremental-ingest dedup: a new document enters the corpus only if
    * its content key is unseen in BOTH the historical corpus and the
    * stream so far. The historical side is a stream-static left_anti
    * join (state-free: the static side re-plans per micro-batch, and at
    * production scale it is the materialized content-key table the batch
    * dedup pass already writes — small enough keyed storage to
    * broadcast-or-shuffle per batch, never the raw corpus); the
    * within-stream side is the watermarked dropDuplicates gate, so
    * replayed deliveries and intra-stream dupes both bounce. State is
    * O(stream keys inside the watermark horizon) — the historical keys
    * live in storage, not in stream state. */
  def admissionGate(stream: DataFrame, corpusKeys: DataFrame,
      keys: Seq[String], watermark: String = "2 hours"): DataFrame =
    dedupStream(stream, keys, watermark)
      .join(corpusKeys.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** Streaming NEAR-dup admission gate — the LSH face of
    * [[admissionGate]]: a streamed document is rejected when ANY of its
    * 4 MinHash band fingerprints collides with the historical corpus'
    * LSH index (the (band, bfp) table a batch q30-style pass persists —
    * [[graft.queries.Dedup.bandTable]]). Signatures are computed
    * ROW-LOCALLY ([[graft.queries.Dedup.rowBandFps]] — numerically
    * identical to the batch aggregation), so the stream side adds zero
    * shuffles and zero state; "no band collides" is four stream-static
    * left_anti joins, one per band key, each state-free (the static
    * index re-plans per micro-batch). Combined with the watermarked
    * exact gate ([[dedupStream]] on `keys`), replays, intra-stream
    * dupes, and corpus near-dups all bounce; stream state stays
    * O(stream keys inside the watermark horizon). Documents with < 3
    * tokens carry no shingles, hence null fingerprints and no near-dup
    * evidence: they pass the LSH stage (null never equi-matches) and
    * rely on the exact gate alone — same as batch, where a shingle-less
    * doc never enters the postings. */
  def nearDupGate(stream: DataFrame, corpusBands: DataFrame,
      keys: Seq[String], textCol: String = "text",
      watermark: String = "2 hours"): DataFrame = {
    val fps = graft.queries.Dedup.rowBandFps(col(textCol))
    fps.zipWithIndex.foldLeft(dedupStream(stream, keys, watermark)) {
      case (df, (fp, band)) =>
        df.withColumn("_bfp", fp)
          .join(corpusBands.filter(col("band") === band)
              .select(col("bfp").as("_bfp")).distinct(),
            Seq("_bfp"), "left_anti")
          .drop("_bfp")
    }
  }

  /** Self-maintaining streaming near-dup gate — the full production
    * ingest loop in ONE streaming query: the LSH index the gate checks
    * GROWS as documents are admitted, so later deliveries of the same
    * (or near-duplicate) content bounce even when nothing was indexed
    * up front. Micro-batches run strictly sequentially, which makes the
    * read-then-append on `indexDir` safe without coordination:
    *
    *  1. replays inside the stream bounce on the watermarked exact gate
    *     ([[dedupStream]] on `key`);
    *  2. rows whose row-local band fingerprints
    *     ([[graft.queries.Dedup.rowBandFps]]) collide with the index
    *     parquet at `indexDir` bounce (batch-side left_semi — the index
    *     is re-read per micro-batch, exactly the stream-static
    *     contract);
    *  3. intra-batch near-dups reduce to a canonical owner: for every
    *     (band, bfp) group inside the batch the minimum key wins, and a
    *     row is admitted only if no smaller key owns any of its bands
    *     (chains that dodge this single-round rule collapse anyway on
    *     the next delivery, because admitted rows are indexed);
    *  4. the admitted rows' band rows are written to the
    *     `batch_id=<id>` partition of `indexDir` with
    *     [[idempotentBatchSink]] semantics, and the admitted rows flow
    *     to `onBatch`.
    *
    * REPLAY SAFETY: foreachBatch replays a batch (same id, same rows)
    * after a crash, so the collision check reads only partitions with
    * `batch_id < id` — a torn write from the failed attempt of THIS id
    * can never bounce the batch against itself — and the batch's own
    * partition is overwritten whole. The replay therefore recomputes the
    * identical admitted set and re-delivers it to `onBatch`, whose
    * downstream must be idempotent per batch id (use
    * [[idempotentBatchSink]]).
    *
    * RECOVERY UNIT: the `batch_id < id` guard ties index partitions to
    * the checkpoint's batch counter, so the index and the checkpoint
    * form ONE recovery unit (exactly like any stateful sink's state):
    * restore or move them TOGETHER. Restarting with a fresh checkpoint
    * against a populated index would silently re-admit and clobber —
    * the gate detects that (existing `batch_id` ≥ the stream's counter,
    * or a non-partitioned legacy layout) and fails loudly instead. To
    * seed from an existing batch-built index (e.g.
    * [[graft.queries.Dedup.bandTableOf]] over the historical corpus),
    * pass it as `seedBands` — a static side checked alongside the
    * growing index, outside the recovery unit.
    *
    * State stays O(stream keys inside the watermark horizon): the index
    * lives in storage, not in stream state. */
  def selfIndexingGate(stream: DataFrame, indexDir: String,
      checkpointDir: String, key: String = "doc_id",
      textCol: String = "text", watermark: String = "2 hours",
      seedBands: Option[DataFrame] = None,
      evalBloomBits: Option[Array[Long]] = None)(
      onBatch: DataFrame => Unit): StreamingQuery = {
    val bandSchema = StructType(Seq(
      org.apache.spark.sql.types.StructField("band",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("bfp",
        org.apache.spark.sql.types.LongType)))
    // eval-suite decontamination runs FIRST: a document contaminated
    // against the protected suite must bounce at ingest — before it can
    // claim a band-group ownership or grow the index ([[decontamGate]],
    // row-local, stateless)
    val guarded = evalBloomBits match {
      case Some(bits) => decontamGate(stream, bits, textCol)
      case None => stream
    }
    dedupStream(guarded, Seq(key), watermark)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        // ONE signature pass per batch: later sets (survivor bands, the
        // index write) derive from this persisted explode instead of
        // re-running the shingle+MinHash kernel per consumer
        val fps = graft.queries.Dedup.rowBandFps(col(textCol))
        val bands = batch.select(
            col(key),
            posexplode(array(fps: _*)).as(Seq("band", "bfp")))
          .filter(col("bfp").isNotNull)
          .persist()
        try {
          val idxPath = new org.apache.hadoop.fs.Path(indexDir)
          val fs = idxPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
          // recovery-unit validation: an index partition AHEAD of the
          // stream's batch counter, or a non-partitioned (legacy/foreign)
          // layout, means the checkpoint was reset or points elsewhere —
          // proceeding would silently re-admit and clobber; fail loudly
          if (fs.exists(idxPath)) {
            val entries = fs.listStatus(idxPath)
            entries.foreach { st =>
              val n = st.getPath.getName
              if (st.isDirectory && n.startsWith("batch_id=")) {
                val k = n.stripPrefix("batch_id=").toLong
                require(k <= id,
                  s"index at $indexDir carries batch_id=$k beyond the " +
                    s"stream's batch $id: the LSH index and the streaming " +
                    "checkpoint form one recovery unit — restore or " +
                    "re-point them together (seed an external index via " +
                    "seedBands instead)")
              } else if (!n.startsWith("_") && !n.startsWith("."))
                throw new IllegalArgumentException(
                  s"index at $indexDir contains non-partitioned entry $n — " +
                    "not a selfIndexingGate index (seed external band " +
                    "tables via seedBands)")
            }
          }
          // replay safety: only COMMITTED partitions (batch_id < id) gate
          // this batch — a torn write from a failed attempt of the SAME
          // id must not bounce the batch against itself
          val index =
            if (fs.exists(idxPath))
              spark.read.option("basePath", indexDir)
                .schema(bandSchema.add(org.apache.spark.sql.types.StructField(
                  "batch_id", org.apache.spark.sql.types.LongType)))
                .parquet(indexDir)
                .filter(col("batch_id") < id)
            else spark.createDataFrame(
              new java.util.ArrayList[org.apache.spark.sql.Row](), bandSchema)
          val gateBands = seedBands match {
            case Some(sb) => index.select(col("band"), col("bfp"))
              .unionByName(sb.select(col("band"), col("bfp")))
            case None => index.select(col("band"), col("bfp"))
          }
          val bounced = bands
            .join(gateBands, Seq("band", "bfp"), "left_semi")
            .select(col(key)).distinct()
          val sBands = bands.join(bounced, Seq(key), "left_anti")
          val owners = sBands.groupBy(col("band"), col("bfp"))
            .agg(min(col(key)).as("_owner"))
          val losers = sBands.join(owners, Seq("band", "bfp"))
            .filter(col(key) =!= col("_owner"))
            .select(col(key)).distinct()
          val adBands = sBands.join(losers, Seq(key), "left_anti").persist()
          try {
            // the batch's own partition is overwritten whole — the
            // idempotentBatchSink contract, healing torn writes
            adBands.select(col("band"), col("bfp"))
              .write.mode("overwrite").parquet(s"$indexDir/batch_id=$id")
            // admitted = batch minus rejected: shingle-less rows carry no
            // bands, hence no near-dup evidence — they pass (the exact
            // gate upstream already handled replays), same as batch
            // dedup. Persisted: a callback running several actions must
            // not re-run the whole gate (index read + joins) per action.
            val admitted = batch.join(bounced.unionByName(losers), Seq(key),
              "left_anti").persist()
            try onBatch(admitted)
            finally { admitted.unpersist(); () }
          } finally { adBands.unpersist(); () }
        } finally { bands.unpersist(); () }
        ()
      }
      .start()
  }

  /** Streaming DECONTAMINATION gate — eval-suite protection at ingest:
    * a streamed document bounces when ANY of its 8-gram shingles is a
    * member of the protected set's Bloom filter (q124's exact geometry,
    * [[graft.queries.Curation.bloomBitsOf]] builds the bitset from the
    * eval suite once at gate setup). The probe is ROW-LOCAL
    * ([[graft.queries.Curation.bloomMember]] over the row's
    * `shingle_h32` array, the bitset riding the plan as a 128 KiB
    * array<long> literal — the broadcast-occupied-set design of q124,
    * shipped to every executor): zero joins, zero shuffles, zero stream
    * state, and the admitted set is micro-batch-slicing-independent.
    * Bloom semantics mean no false negatives — nothing sharing an
    * 8-gram with the eval suite can slip through — at q124's measured
    * false-positive rate. Documents with < 8 tokens carry no shingles
    * and pass (no contamination evidence), exactly like the batch
    * triad. Compose with [[qualityGate]]/[[selfIndexingGate]] for the
    * full admission stack. */
  def decontamGate(stream: DataFrame, evalBloomBits: Array[Long],
      textCol: String = "text"): DataFrame = {
    val bits = typedLit(evalBloomBits.toSeq)
    stream.filter(!exists(
      graft.functions.TextFns.shingleH32(col(textCol), 8),
      h => graft.queries.Curation.bloomMember(h, bits)))
  }

  /** Streaming quality-admission gate — the second standard stream
    * filter beside the near-dup gates: admit only documents the frozen
    * registry classifier ([[graft.queries.Curation.registryCols]] —
    * the SAME column definition q140/q141/q147 score with in batch)
    * rates at `p ≥ minP`. A pure row-local codegen kernel: no state,
    * no shuffle, and stream-admitted vs batch-curated corpora agree by
    * construction. */
  def qualityGate(stream: DataFrame, minP: Double = 0.5,
      textCol: String = "text"): DataFrame =
    stream.filter(
      graft.queries.Curation.registryCols(col(textCol))("p") >= minP)

  /** Exactly-once parquet sink for `foreachBatch`: Structured Streaming
    * guarantees batch REPLAY after a failure (same id, same data), not
    * sink-side non-duplication — an at-least-once sink turns every
    * recovery into duplicate rows. The standard repair is an IDEMPOTENT
    * sink keyed by the batch id: rows land in `batch_id=<id>` partition
    * directories; a replayed id whose partition already carries the
    * `_SUCCESS` marker is a no-op, and a partial write WITHOUT the marker
    * (the crash happened mid-write) is overwritten whole. Readers see
    * exactly-once output by construction (`spark.read.parquet(outDir)`
    * with partition discovery). At production scale a transactional
    * table format subsumes the marker protocol; the directory contract
    * here is the plain-parquet equivalent. */
  def idempotentBatchSink(outDir: String)(batch: DataFrame, id: Long): Unit = {
    val dir = new org.apache.hadoop.fs.Path(s"$outDir/batch_id=$id")
    val fs = dir.getFileSystem(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"))) {
      batch.write.mode("overwrite").parquet(dir.toString)
    }
  }

  // ---------------------------------------------------------------------
  // Streaming CDC apply: SCD2 dimension maintenance
  // ---------------------------------------------------------------------

  /** The SCD2 dimension schema [[graft.queries.EventOps.q154Scd2Intervals]]
    * emits, plus one internal bookkeeping column: `wm_ns` — the max
    * applied event timestamp, carried on the open (current) version row
    * only — which lets the next merge REJECT out-of-order arrivals
    * loudly instead of silently corrupting history. */
  private val scd2Schema = StructType(Seq(
    org.apache.spark.sql.types.StructField("user_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("ver",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("state",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("valid_from_ns",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("valid_to_ns",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("n_events",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("is_current",
      org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("wm_ns",
      org.apache.spark.sql.types.LongType)))

  /** Pure micro-batch SCD2 MERGE: apply a changelog slice to an existing
    * type-2 dimension — close open intervals whose user changed state,
    * extend those that didn't, append new versions, admit new users —
    * and return the next dimension. The streaming face of
    * [[graft.queries.EventOps.q154Scd2Intervals]]: replaying a changelog
    * through this merge batch-by-batch yields EXACTLY the table the
    * batch query builds from the same events (StreamRunnerSpec pins it).
    *
    * Contract: per-user event order across batches must follow the
    * (ts_ns, event_id) order q154's windows use — the normal shape of a
    * CDC changelog. A batch carrying an event OLDER than a user's
    * applied watermark throws rather than silently rewriting closed
    * history (the dimension is append/extend-only by construction).
    *
    * Mechanics, all set-based: affected users' open versions become
    * carry-in pseudo-rows (side 0 — they sort before same-timestamp
    * events) unioned with the batch; one per-user ordered window
    * recomputes state-change markers and local version numbers exactly
    * like q154; a (user, local-version)-grain aggregation rebuilds the
    * open-and-newer versions; closed versions and untouched users pass
    * through untouched.
    *
    * Scale design: cost is O(batch + affected users' open versions + a
    * pass over the stored dimension for the semi/anti splits). The
    * windows partition by user_id (state bounded per user), the merge
    * shuffles on user_id once, and nothing is corpus-wide. At production
    * scale the snapshot write below is a transactional-format MERGE
    * (only touched files rewrite); the plain-parquet snapshot here is
    * the same plan with a full-copy commit, exactly like
    * [[idempotentBatchSink]]'s directory contract. */
  def scd2ApplyBatch(dim: DataFrame, events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val users = events.select(col("user_id")).distinct()
    // accept both a bookkeeping-bearing snapshot and a bare q154 frame
    // (first adoption of an existing batch-built dimension): without
    // wm_ns the open version's start is the best known watermark
    val dimW =
      if (dim.columns.contains("wm_ns")) dim
      else dim.withColumn("wm_ns", when(col("is_current") === 1,
        col("valid_from_ns")).otherwise(lit(null).cast("long")))
    val untouched = dimW.join(users, Seq("user_id"), "left_anti")
    val affected = dimW.join(users, Seq("user_id"), "left_semi")
    val closed = affected.filter(col("is_current") === 0)
    val open = affected.filter(col("is_current") === 1)
    // loud ordered-arrival check: one tiny per-affected-user aggregate
    val violations = events.groupBy(col("user_id"))
      .agg(min(col("ts_ns")).as("min_ts"))
      .join(open.select(col("user_id"), col("wm_ns")), Seq("user_id"))
      .filter(col("min_ts") < col("wm_ns")).count()
    require(violations == 0,
      s"$violations users carry batch events older than their applied " +
        "watermark — the changelog must arrive per-user ordered")
    val carry = open.select(col("user_id"),
      lit(Long.MinValue).as("event_id"),
      col("valid_from_ns").as("ts_ns"),
      col("state").as("event_type"),
      lit(0L).as("side"),
      col("ver").as("base_ver"),
      col("n_events").as("base_n"),
      col("wm_ns"))
    val ev = events.select(col("user_id"), col("event_id"), col("ts_ns"),
      col("event_type"), lit(1L).as("side"),
      lit(null).cast("long").as("base_ver"),
      lit(null).cast("long").as("base_n"),
      lit(null).cast("long").as("wm_ns"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns"), col("side"), col("event_id"))
    val marked = carry.unionByName(ev)
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(w).isNull ||
          lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("ver_local", sum(col("chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val groups = marked
      .groupBy(col("user_id"), col("ver_local"))
      // first() without ordering is safe here: every row of a
      // (user, ver_local) group carries the SAME event_type — a type
      // change is exactly what increments ver_local
      .agg(first(col("event_type")).as("state"),
        min(col("ts_ns")).as("valid_from_ns"),
        sum(col("side")).as("n_new"),
        max(lit(1L) - col("side")).as("has_carry"),
        max(col("ts_ns")).as("grp_max_ts"),
        max(col("base_ver")).as("bv"),
        max(col("base_n")).as("bn"),
        max(col("wm_ns")).as("old_wm"))
    // per-user constants ride a tiny second window (bv/bn/old_wm live on
    // the carry group only; every group of the user needs bv)
    val wu = Window.partitionBy(col("user_id"))
    val rebuilt = groups
      .withColumn("bv_u", max(col("bv")).over(wu))
      .withColumn("new_wm", greatest(max(col("grp_max_ts")).over(wu),
        max(col("old_wm")).over(wu)))
      .select(col("user_id"),
        when(col("bv_u").isNull, col("ver_local"))
          .otherwise(col("bv_u") + col("ver_local") - 1).as("ver"),
        col("state"), col("valid_from_ns"),
        (col("n_new") + when(col("has_carry") === 1L, col("bn"))
          .otherwise(lit(0L))).as("n_events"),
        col("new_wm"))
    val wv = Window.partitionBy(col("user_id")).orderBy(col("ver"))
    val openRebuilt = rebuilt
      .withColumn("valid_to_ns",
        coalesce(lead(col("valid_from_ns"), 1).over(wv), lit(-1L)))
      .withColumn("is_current", (col("valid_to_ns") === -1L).cast("int"))
      .withColumn("wm_ns", when(col("is_current") === 1, col("new_wm"))
        .otherwise(lit(null).cast("long")))
      .select(scd2Schema.fieldNames.map(col).toSeq: _*)
    untouched.select(scd2Schema.fieldNames.map(col).toSeq: _*)
      .unionByName(closed.select(scd2Schema.fieldNames.map(col).toSeq: _*))
      .unionByName(openRebuilt)
  }

  /** Latest committed SCD2 snapshot strictly BEFORE `beforeId`:
    * `snap_<k>` directories carrying the `_SUCCESS` marker, max k.
    * Torn writes (no marker) are invisible — exactly the
    * [[idempotentBatchSink]] recovery unit, applied to whole-dimension
    * snapshots. */
  private def latestScd2Snapshot(fs: org.apache.hadoop.fs.FileSystem,
      dimDir: String, beforeId: Long): Option[org.apache.hadoop.fs.Path] = {
    val root = new org.apache.hadoop.fs.Path(dimDir)
    if (!fs.exists(root)) None
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("snap_"))
      .flatMap { st =>
        val id = st.getPath.getName.stripPrefix("snap_").toLongOption
        id.filter(k => k < beforeId && fs.exists(
          new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
          .map(k => k -> st.getPath)
      }
      .sortBy(_._1).lastOption.map(_._2)
  }

  /** Read the current stream-maintained dimension — the q154 schema
    * (bookkeeping column dropped). */
  def scd2Snapshot(spark: SparkSession, dimDir: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(dimDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    latestScd2Snapshot(fs, dimDir, Long.MaxValue) match {
      case Some(p) => spark.read.parquet(p.toString).drop("wm_ns")
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(scd2Schema.dropRight(1)))
    }
  }

  /** `foreachBatch` SCD2 maintenance sink: apply the micro-batch
    * changelog to the latest committed snapshot and commit the next one
    * under `snap_<batchId>`. Exactly-once by the snapshot recovery unit:
    * a REPLAYED id whose snapshot already carries `_SUCCESS` is a no-op;
    * a torn write has no marker, is invisible to [[latestScd2Snapshot]],
    * and the replay overwrites it whole — and because the input is
    * always the latest snapshot with id < batchId, a replay reads the
    * SAME input the original attempt did. */
  def scd2MaintainSink(dimDir: String)(batch: DataFrame, id: Long): Unit = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(dimDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // recovery-unit validation (the selfIndexingGate rule, applied to
    // snapshots): a COMMITTED snapshot strictly AHEAD of this batch id
    // means the stream's checkpoint was reset or points elsewhere —
    // proceeding would write an early snapshot while readers keep
    // seeing the stale later one as "latest". Fail loudly instead.
    val root = new org.apache.hadoop.fs.Path(dimDir)
    if (fs.exists(root)) fs.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith("snap_"))
        n.stripPrefix("snap_").toLongOption.foreach { k =>
          require(k <= id || !fs.exists(
            new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")),
            s"dimension at $dimDir already carries committed snap_$k " +
              s"ahead of batch $id — checkpoint reset? refusing to " +
              "fork history; clear the dimension or restore the checkpoint")
        }
    }
    val target = new org.apache.hadoop.fs.Path(s"$dimDir/snap_$id")
    if (!fs.exists(new org.apache.hadoop.fs.Path(target, "_SUCCESS"))) {
      val dim = latestScd2Snapshot(fs, dimDir, id) match {
        case Some(p) => spark.read.parquet(p.toString)
        case None => spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], scd2Schema)
      }
      val next = scd2ApplyBatch(dim,
        batch.select(col("user_id"), col("event_id"), col("ts_ns"),
          col("event_type")))
      next.write.mode("overwrite").parquet(target.toString)
    }
  }

  /** Wire a changelog stream into [[scd2MaintainSink]] — the streaming
    * face of q154: drain the backlog (AvailableNow), one snapshot per
    * micro-batch, exactly-once across restarts via the checkpoint +
    * snapshot recovery units. */
  def runScd2Maintain(stream: DataFrame, dimDir: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        scd2MaintainSink(dimDir)(batch, id)
      }
      .start()

  /** Stream-stream interval join: match each left event with right events
    * of the same key that happened inside the preceding `window`. Both
    * sides carry a watermark and the join condition bounds event-time
    * distance — together that is what lets Spark EVICT join state (a
    * keyed stream-stream join without a time-range condition buffers both
    * streams forever). State per key is O(events inside the watermark
    * horizon), independent of stream length.
    *
    * The right side's key column is renamed internally so callers can
    * join two projections of the same source without ambiguity. */
  def intervalJoinStreams(left: DataFrame, right: DataFrame, key: String,
      leftTs: String = "l_ts_ns", rightTs: String = "r_ts_ns",
      window: String = "30 minutes", watermark: String = "2 hours"): DataFrame = {
    val l = normalizeNs(left, leftTs)
      .withColumn("l_evt", timestamp_micros(expr(s"$leftTs div 1000")))
      .withWatermark("l_evt", watermark)
    val r = normalizeNs(right, rightTs).withColumnRenamed(key, s"${key}_r")
      .withColumn("r_evt", timestamp_micros(expr(s"$rightTs div 1000")))
      .withWatermark("r_evt", watermark)
    l.join(r, col(key) === col(s"${key}_r") &&
        col("r_evt") >= col("l_evt") - expr(s"INTERVAL $window") &&
        col("r_evt") <= col("l_evt"))
      .drop(s"${key}_r")
  }

  /** Event-time session windows via the built-in `session_window`: the
    * declarative face of [[StatefulSessionize]] — dynamic-gap windows
    * merge as events arrive, watermark closes (and emits) sessions whose
    * gap has provably expired, and state is O(open sessions). */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    sessionWindowsDynamic(events, lit(gap), watermark)

  /** Dynamic-gap session windows: the gap is an EXPRESSION evaluated per
    * event (e.g. `when(col("event_type") === "purchase", "90 minutes")
    * .otherwise("30 minutes")`) — the session definition real funnels
    * need, where a checkout keeps a session alive longer than a
    * pageview. Same state story as the fixed-gap form: windows merge as
    * events arrive, the watermark closes (and emits) sessions whose
    * maximum possible extension has provably expired, state is O(open
    * sessions). */
  def sessionWindowsDynamic(events: DataFrame, gapExpr: Column,
      watermark: String = "2 hours"): DataFrame =
    normalizeNs(events, "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gapExpr))
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("n_events"))

  /** Streaming count-min sketch — the streaming face of the batch heavy-
    * hitter pass (q102): every token hashes into depth×width cells and the
    * grouped counts ARE the sketch, so aggregation state is bounded by
    * depth·width CELLS regardless of stream length or key cardinality —
    * the property that makes frequency tracking viable on an unbounded
    * stream (per-token state would grow with the vocabulary forever).
    * Works on a static frame too (the parity test runs both); on a
    * stream, run with complete/update mode — cells only ever increase.
    *
    * Unlike the batch q102 (which pre-aggregates per-token counts before
    * fanning out ×depth), a streaming query gets ONE aggregation, so the
    * fan-out happens on the raw token stream — the constant-factor price
    * of the single-agg restriction, paid map-side. */
  def countMinCells(tokens: DataFrame, tokenCol: String = "tok",
      depth: Int = 4, width: Int = 1024): DataFrame = {
    val rows = (0 until depth).map { j =>
      struct(lit(j).as("j"),
        (graft.functions.TextFns.h32(concat(lit(s"cm${j}_"), col(tokenCol)))
          % width).as("b"))
    }
    tokens
      .select(explode(array(rows: _*)).as("jb"))
      .groupBy(col("jb.j").as("j"), col("jb.b").as("b"))
      .agg(count(lit(1)).as("cell"))
  }

  /** Streaming windowed approximate-distinct via the [[graft.functions.Hll]]
    * sketch — `count(distinct user)` per event-time window on a stream,
    * with 64 bytes of aggregation state per open window instead of a
    * per-user state map (an exact streaming distinct keeps every key it
    * has seen inside the watermark horizon; the sketch is the version
    * whose state does not grow with cardinality). Watermark bounds how
    * long windows stay open; the register buffers are mergeable by max,
    * so partial aggregation works across micro-batches exactly as it
    * does map-side in batch. Takes a `ts_ns` event-time column in either
    * fixture encoding. */
  def approxDistinctUsers(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    normalizeNs(events, "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .withWatermark("ts", watermark)
      .withColumn("h",
        graft.functions.TextFns.h32(concat(lit("u_"), col("user_id"))))
      .groupBy(window(col("ts"), window_).as("w"))
      .agg(graft.functions.Hll.approxDistinct(col("h")).as("approx_users"),
        count(lit(1)).as("n_events"))
      .select(col("w.start").as("win_start"), col("approx_users"),
        col("n_events"))

  /** Graceful drain: finish the in-flight batch, then stop — the SIGTERM
    * contract (launcher.py:151-157). `awaitTermination` after `stop()` is
    * what "finish in-flight" means for a micro-batch engine. */
  def stopGracefully(q: StreamingQuery, timeoutMs: Long = 60000): Boolean = {
    q.stop()
    q.awaitTermination(timeoutMs)
  }
}
