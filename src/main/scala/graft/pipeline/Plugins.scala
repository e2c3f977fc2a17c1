package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.Instant

/** The plugin chain — the engine's operator surface, mirroring the
  * reference's `fun(job)` plugins (doc/source/plugins.rst:4-11) as pure
  * `PipelineContext => PipelineContext` transforms over immutable state.
  *
  * Laziness contract (the heart of the reference's design,
  * plugins/__init__.py:394-395): every plugin up to [[SaveDatasets]] only
  * *builds* DataFrames — Catalyst holds the logical plans exactly like
  * dask holds the delayed graph — and SaveDatasets' write actions are the
  * only compute triggers. Shared upstream frames are computed once per
  * write unless persisted; [[CheckValidDataFraction]] persists before its
  * data-dependent check just as the reference calls dask.persist
  * (plugins/__init__.py:1014-1032).
  */
final case class WrittenFile(
    area: Option[String], product: String, format: String,
    path: String, rows: Long, bytes: Long)

final case class PipelineContext(
    spark: SparkSession,
    spec: ProductList,
    /** Message/batch metadata (the reference's `input_mda`). */
    metadata: Map[String, String],
    /** The Scene analog: product frames per area key (None = native). */
    frames: Map[Option[String], DataFrame],
    worklist: Seq[WorkItem],
    manifest: Seq[WrittenFile] = Seq.empty,
    /** Set by aborting plugins (`AbortProcessing`, launcher.py:456-457):
      * downstream plugins become no-ops; the runner logs and moves on. */
    aborted: Option[String] = None) {
  def abort(reason: String): PipelineContext = copy(aborted = Some(reason))
}

trait Plugin extends Serializable {
  def name: String
  def apply(ctx: PipelineContext): PipelineContext
  /** Lifecycle teardown (class plugins' `stop()`,
    * plugins/__init__.py:570-579). */
  def stop(): Unit = ()
}

object Plugins {

  /** `create_scene` (plugins/__init__.py:86-99): open inputs with a named
    * reader into the native-projection frame. Reader failure aborts the
    * job, matching the reference's AbortProcessing. */
  final case class CreateScene(paths: Seq[String], reader: String = "parquet")
      extends Plugin {
    val name = "create_scene"
    def apply(ctx: PipelineContext): PipelineContext =
      if (ctx.aborted.isDefined) ctx
      else try {
        val df = ctx.spark.read.format(reader).load(paths: _*)
        ctx.copy(frames = ctx.frames + (None -> df))
      } catch {
        case e: Exception => ctx.abort(s"create_scene failed: ${e.getMessage}")
      }
  }

  /** `load_composites` (plugins/__init__.py:102-121): declare derived
    * product columns. Derivations are SQL expressions over the scene frame;
    * shared inputs are deduplicated by Catalyst's common-subexpression
    * reuse, and generation is naturally delayed past resampling
    * (`delay_composites` — free under lazy plans). */
  final case class LoadComposites(derived: Map[String, String]) extends Plugin {
    val name = "load_composites"
    def apply(ctx: PipelineContext): PipelineContext =
      if (ctx.aborted.isDefined) ctx
      else ctx.frames.get(None) match {
        case None => ctx.abort("load_composites: no scene")
        case Some(df) =>
          val out = derived.foldLeft(df) { case (d, (colName, sqlExpr)) =>
            d.withColumn(colName, expr(sqlExpr))
          }
          ctx.copy(frames = ctx.frames + (None -> out))
      }
  }

  /** `check_metadata` (plugins/__init__.py:687-714): abort the whole job
    * if a metadata value is outside the allowed list, or the batch is too
    * old (negative maxAgeMinutes = max age, the reference's convention). */
  final case class CheckMetadata(
      allowed: Map[String, Seq[String]] = Map.empty,
      startTimeKey: String = "start_time",
      maxAgeMinutes: Option[Long] = None,
      now: () => Instant = () => Instant.now()) extends Plugin {
    val name = "check_metadata"
    def apply(ctx: PipelineContext): PipelineContext =
      if (ctx.aborted.isDefined) ctx
      else {
        val badKey = allowed.collectFirst {
          case (k, vs) if ctx.metadata.get(k).exists(v => !vs.contains(v)) =>
            s"$k=${ctx.metadata(k)} not in ${vs.mkString(",")}"
        }
        val tooOld = maxAgeMinutes.flatMap { age =>
          ctx.metadata.get(startTimeKey).flatMap { ts =>
            val start = Instant.parse(ts)
            val ageMin = java.time.Duration.between(start, now()).toMinutes
            if (age < 0 && ageMin > -age) Some(s"$startTimeKey older than ${-age} min")
            else if (age > 0 && ageMin < age) Some(s"$startTimeKey younger than $age min")
            else None
          }
        }
        badKey.orElse(tooOld).map(ctx.abort).getOrElse(ctx)
      }
  }

  /** `metadata_alias` (plugins/__init__.py:717-736): rewrite metadata
    * values through an alias map; unknown values pass through. */
  final case class MetadataAlias(aliases: Map[String, Map[String, String]])
      extends Plugin {
    val name = "metadata_alias"
    def apply(ctx: PipelineContext): PipelineContext =
      if (ctx.aborted.isDefined) ctx
      else ctx.copy(metadata = ctx.metadata.map { case (k, v) =>
        k -> aliases.get(k).flatMap(_.get(v)).getOrElse(v)
      })
  }

  /** `aggregate` (plugins/__init__.py:124-130): block-downsample the scene
    * raster by integer pixel blocks — groupBy on bucketed coords, partial
    * aggregation map-side. */
  final case class Aggregate(xFactor: Int, yFactor: Int,
      yCol: String = "y", xCol: String = "x", valueCol: String = "value")
      extends Plugin {
    require(xFactor > 0 && yFactor > 0, "block factors must be positive")
    val name = "aggregate"
    def apply(ctx: PipelineContext): PipelineContext =
      if (ctx.aborted.isDefined) ctx
      else ctx.copy(frames = ctx.frames.map { case (area, df) =>
        val keys = df.columns.filterNot(c => c == yCol || c == xCol || c == valueCol)
        area -> df
          .groupBy((keys.map(col) :+ expr(s"$yCol div $yFactor").as(yCol)
            :+ expr(s"$xCol div $xFactor").as(xCol)): _*)
          .agg(avg(col(valueCol)).as(valueCol))
      })
  }

  /** `resample` (plugins/__init__.py:133-201): produce one frame per target
    * area by remapping source cells into the target grid (area-average).
    * `reduceData=true` crops the source to the target bounding box first —
    * the predicate pushes into the parquet scan. The native (None) frame
    * passes through, as the reference's `null` area does. */
  final case class Resample(
      targets: Seq[ResampleTarget],
      yCol: String = "y", xCol: String = "x", valueCol: String = "value",
      reduceData: Boolean = true) extends Plugin {
    val name = "resample"
    def apply(ctx: PipelineContext): PipelineContext =
      if (ctx.aborted.isDefined) ctx
      else ctx.frames.get(None) match {
        case None => ctx.abort("resample: no scene")
        case Some(src) =>
          val resampled = targets.map { t =>
            val cropped =
              if (reduceData)
                src.filter(col(yCol) >= t.srcYMin && col(yCol) < t.srcYMax &&
                           col(xCol) >= t.srcXMin && col(xCol) < t.srcXMax)
              else src
            val keys = src.columns.filterNot(c => c == yCol || c == xCol || c == valueCol)
            val out = cropped
              .groupBy((keys.map(col)
                :+ expr(s"(($yCol - ${t.srcYMin}) * ${t.height}) div ${t.srcYMax - t.srcYMin}").as(yCol)
                :+ expr(s"(($xCol - ${t.srcXMin}) * ${t.width}) div ${t.srcXMax - t.srcXMin}").as(xCol)): _*)
              .agg(avg(col(valueCol)).as(valueCol))
            Option(t.area) -> out
          }
          ctx.copy(frames = ctx.frames ++ resampled)
      }
  }
  final case class ResampleTarget(area: String, width: Int, height: Int,
      srcYMin: Long, srcYMax: Long, srcXMin: Long, srcXMax: Long)

  /** `check_valid_data_fraction` (plugins/__init__.py:955-1079): persist
    * the scene once, compute per-product valid fractions in ONE aggregate
    * pass, drop failing work-list items. Data-dependent pruning — the only
    * plugin that triggers compute before save, exactly like the reference. */
  final case class CheckValidDataFraction(
      minFraction: Double, productCol: String = "product",
      valueCol: String = "value") extends Plugin {
    val name = "check_valid_data_fraction"
    def apply(ctx: PipelineContext): PipelineContext =
      if (ctx.aborted.isDefined) ctx
      else {
        val checked = ctx.frames.toSeq.collect {
          case (area @ Some(_), df) => (area: Option[String]) -> df
        }
        val fractions: Map[(Option[String], String), Double] = checked.flatMap {
          case (area, df) =>
            val persisted = df.persist()
            try {
              persisted
                .groupBy(col(productCol))
                .agg(avg(col(valueCol).isNotNull.cast("double")).as("frac"))
                .collect()
                .map(r => (area, r.getString(0)) -> r.getDouble(1))
                .toSeq
            } finally { persisted.unpersist() }
        }.toMap
        val pruned = ctx.worklist.filter { item =>
          item.area.isEmpty ||
            fractions.get((item.area, item.product)).forall(_ >= minFraction)
        }
        ctx.copy(worklist = pruned)
      }
  }

  /** trollsift-style `compose` (used at plugins/__init__.py:211-212):
    * fill `{key}` and `{key:%FMT}` placeholders from metadata + work-item
    * settings. Delegates to [[graft.functions.Compose]], which also exposes
    * the same semantics as a codegen'd Catalyst expression (`compose_tpl`)
    * for row-level use. */
  def compose(pattern: String, values: Map[String, String]): String =
    graft.functions.Compose.compose(pattern, values)

  /** `save_datasets` + `prepared_filename` (plugins/__init__.py:330-395,
    * 207-255): for every work-list item, write the product slice of its
    * area frame with the named writer to a *temporary* directory, then
    * atomically rename into place after a successful write (tmp + rename
    * commit, W3) and record it in the manifest. Writers: parquet / csv /
    * json (format-specific options via item settings `writer_opt.*`).
    *
    * Batching: all sink plans are built first, then executed; per-sink
    * Spark jobs run back-to-back on shared persisted upstreams if the
    * caller persisted them (single-action batching analog,
    * plugins/__init__.py:392-395). `eagerWriting` forces immediate
    * per-item execution order (doc/source/plugins.rst:162-167).
    *
    * `stagingZone` (plugins/__init__.py:223-255, 317-327): when set, files
    * are written (tmp + rename) inside the staging directory and moved to
    * `outDir` only after the write succeeds — the reference's two-hop
    * commit for sinks where the final location is slow/remote.
    * `overviews` (W5, plugins/__init__.py:928-944): per written raster,
    * also write reduced-resolution copies (block-mean by each factor) as
    * `<fname>.ov<factor>` siblings — the columnar analog of embedded
    * GeoTIFF overview levels. */
  final case class SaveDatasets(
      outDir: String, fnamePattern: String = "{area}_{product}.{format}",
      productCol: String = "product", eagerWriting: Boolean = false,
      stagingZone: Option[String] = None, overviews: Seq[Int] = Seq.empty,
      yCol: String = "y", xCol: String = "x", valueCol: String = "value")
      extends Plugin {
    require(overviews.forall(_ > 1), s"overview factors must be > 1: $overviews")
    val name = "save_datasets"
    def apply(ctx: PipelineContext): PipelineContext =
      if (ctx.aborted.isDefined) ctx
      else {
        Files.createDirectories(Paths.get(outDir))
        stagingZone.foreach(s => Files.createDirectories(Paths.get(s)))
        val writes: Seq[() => Seq[WrittenFile]] = ctx.worklist.map { item =>
          () => writeOne(ctx, item)
        }
        // eager vs batched is about *when* each action fires; with lazy
        // plans the build cost is identical, so we just run in order.
        val manifest = writes.flatMap(w => w())
        ctx.copy(manifest = ctx.manifest ++ manifest)
      }

    private def writeOne(ctx: PipelineContext, item: WorkItem): Seq[WrittenFile] = {
      ctx.frames.get(item.area).orElse(ctx.frames.get(None)).toSeq.flatMap { frame =>
        // unknown product -> skip with warning (KeyError skip, W2)
        val slice = frame.filter(col(productCol).isin(item.members: _*))
        val writer = item.settings.getOrElse("writer", formatWriter(item.format))
        val fname = compose(fnamePattern,
          ctx.metadata ++ item.settings +
            ("area" -> item.area.getOrElse("native")) +
            ("product" -> item.product) + ("format" -> item.format))
        if (slice.isEmpty) Seq.empty // product missing from scene -> skip (P1)
        else {
          val main = commitWrite(slice, writer, fname, item)
          val ovs = overviews.flatMap { factor =>
            if (!slice.columns.contains(yCol) || !slice.columns.contains(xCol))
              None
            else {
              val keys = slice.columns
                .filterNot(c => c == yCol || c == xCol || c == valueCol)
              val down = slice
                .groupBy((keys.map(col) :+ expr(s"$yCol div $factor").as(yCol)
                  :+ expr(s"$xCol div $factor").as(xCol)): _*)
                .agg(avg(col(valueCol)).as(valueCol))
              Some(commitWrite(down, writer, s"$fname.ov$factor", item))
            }
          }
          main +: ovs
        }
      }
    }

    /** Write through the staging zone (if any) with tmp + atomic rename at
      * every hop; returns the manifest entry for the final location. */
    private def commitWrite(df: DataFrame, writer: String, fname: String,
                            item: WorkItem): WrittenFile = {
      val stageDir = stagingZone.getOrElse(outDir)
      val stagedPath = Paths.get(stageDir, fname)
      val tmpPath = Paths.get(stageDir, s".tmp_${System.nanoTime()}_$fname")
      try {
        val rows = df.count()
        df.write.mode("overwrite").format(writer).save(tmpPath.toString)
        atomicRename(tmpPath, stagedPath)
        val finalPath =
          if (stagingZone.isDefined) {
            val dst = Paths.get(outDir, fname)
            atomicRename(stagedPath, dst)
            dst
          } else stagedPath
        WrittenFile(item.area, item.product, item.format,
          finalPath.toString, rows, dirSize(finalPath))
      } catch {
        case e: Exception =>
          deleteRecursively(tmpPath)
          throw new RuntimeException(
            s"save_datasets failed for ${item.product}: ${e.getMessage}", e)
      }
    }
    private def formatWriter(format: String): String = format match {
      case "tif" | "parquet" => "parquet" // geotiff stand-in: columnar sink
      case "csv" => "csv"
      case "json" => "json"
      case other => other
    }
    private def atomicRename(tmp: Path, dst: Path): Unit = {
      deleteRecursively(dst)
      Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
    }
    private def dirSize(p: Path): Long = {
      val s = Files.walk(p)
      try s.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum
      finally s.close()
    }
    private def deleteRecursively(p: Path): Unit = if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally s.close()
    }
  }

  /** `check_results` (launcher.py:90-143): audit the manifest — every
    * produced file must exist and be non-empty; returns the failures so
    * the runner can report exactly like the reference's exit-code check. */
  final case class CheckResults() extends Plugin {
    val name = "check_results"
    def apply(ctx: PipelineContext): PipelineContext =
      if (ctx.aborted.isDefined) ctx
      else {
        val bad = ctx.manifest.filter(f =>
          !Files.exists(Paths.get(f.path)) || f.bytes == 0L || f.rows == 0L)
        if (bad.nonEmpty)
          ctx.abort(s"check_results: ${bad.size} empty/missing outputs: " +
            bad.map(_.path).mkString(", "))
        else ctx
      }
  }

  /** `FilePublisher` (plugins/__init__.py:476-579): one message per
    * produced file, topic from a compose template. Messages surface as a
    * DataFrame (the Kafka-producer analog: at scale this frame IS the
    * payload handed to a `kafka` sink / foreachBatch publisher). */
  final case class FilePublisher(topicPattern: String = "/file/{product}")
      extends Plugin {
    val name = "file_publisher"
    @volatile private[pipeline] var stopped = false
    def messages(ctx: PipelineContext): DataFrame = {
      import ctx.spark.implicits._
      ctx.manifest.map { f =>
        (compose(topicPattern, ctx.metadata +
            ("area" -> f.area.getOrElse("native")) +
            ("product" -> f.product) + ("format" -> f.format)),
          f.path, f.product, f.area.getOrElse("native"), f.rows, f.bytes)
      }.toDF("topic", "uri", "product", "area", "rows", "bytes")
    }
    def apply(ctx: PipelineContext): PipelineContext = ctx
    override def stop(): Unit = { stopped = true }
  }
}
