package graft.pipeline

import scala.concurrent.duration.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.StreamRunner

/** The full launcher path (launcher.py:500-514 → `process_files`,
  * launcher.py:403-408) as one composition: parse a config document with
  * the safe [[ProductListLoader]], resolve its `workers:` chain through
  * [[PluginRegistry]], and run it — either over one in-hand message
  * (`runOnce`, the reference's `test_message` path) or over a message
  * stream (`run`, the subscriber loop re-expressed as
  * [[StreamRunner.runMessages]]'s sequential per-message foreachBatch).
  *
  * The chain is rebuilt per message because `create_scene` needs the
  * message's file list (launcher.py:287) — exactly the reference's
  * per-job plugin invocation; everything else about the chain is
  * config-static. */
object Launcher {

  /** Parse `configText` as YAML (the pl.yaml shape). JSON documents work
    * too — YAML is a superset for the shapes the loader accepts. */
  def load(configText: String): LoadedConfig =
    ProductListLoader.fromYaml(configText)

  /** One message (the `--test-message` path, launcher.py:259-266):
    * build the chain for the message's files and run every priority
    * slice. */
  def runOnce(spark: SparkSession, config: LoadedConfig, messageJson: String,
      timeoutPerPlugin: Duration = Duration.Inf,
      crashHandlers: Seq[Runner.CrashHandler] = Seq.empty): Seq[Runner.JobReport] = {
    val (ctx, paths) = Messages.toContext(spark, config.productList, messageJson)
    Runner.processJobs(ctx, PluginRegistry.chain(config, paths),
      timeoutPerPlugin, crashHandlers)
  }

  /** The subscriber loop: one pipeline run per message row, sequential
    * within a micro-batch (the reference's `proc.start(); proc.join()`
    * serialization). `messages` is any DataFrame whose first column is
    * the message JSON — a file/kafka/rate stream in production, a memory
    * stream in tests. */
  def run(spark: SparkSession, config: LoadedConfig, messages: DataFrame,
      checkpointDir: String,
      timeoutPerPlugin: Duration = Duration.Inf,
      crashHandlers: Seq[Runner.CrashHandler] = Seq.empty,
      availableNow: Boolean = true)
      (onReport: (String, Seq[Runner.JobReport]) => Unit): StreamingQuery =
    StreamRunner.runMessages(messages, config.productList, checkpointDir,
      paths => PluginRegistry.chain(config, paths),
      timeoutPerPlugin, crashHandlers, availableNow)(onReport)
}
