package graft.pipeline

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Profiling/audit hooks — the analog of the reference's dask
  * `Profiler → bokeh HTML` wiring (cli.py:35-42), re-expressed over
  * Spark's two listener surfaces:
  *
  *   - [[JobCounter]] (a `SparkListener`): counts jobs/stages and sums
  *     shuffle bytes. [[Profiling.measure]] wraps a block with one and
  *     returns the delta — which also makes claims like "the valid-data
  *     check runs ONE job for any number of areas" or "one action per
  *     sink" machine-checkable in tests instead of manually observed.
  *   - [[AuditLogListener]] (a `QueryExecutionListener`): one log line
  *     per completed ACTION (sink write, collect) with the action name,
  *     wall time, and the executed plan's exchange count — the per-sink
  *     dashboard line an operator tails in production.
  *
  * (The Spark UI covers interactive profiling; these hooks exist for
  * headless runs — GraftSession disables the UI — and for asserting job
  * counts in specs.) */
object Profiling {

  final case class Snapshot(jobs: Int, stages: Int,
      shuffleWriteBytes: Long, shuffleReadBytes: Long)

  /** Job/stage/shuffle counter. Listener callbacks are async (the
    * listener bus), so readers must drain before trusting totals —
    * [[Profiling.measure]] handles that. */
  final class JobCounter extends SparkListener {
    private[Profiling] val jobs = new AtomicInteger
    private[Profiling] val stages = new AtomicInteger
    private[Profiling] val shuffleWrite = new AtomicLong
    private[Profiling] val shuffleRead = new AtomicLong

    override def onJobStart(job: SparkListenerJobStart): Unit =
      jobs.incrementAndGet()

    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      }
    }

    def snapshot: Snapshot =
      Snapshot(jobs.get, stages.get, shuffleWrite.get, shuffleRead.get)
  }

  /** Run `body` under a fresh [[JobCounter]] and return its result with
    * the jobs/stages/shuffle-bytes the block cost. Waits for the async
    * listener bus to drain (two consecutive identical snapshots) before
    * reporting, so counts are exact, not racy. */
  def measure[T](spark: SparkSession)(body: => T): (T, Snapshot) = {
    val counter = new JobCounter
    spark.sparkContext.addSparkListener(counter)
    try {
      val result = body
      var prev = counter.snapshot
      var stable = false
      var tries = 0
      while (!stable && tries < 50) {
        Thread.sleep(100)
        val cur = counter.snapshot
        stable = cur == prev
        prev = cur
        tries += 1
      }
      // an unstabilized snapshot is a measurement failure, not a smaller
      // measurement — surfacing it beats returning an undercount that
      // reads as a product regression
      if (!stable)
        throw new IllegalStateException(
          s"listener bus did not stabilize within 5s; last snapshot: $prev")
      (result, prev)
    } finally spark.sparkContext.removeSparkListener(counter)
  }

  /** One completed (or failed) Spark ACTION, structured: the unit of the
    * per-run audit report ([[graft.pipeline.Launcher.runOnce]]'s
    * `auditReport`) and of the human-readable log line. */
  final case class ActionAudit(action: String, wallMs: Long, exchanges: Int,
      rowsOut: Option[Long], error: Option[String] = None) {
    def logLine: String = error match {
      case Some(msg) => s"action=$action FAILED: $msg"
      case None => s"action=$action wall_ms=$wallMs exchanges=$exchanges" +
        rowsOut.map(r => s" rows_out=$r").getOrElse("")
    }
    def jsonLine: String = {
      val m = ActionAudit.mapper // shared: one audit line per action is a hot path
      val node = m.createObjectNode()
      node.put("action", action)
      node.put("wall_ms", wallMs)
      node.put("exchanges", exchanges)
      rowsOut.foreach(node.put("rows_out", _))
      error.foreach(node.put("error", _))
      m.writeValueAsString(node)
    }
  }

  object ActionAudit {
    /** ObjectMapper construction is heavyweight; writes are thread-safe,
      * so one shared instance serves every audit line. */
    private[Profiling] val mapper =
      new com.fasterxml.jackson.databind.ObjectMapper()
  }

  /** Structured per-action listener: one [[ActionAudit]] per completed
    * action (sink write, collect) with wall time, the executed plan's
    * exchange count, and rows when the root plan node exposes a
    * `numOutputRows` metric (writes and aggregates do). */
  class AuditListener(sink: ActionAudit => Unit) extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit = {
      val plan = qe.executedPlan
      val exchanges = plan.toString.linesIterator.count(_.contains("Exchange"))
      val rows = plan.metrics.get("numOutputRows").map(_.value)
      sink(ActionAudit(funcName, durationNs / 1000000, exchanges, rows))
    }
    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit =
      sink(ActionAudit(funcName, 0, 0, None, Some(exception.getMessage)))
  }

  /** The log-line form of [[AuditListener]] — the per-sink dashboard
    * line an operator tails in production. */
  final class AuditLogListener(log: String => Unit)
      extends AuditListener(a => log(a.logLine))

  /** Install an [[AuditLogListener]]; returns it so callers can remove
    * it via `spark.listenerManager.unregister`. */
  def installAuditLog(spark: SparkSession, log: String => Unit): AuditLogListener = {
    val l = new AuditLogListener(log)
    spark.listenerManager.register(l)
    l
  }

  /** Install a structured [[AuditListener]]; same unregister contract. */
  def installAudit(spark: SparkSession, sink: ActionAudit => Unit): AuditListener = {
    val l = new AuditListener(sink)
    spark.listenerManager.register(l)
    l
  }
}
