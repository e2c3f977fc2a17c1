package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Per-key token-bucket admission over an event stream — the ingestion
  * throttle a large pipeline puts in front of expensive per-message work
  * (a runaway source must not starve everyone else; compare the
  * reference's one-job-per-message loop, which a hot topic can wedge).
  *
  * Custom state via `flatMapGroupsWithState`: each key holds exactly two
  * numbers (tokens, last event-time nanos) — O(active keys) state, like
  * [[StatefulSessionize]]. Refill is EVENT-TIME driven (tokens accrue
  * with the stream's own clock, not arrival time), which makes admission
  * a pure function of the event sequence AS DELIVERED: replaying the
  * stream in different micro-batch slicings admits exactly the same
  * events PROVIDED batch boundaries respect event-time order. Events are
  * sorted by event time only WITHIN a batch; a late event arriving in a
  * later micro-batch is folded after state already advanced past it, so
  * a slicing that lets late data cross batches can admit a different
  * set. `dropLate = true` installs the watermark-style guard: an event
  * with ts before the state's last refill instant is discarded instead
  * of folded, so the admitted set equals the one where the straggler
  * never arrived — admission becomes monotone in event time, which is
  * exactly the guarantee a watermark in front of the operator provides.
  *
  * Batch-mode note: `flatMapGroupsWithState` also runs on a static
  * Dataset (state lives for the single "batch"), so the same operator
  * body serves backfill and live streams.
  */
object RateLimiter {
  /** (user_id, ts_ns, event_id) → admitted (user_id, event_id, ts_ns). */
  type Ev = (Long, Long, Long)

  /** tokens remaining + last folded event's (event-time nanos, event id).
    * The id rides along so the `dropLate` guard can order equal-timestamp
    * events exactly the way the in-batch (ts, event_id) sort does —
    * lastNs alone cannot tell a tie-breaking straggler from a legitimate
    * same-instant successor. */
  final case class Bucket(tokens: Double, lastNs: Long, lastEid: Long = Long.MinValue)

  /** Admit up to `capacity` burst events per key, refilling at
    * `perSecond` tokens/s of EVENT time. Events inside a group are
    * processed in (ts, event_id) order so admission is deterministic
    * under any partition/arrival order. With `dropLate`, an event older
    * than the key's last refill instant (possible only across
    * micro-batch boundaries — within a batch events fold sorted) is
    * discarded rather than folded out of order. */
  def rateLimit(events: Dataset[Ev], capacity: Double = 5.0,
      perSecond: Double = 0.5, dropLate: Boolean = false): Dataset[(Long, Long, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Ev],
         state: org.apache.spark.sql.streaming.GroupState[Bucket]) =>
          val sorted = it.toSeq.sortBy(e => (e._2, e._3))
          if (sorted.isEmpty) Iterator.empty
          else {
            var b = state.getOption.getOrElse(
              Bucket(capacity, sorted.head._2))
            val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
            sorted.foreach { case (_, ts, eid) =>
              // straggler = ordered AT-OR-before the last folded event in
              // the same (ts, event_id) order the in-batch sort uses; can
              // only occur across micro-batch boundaries. <= on the id:
              // an EXACT redelivery (same ts, same event_id — the classic
              // at-least-once replay) must drop too, not fold a second
              // token spend (same reasoning as scd2ApplyBatch's
              // watermark-pair guard)
              val late = dropLate &&
                (ts < b.lastNs || (ts == b.lastNs && eid <= b.lastEid))
              if (!late) {
                val refill = (ts - b.lastNs).max(0L) / 1e9 * perSecond
                val tokens = (b.tokens + refill).min(capacity)
                if (tokens >= 1.0) {
                  b = Bucket(tokens - 1.0, ts, eid)
                  out += ((user, eid, ts))
                } else b = Bucket(tokens, ts, eid)
              }
            }
            state.update(b)
            out.iterator
          }
      }
  }

  /** Column-level convenience over the events schema; `ts_ns` is
    * normalized to int64 nanos whatever the physical encoding (see
    * [[StreamRunner.normalizeNs]]). */
  def rateLimitFrame(events: DataFrame, capacity: Double = 5.0,
      perSecond: Double = 0.5, dropLate: Boolean = false): DataFrame = {
    import events.sparkSession.implicits._
    rateLimit(
      StreamRunner.normalizeNs(events, "ts_ns")
        .select(col("user_id"), col("ts_ns"), col("event_id"))
        .as[Ev], capacity, perSecond, dropLate)
      .toDF("user_id", "event_id", "ts_ns")
  }
}
