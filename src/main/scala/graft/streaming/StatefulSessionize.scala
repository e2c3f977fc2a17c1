package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization via `flatMapGroupsWithState` — the
  * custom-state primitive (KeyValueGroupedDataset) the brief calls for.
  * Batch-equivalent of the q19 lag+cumsum sessionizer: a new session opens
  * after a silence longer than `gapNs`; state per user is three longs, so
  * memory is O(active users) regardless of event volume.
  *
  * Late-data contract (the bounded-state trade, stated plainly): with
  * three longs of state the updater cannot retroactively SPLIT a session,
  * so a cross-batch straggler — an event older than the user's lastTs —
  * folds into the open session and never opens one of its own, and lastTs
  * stays monotone so the straggler cannot make the NEXT on-time event mint
  * a spurious session either. Batch q19, which sorts the complete history,
  * WOULD count a separate session when the straggler sits a full gap
  * before everything else; streaming parity with q19 therefore holds
  * exactly for in-order delivery (the headline spec), while out-of-order
  * delivery degrades to fold-into-current — the same
  * no-rewind-under-late-data rule RateLimiter applies. Retroactive splits
  * need per-event state (the batch rebuild is the tool for that).
  */
object StatefulSessionize {
  final case class UserEvent(user_id: Long, ts_ns: Long)
  final case class SessState(nSessions: Long, nEvents: Long, lastTs: Long)
  final case class SessionUpdate(user_id: Long, n_sessions: Long, n_events: Long)

  /** Fold one micro-batch worth of a user's events into the running state.
    * Events are sorted by timestamp inside the batch (micro-batches arrive
    * time-ordered across batches; within a batch order is not guaranteed). */
  private def updateUser(gapNs: Long)(
      userId: Long, events: Iterator[UserEvent],
      state: GroupState[SessState]): Iterator[SessionUpdate] = {
    var st = state.getOption.getOrElse(SessState(0L, 0L, Long.MinValue))
    events.toSeq.sortBy(_.ts_ns).foreach { e =>
      val newSession = st.lastTs == Long.MinValue || e.ts_ns - st.lastTs > gapNs
      // lastTs stays MONOTONE: a cross-batch straggler (ts < lastTs)
      // folds into the current session but must not rewind the
      // watermark — a rewound lastTs would let the NEXT on-time event
      // open a spurious session against the straggler's old timestamp
      // (the same cross-batch guard RateLimiter carries)
      st = SessState(st.nSessions + (if (newSession) 1L else 0L),
        st.nEvents + 1L, math.max(st.lastTs, e.ts_ns))
    }
    state.update(st)
    Iterator(SessionUpdate(userId, st.nSessions, st.nEvents))
  }

  /** Per-user session counts over a (streaming or batch) Dataset of events.
    * Emits the updated totals for every user touched by the micro-batch. */
  def sessionCounts(events: Dataset[UserEvent],
                    gapNs: Long = 1800L * 1000 * 1000 * 1000): Dataset[SessionUpdate] = {
    implicit val stateEnc = Encoders.product[SessState]
    implicit val outEnc = Encoders.product[SessionUpdate]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        updateUser(gapNs))
  }
}
