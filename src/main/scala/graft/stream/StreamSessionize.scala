package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization with CUSTOM state —
  * `flatMapGroupsWithState` over a `KeyValueGroupedDataset` (the
  * Structured Streaming custom-state surface; the batch twin with
  * identical semantics is [[graft.ext.Sessionize]]).
  *
  * Per key the state is ONE record: the open session (id, span, count),
  * or a closed sentinel holding only the id counter. Each micro-batch
  * folds its events in event-time order: a gap larger than `gapMs`
  * closes the open session (emitted downstream, append mode) and starts
  * the next. An event-time timeout set to `lastTs + gapMs` closes idle
  * sessions once the watermark passes; the sentinel then persists for
  * `idRetentionMs` so (user_id, session_id) numbering stays monotone
  * across idle periods. State is one small record per key seen within
  * the retention horizon; every session is emitted exactly once.
  *
  * Late events (behind the watermark) are dropped by Spark before the
  * state function runs — the standard watermark contract; the batch
  * operator is the replayable source of truth for backfills.
  */
object StreamSessionize {

  /** Input: one event per row, event-time `ts` must carry a watermark. */
  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)

  /** Open-session state held per key between micro-batches. */
  final case class OpenSession(sessionId: Long, startMs: Long, lastMs: Long, n: Long)

  /** Emitted once per closed session. */
  final case class ClosedSession(user_id: Long, session_id: Long,
                                 n_events: Long, start_ms: Long, end_ms: Long)

  /** Wire onto a streaming Dataset[SessionEvent] that already has
    * `withWatermark("ts", …)` applied.
    *
    * Session-id continuity: after a timeout-close the state is NOT
    * removed — it collapses to a closed SENTINEL (`n = 0`) carrying the
    * id counter, so a returning key continues monotone numbering and
    * (user_id, session_id) stays unique. The sentinel holds its own
    * timeout of `idRetentionMs`; a key absent that long is dropped from
    * state entirely (ids restart at 1 — the bounded-state tradeoff,
    * made explicit instead of silently resetting on every close). */
  def sessions(events: Dataset[SessionEvent], gapMs: Long,
               idRetentionMs: Long = Long.MaxValue / 4): Dataset[ClosedSession] = {
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            if (s.n == 0) { // sentinel expired: forget the key
              state.remove()
              Iterator.empty
            } else {
              // watermark passed lastMs + gap: the open session is final;
              // keep the counter as a sentinel for id continuity
              state.update(s.copy(n = 0))
              state.setTimeoutTimestamp(s.lastMs + math.min(
                idRetentionMs, Long.MaxValue / 2 - s.lastMs))
              Iterator.single(ClosedSession(uid, s.sessionId, s.n, s.startMs, s.lastMs))
            }
          } else {
            val sorted = evs.map(e => e.ts.getTime).toArray.sorted
            var open = state.getOption
            val closed = List.newBuilder[ClosedSession]
            sorted.foreach { t =>
              open match {
                case Some(s) if s.n > 0 && t - s.lastMs <= gapMs =>
                  open = Some(s.copy(lastMs = math.max(s.lastMs, t), n = s.n + 1))
                case Some(s) if s.n > 0 => // gap exceeded: close, open the next
                  closed += ClosedSession(uid, s.sessionId, s.n, s.startMs, s.lastMs)
                  open = Some(OpenSession(s.sessionId + 1, t, t, 1))
                case Some(sentinel) => // closed sentinel: continue numbering
                  open = Some(OpenSession(sentinel.sessionId + 1, t, t, 1))
                case None =>
                  open = Some(OpenSession(1L, t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              // close via timeout when the watermark passes the gap
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
