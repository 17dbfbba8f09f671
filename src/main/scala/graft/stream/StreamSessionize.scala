package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization with CUSTOM state —
  * `flatMapGroupsWithState` over a `KeyValueGroupedDataset` (the
  * Structured Streaming custom-state surface; the batch twin with
  * identical semantics is [[graft.ext.Sessionize]]).
  *
  * Per key the state is ONE open session (id, span, count). Each
  * micro-batch folds its events in event-time order: a gap larger than
  * `gapMs` closes the open session (emitted downstream, append mode)
  * and starts the next. An event-time timeout set to `lastTs + gapMs`
  * closes idle sessions once the watermark passes — so state size is
  * bounded by the number of ACTIVE keys, never by history, and every
  * session is emitted exactly once.
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
    * `withWatermark("ts", …)` applied. */
  def sessions(events: Dataset[SessionEvent], gapMs: Long): Dataset[ClosedSession] = {
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed lastMs + gap: the open session is final
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(uid, s.sessionId, s.n, s.startMs, s.lastMs))
          } else {
            val sorted = evs.map(e => e.ts.getTime).toArray.sorted
            var open = state.getOption
            val closed = List.newBuilder[ClosedSession]
            sorted.foreach { t =>
              open match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  open = Some(s.copy(lastMs = math.max(s.lastMs, t), n = s.n + 1))
                case Some(s) => // gap exceeded: close, open the next
                  closed += ClosedSession(uid, s.sessionId, s.n, s.startMs, s.lastMs)
                  open = Some(OpenSession(s.sessionId + 1, t, t, 1))
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
