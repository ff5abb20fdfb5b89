package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state (SURVEY.md §2.9 "stateful ops"): explicit
  * session assembly with flatMapGroupsWithState — the hand-rolled
  * counterpart to StreamOps.sessionWindows for when a session must
  * carry arbitrary accumulated state (here: event count + value sum,
  * but the pattern extends to any fold).
  *
  * Semantics: a session is a run of events per user with inter-event
  * gaps < gapSeconds. Each batch merges its (sorted) events with the
  * one OPEN session held in state via interval merging — late events
  * that fall inside or before the open session merge correctly
  * (lowering session_start when needed); runs separated by >= gap
  * close. The LATEST session stays open in state and is emitted when
  * the event-time watermark passes its close (EventTimeTimeout);
  * earlier runs close as soon as a later run supersedes them —
  * best-effort finality, since state holds one open session per key. A
  * late event arriving after its session was emitted starts a fresh
  * (duplicate-range) session rather than retracting. For strictly
  * watermark-final sessions use StreamOps.sessionWindows
  * (session_window), which buffers per-window state in the engine.
  */
object StatefulSessions {

  case class Evt(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(start: Long, end: Long, n: Long, sum: Double)
  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  def sessions(stream: DataFrame, gapSeconds: Long,
      watermarkDelay: String): Dataset[SessionOut] = {
    implicit val evtEnc = Encoders.product[Evt]
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val longEnc = Encoders.scalaLong
    val evts = stream
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("ts"), col("value")).as[Evt]

    def out(uid: Long, s: SessionState): SessionOut =
      SessionOut(uid, new java.sql.Timestamp(s.start),
        new java.sql.Timestamp(s.end), s.n, s.sum)

    evts.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed session close: emit and clear
            val done = state.get
            state.remove()
            Iterator.single(out(uid, done))
          } else {
            val gapMs = gapSeconds * 1000L
            // interval merge: the open session from state plus this
            // batch's events, walked in start order — late events
            // merge into (and may extend the FRONT of) the open
            // session instead of being glued to its end
            val items = (state.getOption.toList ++
              it.map(e => SessionState(e.ts.getTime, e.ts.getTime, 1, e.value)))
              .sortBy(s => (s.start, s.end))
            var closed = List.empty[SessionOut]
            var open = Option.empty[SessionState]
            items.foreach { i =>
              open match {
                case Some(s) if i.start - s.end < gapMs =>
                  open = Some(SessionState(s.start, math.max(s.end, i.end),
                    s.n + i.n, s.sum + i.sum))
                case Some(s) =>
                  closed ::= out(uid, s)
                  open = Some(i)
                case None =>
                  open = Some(i)
              }
            }
            open.foreach { s =>
              state.update(s)
              // fire when the watermark passes the session close + gap
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
