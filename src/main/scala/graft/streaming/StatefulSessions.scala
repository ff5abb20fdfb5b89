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
  * gaps < gapSeconds; a session is EMITTED when the event-time
  * watermark passes its close (EventTimeTimeout), so results are final
  * — Append output mode.
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
            // events within a micro-batch are unordered: sort this
            // group's slice (bounded by batch size, not stream size)
            val sorted = it.map(e => (e.ts.getTime, e.value)).toSeq.sortBy(_._1)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { case (t, v) =>
              cur match {
                case Some(s) if t - s.end < gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.end, t),
                    s.n + 1, s.sum + v))
                case Some(s) =>
                  closed ::= out(uid, s)
                  cur = Some(SessionState(t, t, 1, v))
                case None =>
                  cur = Some(SessionState(t, t, 1, v))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // fire when the watermark passes the session close + gap
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
