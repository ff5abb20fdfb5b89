package graft

import java.sql.Timestamp

import graft.operators.Events
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(rows: (Long, String, String, Long)*) =
    rows.map { case (u, t, ty, id) => (u, ts(t), ty, id) }
      .toDF("user_id", "ts", "event_type", "event_id")

  // --- funnel ---

  test("funnel: a stage event BEFORE the previous stage's earliest " +
      "completion does not count; at-or-after does") {
    val df = ev(
      // user 1: view @10, click @20 -> converts both stages
      (1L, "2024-01-01 00:00:10", "view", 1L),
      (1L, "2024-01-01 00:00:20", "click", 2L),
      // user 2: click @05 BEFORE view @10 -> stage 2 not reached
      (2L, "2024-01-01 00:00:05", "click", 3L),
      (2L, "2024-01-01 00:00:10", "view", 4L),
      // user 3: click at EXACTLY the view instant -> >= counts it
      (3L, "2024-01-01 00:00:10", "view", 5L),
      (3L, "2024-01-01 00:00:10", "click", 6L))
    val out = Events.funnel(df, "user_id", "ts", "event_type",
        Seq("view", "click"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out == Map("view" -> 3L, "click" -> 2L))
  }

  test("funnel: counts are monotonically non-increasing across stages " +
      "and a never-seen stage yields zero") {
    val df = ev(
      (1L, "2024-01-01 00:00:01", "view", 1L),
      (1L, "2024-01-01 00:00:02", "click", 2L),
      (2L, "2024-01-01 00:00:03", "view", 3L))
    val out = Events.funnel(df, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("stage_idx").collect().map(_.getLong(2))
    assert(out.toSeq == Seq(2L, 1L, 0L))
    assert(out.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("funnel: later-stage min must itself gate the NEXT stage (a " +
      "3-stage chain uses stage-2's qualifying min, not its global min)") {
    // user 1: click @5 (pre-view, ignored), view @10, click @20,
    // purchase @15 — purchase is before the QUALIFYING click (20) but
    // after the ignored one (5): must NOT convert
    val df = ev(
      (1L, "2024-01-01 00:00:05", "click", 1L),
      (1L, "2024-01-01 00:00:10", "view", 2L),
      (1L, "2024-01-01 00:00:20", "click", 3L),
      (1L, "2024-01-01 00:00:15", "purchase", 4L))
    val out = Events.funnel(df, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("stage_idx").collect().map(_.getLong(2))
    assert(out.toSeq == Seq(1L, 1L, 0L))
  }

  test("funnel: rejects an empty or duplicated stage list") {
    val df = ev((1L, "2024-01-01 00:00:01", "view", 1L))
    intercept[IllegalArgumentException] {
      Events.funnel(df, "user_id", "ts", "event_type", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Events.funnel(df, "user_id", "ts", "event_type", Seq("a", "a"))
    }
  }

  // --- cohort retention ---

  test("cohortRetention: users land in their first-event week; later " +
      "events fill the (cohort, offset) cells; offset 0 counts everyone") {
    val df = ev(
      // 2024-01-01 is a Monday: week starts are exact
      (1L, "2024-01-01 08:00:00", "view", 1L), // cohort W0
      (1L, "2024-01-09 08:00:00", "view", 2L), // W0 offset 1
      (1L, "2024-01-16 08:00:00", "view", 3L), // W0 offset 2
      (2L, "2024-01-03 08:00:00", "view", 4L), // cohort W0 (same week)
      (3L, "2024-01-10 08:00:00", "view", 5L)) // cohort W1
    val out = Events.cohortRetention(df, "user_id", "ts")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("2024-01-01", 0L) -> 2L,
      ("2024-01-01", 1L) -> 1L,
      ("2024-01-01", 2L) -> 1L,
      ("2024-01-08", 0L) -> 1L))
  }

  test("cohortRetention: a user active twice in one offset week counts " +
      "once (distinct users, not events)") {
    val df = ev(
      (1L, "2024-01-01 08:00:00", "view", 1L),
      (1L, "2024-01-02 08:00:00", "view", 2L),
      (1L, "2024-01-05 08:00:00", "view", 3L))
    val out = Events.cohortRetention(df, "user_id", "ts").collect()
    assert(out.length == 1)
    assert(out.head.getLong(2) == 1L)
  }

  // --- trajectories ---

  test("trajectories: events order by (ts, id) — id breaks the tie — " +
      "and n_events reports the untruncated total") {
    val df = ev(
      (1L, "2024-01-01 00:00:02", "click", 10L),
      (1L, "2024-01-01 00:00:01", "view", 11L),
      // same ts as event 10: lower id 9 must come first
      (1L, "2024-01-01 00:00:02", "error", 9L))
    val out = Events.trajectories(df, "user_id", "ts", "event_id",
      "event_type", maxLen = 10).collect().head
    assert(out.getLong(1) == 3L)
    assert(out.getString(2) == "view>error>click")
  }

  test("trajectories: maxLen truncates the string but not the count") {
    val df = ev((1L to 6L).map(i =>
      (1L, f"2024-01-01 00:00:0$i", s"t$i", i)): _*)
    val out = Events.trajectories(df, "user_id", "ts", "event_id",
      "event_type", maxLen = 3).collect().head
    assert(out.getLong(1) == 6L)
    assert(out.getString(2) == "t1>t2>t3")
    intercept[IllegalArgumentException] {
      Events.trajectories(df, "user_id", "ts", "event_id", "event_type", 0)
    }
  }
}
