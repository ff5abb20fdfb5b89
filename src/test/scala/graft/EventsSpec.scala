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

  // --- attribution ---

  private def evv(rows: (Long, String, String, Long, Double)*) =
    rows.map { case (u, t, ty, id, v) => (u, ts(t), ty, id, v) }
      .toDF("user_id", "ts", "event_type", "event_id", "value")

  private def attrib(df: org.apache.spark.sql.DataFrame) =
    Events.attribution(df, "user_id", "ts", "event_id", "event_type",
        "value", Seq("view", "click"), "purchase", lookbackSeconds = 3600)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(3))).toMap

  test("attribution: 3-touch path splits per model exactly") {
    val df = evv(
      (1L, "2024-01-01 10:00:00", "view", 1L, 0.0),
      (1L, "2024-01-01 10:10:00", "click", 2L, 0.0),
      (1L, "2024-01-01 10:20:00", "view", 3L, 0.0),
      (1L, "2024-01-01 10:30:00", "purchase", 4L, 90.0))
    val out = attrib(df)
    // first_touch: all to the first view; last_touch: all to the last view
    assert(out(("first_touch", "view")) == 90.0)
    assert(out(("first_touch", "click")) == 0.0)
    assert(out(("last_touch", "view")) == 90.0)
    // linear: 30 each -> view 60, click 30
    assert(out(("linear", "view")) == 60.0)
    assert(out(("linear", "click")) == 30.0)
    // position 40/20/40: first view 36, middle click 18, last view 36
    assert(out(("position", "view")) == 72.0)
    assert(out(("position", "click")) == 18.0)
  }

  test("attribution: degenerate paths (0, 1, 2 touches) and lookback") {
    val df = evv(
      // user 1: no touches at all -> (none)
      (1L, "2024-01-01 10:00:00", "purchase", 1L, 10.0),
      // user 2: single touch -> everything on it in every model
      (2L, "2024-01-01 10:00:00", "click", 2L, 0.0),
      (2L, "2024-01-01 10:01:00", "purchase", 3L, 20.0),
      // user 3: touch OUTSIDE the 1 h lookback -> (none)
      (3L, "2024-01-01 08:00:00", "view", 4L, 0.0),
      (3L, "2024-01-01 10:00:00", "purchase", 5L, 40.0),
      // user 4: touch AT the purchase instant is not strictly before
      (4L, "2024-01-01 10:00:00", "view", 6L, 0.0),
      (4L, "2024-01-01 10:00:00", "purchase", 7L, 80.0))
    val out = attrib(df)
    for (m <- Seq("first_touch", "last_touch", "linear", "position")) {
      assert(out((m, "(none)")) == 130.0, m) // 10 + 40 + 80
      assert(out((m, "click")) == 20.0, m)
      // every model conserves total conversion value
      assert(out.collect { case ((`m`, _), c) => c }.sum == 150.0, m)
    }
    // two-touch path: position collapses to 50/50 (= linear)
    val two = attrib(evv(
      (9L, "2024-01-01 10:00:00", "view", 1L, 0.0),
      (9L, "2024-01-01 10:01:00", "click", 2L, 0.0),
      (9L, "2024-01-01 10:02:00", "purchase", 3L, 50.0)))
    assert(two(("position", "view")) == 25.0)
    assert(two(("position", "click")) == 25.0)
    assert(two(("last_touch", "click")) == 50.0)
    assert(two(("first_touch", "view")) == 50.0)
  }

  test("attribution: conversion type must not be a touch type") {
    intercept[IllegalArgumentException] {
      Events.attribution(evv(), "user_id", "ts", "event_id", "event_type",
        "value", Seq("view", "purchase"), "purchase", 60)
    }
  }

  // --- ewmaByKey ---

  test("ewmaByKey: renormalized weights, hand-computed series") {
    val df = evv(
      (1L, "2024-01-01 00:00:01", "view", 1L, 1.0),
      (1L, "2024-01-01 00:00:02", "view", 2L, 2.0),
      (1L, "2024-01-01 00:00:03", "view", 3L, 4.0),
      // other key: independent series
      (2L, "2024-01-01 00:00:01", "view", 4L, 10.0))
    val out = Events.ewmaByKey(df, "user_id", "ts", "event_id", "value",
        alpha = 0.5, horizon = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert(out(1L) == 1.0) // first event: its own value
    assert(out(2L) == 1.6667) // (.5*2 + .25*1)/.75 = 5/3, rounded at 4
    assert(out(3L) == 3.0) // (.5*4 + .25*2 + .125*1)/.875 exactly
    assert(out(4L) == 10.0)
  }

  test("ewmaByKey: an all-NULL lag window yields NULL, never NaN") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("ts", TimestampType), StructField("event_id", LongType),
      StructField("value", DoubleType)))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, ts("2024-01-01 00:00:01"), 1L, null),
      org.apache.spark.sql.Row(1L, ts("2024-01-01 00:00:02"), 2L, 4.0))
    val df = spark.createDataFrame(rows, schema)
    val out = Events.ewmaByKey(df, "user_id", "ts", "event_id", "value",
        alpha = 0.5, horizon = 1)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(1L).isEmpty) // den 0 -> NULL (Spark NaN would diverge
                            // from DuckDB NULL)
    assert(out(2L).contains(4.0))
  }

  test("ewmaByKey: horizon truncates — an old value beyond the window " +
      "stops contributing") {
    val df = evv((1L to 4L).map(i =>
      (1L, f"2024-01-01 00:00:0$i", "view", i,
        if (i == 1) 1000.0 else 0.0)): _*)
    val out = Events.ewmaByKey(df, "user_id", "ts", "event_id", "value",
        alpha = 0.5, horizon = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert(out(3L) == 0.0) // value@1 fell out of the 2-lag horizon
    assert(out(2L) == 333.3333) // (.25*1000)/.75, rounded at 4
  }
}
