package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream product analytics — funnel conversion, cohort
  * retention, and per-user trajectory assembly. The reference's events
  * pipeline stops at windowed counts; a corpus built from interaction
  * logs (agent traces, RLHF sessions, behavior-cloning data) needs the
  * sequence-level shapes too, so the engine ships them as first-class
  * distributed operators.
  *
  * All three operators key every shuffle on the user column — the
  * natural 100 TB partitioning for event logs — and keep per-user
  * state bounded (funnel: one timestamp per stage; retention: one
  * first-seen timestamp; trajectories: an explicit `maxLen` cap
  * applied BEFORE any list is materialized).
  */
object Events {

  /** Ordered-funnel conversion: how many users complete each prefix of
    * `stages`, where stage i counts only if it happens at-or-after the
    * user's earliest completion of stage i−1 (the standard "earliest
    * qualifying event" funnel semantics — re-ordering does not count).
    *
    * Scale shape: one groupBy(user) aggregate per stage plus one
    * user-keyed equi-join per stage after the first — every exchange
    * hashes on the same user key, and per-user state is a single
    * timestamp. Stage count is the only loop bound, fixed by the
    * caller; nothing driver-side scales with data.
    *
    * Output: (stage_idx, stage, n_users) — one row per stage,
    * n_users monotonically non-increasing. */
  def funnel(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel: stages must be non-empty")
    require(stages.distinct == stages, s"funnel: duplicate stage in $stages")
    var reached = df.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
    var out = reached.agg(lit(0L).as("stage_idx"),
      lit(stages.head).as("stage"), count(lit(1)).as("n_users"))
    stages.zipWithIndex.drop(1).foreach { case (stage, i) =>
      reached = df.filter(col(typeCol) === stage)
        .join(reached.select(col(userCol), col("__t").as("__prev")), userCol)
        .where(col(tsCol) >= col("__prev"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
      out = out.unionByName(reached.agg(lit(i.toLong).as("stage_idx"),
        lit(stage).as("stage"), count(lit(1)).as("n_users")))
    }
    out
  }

  /** Weekly cohort retention: users are assigned to the ISO week of
    * their first event (`date_trunc('week', …)` — Monday-based in both
    * Spark and DuckDB), and every later event lands in the
    * (cohort_week, week_offset) cell it occurred in. The retention
    * triangle of every product dashboard.
    *
    * Scale shape: one groupBy(user) for first-seen, one user-keyed
    * equi-join back onto the events, one (cohort, offset) aggregate
    * whose distinct-user count is partial-aggregated map-side. The
    * cohort×offset result is calendar-bounded, never data-sized.
    *
    * Output: (cohort_week 'yyyy-MM-dd', week_offset, n_users). */
  def cohortRetention(df: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val first = df.groupBy(col(userCol))
      .agg(min(col(tsCol)).as("__first_ts"))
      .select(col(userCol),
        to_date(date_trunc("week", col("__first_ts"))).as("__cw"))
    df.select(col(userCol), col(tsCol))
      .join(first, userCol)
      .select(col(userCol), col("__cw"),
        (datediff(to_date(date_trunc("week", col(tsCol))), col("__cw")) / 7)
          .cast("long").as("week_offset"))
      .groupBy(date_format(col("__cw"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** Multi-touch attribution: distribute each conversion's value over
    * the user's preceding touch events under four standard models at
    * once — `first_touch`, `last_touch`, `linear`, and `position`
    * (40/20/40: 40% first, 40% last, 20% split across the middle;
    * degenerate paths collapse to 100% / 50–50). A touch qualifies if
    * it is the same user's, STRICTLY before the conversion, and within
    * `lookbackSeconds`. Conversions with no qualifying touch keep
    * their value on a `(none)` row, so every model conserves total
    * conversion value (spec-pinned).
    *
    * Scale shape: one user-keyed equi-join (touch×conversion pairs are
    * bounded per user by activity × lookback, never cross-user), one
    * window partitioned by conversion id (per-conversion state =
    * that conversion's touch count), one bounded aggregate to
    * models × touch-types rows. At 100 TB both sides pre-partition on
    * the user key and the join rides one exchange.
    *
    * Determinism: per-touch weights are exact rationals of exact
    * counts times the conversion value; the final per-cell sum is the
    * ordered fold over sorted credits (the zscore/centroids
    * convention), rounded at 4 — bit-identical across engines and
    * partitionings. Production flavor at extreme scale: swap the fold
    * for a plain `sum` (order-free up to ulps) — the fold holds the
    * cell's credit list in one aggregation buffer.
    *
    * Output: (model, touch_type, n_touches, credit) — `n_touches`
    * counts credited touch rows (`(none)` rows count conversions). */
  def attribution(df: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, valueCol: String,
      touchTypes: Seq[String], convType: String,
      lookbackSeconds: Long): DataFrame = {
    require(touchTypes.nonEmpty, "attribution: no touch types")
    require(!touchTypes.contains(convType),
      s"attribution: conversion type $convType cannot also be a touch type")
    require(lookbackSeconds > 0, "attribution: lookback must be positive")
    val conv = df.filter(col(typeCol) === convType)
      .select(col(userCol).as("__u"), col(tsCol).as("__cts"),
        col(idCol).as("__cid"), col(valueCol).as("__v"))
    val touch = df.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("__tu"), col(tsCol).as("__tts"),
        col(idCol).as("__tid"), col(typeCol).as("__ttype"))
    // qualification lives in the JOIN CONDITION: a conversion whose
    // touches all fall outside the lookback must surface as an
    // unmatched `(none)` row (value conservation), not vanish under a
    // post-join filter
    val paired = conv.join(touch,
      col("__u") === col("__tu") &&
        col("__tts") < col("__cts") &&
        col("__tts") >= col("__cts") - expr(
          s"INTERVAL $lookbackSeconds SECONDS"),
      "left")
    val byConv = Window.partitionBy(col("__cid"))
    val ordered = Window.partitionBy(col("__cid"))
      .orderBy(col("__tts"), col("__tid"))
    val staged = paired
      .withColumn("__n", count(col("__tid")).over(byConv))
      .withColumn("__rn", row_number().over(ordered))
    val n = col("__n").cast("double")
    val first = col("__rn") === 1
    val last = col("__rn") === col("__n")
    def model(name: String, w: Column) = struct(lit(name).as("model"),
      (col("__v") * w).as("credit"))
    val weighted = staged.select(
      when(col("__tid").isNull, lit("(none)")).otherwise(col("__ttype"))
        .as("touch_type"),
      explode(array(
        model("first_touch",
          when(col("__n") === 0, lit(1.0))
            .otherwise(when(first, lit(1.0)).otherwise(lit(0.0)))),
        model("last_touch",
          when(col("__n") === 0, lit(1.0))
            .otherwise(when(last, lit(1.0)).otherwise(lit(0.0)))),
        model("linear",
          when(col("__n") === 0, lit(1.0)).otherwise(lit(1.0) / n)),
        model("position",
          when(col("__n") === 0, lit(1.0))
            .otherwise(when(col("__n") === 1, lit(1.0))
              .otherwise(when(col("__n") === 2, lit(0.5))
                .otherwise(when(first || last, lit(0.4))
                  .otherwise(lit(0.2) / (n - 2.0)))))))).as("m"))
      .select(col("m.model").as("model"), col("touch_type"),
        col("m.credit").as("credit"))
    weighted.groupBy(col("model"), col("touch_type"))
      .agg(count(lit(1)).as("n_touches"),
        round(aggregate(sort_array(collect_list(col("credit"))),
          lit(0.0), _ + _), 4).as("credit"))
  }

  /** Bounded-horizon exponentially weighted moving average per key:
    * at each event, the weight-renormalized EWMA of the last
    * `horizon` values (current included) in (ts, id) order —
    * `Σ α(1−α)^j · x_{i−j} / Σ α(1−α)^j` over the available lags
    * j = 0…horizon−1 (pandas `ewm(adjust=True)` semantics on a
    * truncated history). Truncation error is bounded by
    * (1−α)^horizon of the weight mass — pick horizon so that's
    * below the rounding edge (α = 0.5, horizon = 8 ⇒ 0.4%).
    *
    * Scale shape: one key-partitioned window (sorts spill, never
    * collect) feeding a FIXED expression tree of `horizon` lag terms —
    * no per-row list state at all, unlike a collect_list frame; the
    * plan is the same whatever the key's history length.
    * Determinism: the term chain is left-associated in lag order on
    * both engines, weights are exact double literals, one rounded
    * division at the edge.
    *
    * Output: the id, key and value columns plus `ewma`. */
  def ewmaByKey(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, alpha: Double,
      horizon: Int): DataFrame = {
    require(alpha > 0 && alpha < 1, s"ewmaByKey: alpha in (0,1), got $alpha")
    require(horizon >= 1, s"ewmaByKey: horizon must be >= 1, got $horizon")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val terms = (0 until horizon).map { j =>
      val weight = alpha * math.pow(1.0 - alpha, j)
      val x = lag(col(valueCol), j).over(w)
      (when(x.isNotNull, lit(weight) * x).otherwise(lit(0.0)),
        when(x.isNotNull, lit(weight)).otherwise(lit(0.0)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    // guard the all-NULL window: den = 0 must yield NULL on BOTH
    // engines (unguarded, Spark's 0.0/0.0 is NaN while DuckDB's is
    // NULL — a cross-engine divergence waiting for the first NULL-
    // valued key history)
    df.select(col(idCol), col(keyCol), col(tsCol), col(valueCol))
      .withColumn("ewma", when(den > 0, round(num / den, 4)))
      .drop(tsCol)
  }

  /** Per-user event trajectories: the first `maxLen` events in
    * (ts, id) order rendered as a `'>'`-joined action string — the
    * assembly step that turns a raw event log into behavior-cloning /
    * agent-trace training sequences.
    *
    * Scale shape: ONE shuffle on user — the row_number window
    * partitions by user (sort spills, never collects), the truncation
    * filter runs BEFORE any list exists, and the final groupBy rides
    * the window's partitioning (no second exchange). Per-user state
    * after the filter is ≤ maxLen structs, a caller-fixed constant —
    * a power-law user with 10⁹ events costs one partition-local sort,
    * not an OOM.
    *
    * Output: (user, n_events, traj) — n_events is the UNtruncated
    * per-user total; traj holds ≤ maxLen steps. */
  def trajectories(df: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, maxLen: Int): DataFrame = {
    require(maxLen >= 1, s"trajectories: maxLen must be >= 1, got $maxLen")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val ranked = df.select(col(userCol), col(tsCol), col(idCol),
        col(typeCol))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(userCol))))
    ranked.where(col("__rn") <= maxLen)
      .groupBy(col(userCol))
      .agg(max(col("__n")).cast("long").as("n_events"),
        array_join(transform(
          sort_array(collect_list(struct(col("__rn"), col(typeCol)))),
          x => x.getField(typeCol)), ">").as("traj"))
  }
}
