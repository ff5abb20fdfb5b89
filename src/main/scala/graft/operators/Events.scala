package graft.operators

import org.apache.spark.sql.DataFrame
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
