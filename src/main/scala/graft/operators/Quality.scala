package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the gate a 100 TB ingest runs
  * BEFORE the data reaches training pipelines, a gap-fill family (the
  * reference validates nothing: its consumer repairs one nullable
  * column inline, consumer/StreamProcessor.scala:101-114, and trusts
  * the rest of the schema). The shape follows the published constraint
  * checkers (AWS Deequ's Check/Analyzer split, Great Expectations'
  * expectation suites): a suite of named constraints compiles to ONE
  * aggregate pass over the table — every metric a plain aggregate
  * expression, map-side combined, no shuffle beyond the single global
  * reduce — and the verdict is a small table (one row per constraint)
  * a pipeline can join, alert on, or block a load with.
  *
  * Determinism contract (the oracle gate): every metric is derived
  * from exact integers (counts, conditional counts, distinct counts)
  * or exact decimal sums, with AT MOST ONE IEEE double division at
  * the end — correctly-rounded, hence bit-identical in any compliant
  * engine. No double is ever summed across rows (double addition is
  * order-dependent; decimal addition is not).
  *
  * At 100 TB: one constraint suite = one scan regardless of suite
  * size. Exact `countDistinct` metrics are the one cost cliff: a
  * single one rewrites to an extra keyed pre-aggregate (one more
  * exchange); two or more on different columns trigger Spark's Expand
  * (one input-row copy per distinct column). Suites heavy on
  * uniqueness checks over high-cardinality columns should swap
  * [[uniqueRatio]] for [[approxUniqueRatio]] — same verdict row, HLL
  * sketch, no expansion — and keep the exact flavor for audits.
  */
object Quality {

  /** One named constraint: `metric` must be an AGGREGATE expression
    * producing a double; the verdict is `metric op threshold` with
    * `op` one of `>=`, `<=`. Build metrics with the combinators below
    * (they keep the determinism contract); hand-rolled metrics must
    * keep it themselves. */
  final case class Constraint(
      name: String,
      column: String,
      metric: Column,
      op: String,
      threshold: Double) {
    require(op == ">=" || op == "<=", s"constraint $name: bad op $op")
    // names and column labels are embedded as SQL literals by
    // checkSql — reject anything that could break the mirror
    require(name.matches("[A-Za-z0-9_.:\\- ]+"),
      s"constraint name not SQL-literal-safe: $name")
    require(column.matches("[A-Za-z0-9_.:\\- ]*"),
      s"constraint column label not SQL-literal-safe: $column")
  }

  private def nRows: Column = count(lit(1)).cast("double")

  /** Fraction of rows where `c` is non-null (Deequ Completeness). */
  def completeness(name: String, c: String): Constraint =
    Constraint(name, c, count(col(c)).cast("double") / nRows, ">=", 1.0)

  def completenessAtLeast(name: String, c: String, t: Double): Constraint =
    Constraint(name, c, count(col(c)).cast("double") / nRows, ">=", t)

  /** distinct(c) / count(c) — 1.0 iff `c` is unique among non-nulls
    * (Deequ Uniqueness). EXACT: costs one Expand row-copy per such
    * metric in the shared pass. */
  def uniqueRatio(name: String, c: String, op: String, t: Double): Constraint =
    Constraint(name, c,
      countDistinct(col(c)).cast("double") /
        greatest(count(col(c)), lit(1L)).cast("double"), op, t)

  /** The HLL flavor of [[uniqueRatio]] — no Expand, ±rsd relative
    * error, the 100 TB default. NOT oracle-exact (sketch estimates are
    * engine-specific); gate it with a tolerance, not equality. */
  def approxUniqueRatio(name: String, c: String, op: String, t: Double,
      rsd: Double = 0.05): Constraint =
    Constraint(name, c,
      approx_count_distinct(col(c), rsd).cast("double") /
        greatest(count(col(c)), lit(1L)).cast("double"), op, t)

  /** Fraction of ALL rows satisfying `pred` (null predicate counts as
    * a failure — the conservative reading). Deequ Compliance. */
  def fractionWhere(name: String, c: String, pred: Column, op: String,
      t: Double): Constraint =
    Constraint(name, c,
      sum(when(pred, 1L).otherwise(0L)).cast("double") / nRows, op, t)

  /** min/max of a numeric column, compared against a bound. Exact for
    * integer and decimal columns; doubles pass through bit-exactly
    * (min/max never rounds). */
  def minOf(name: String, c: String, op: String, t: Double): Constraint =
    Constraint(name, c, min(col(c)).cast("double"), op, t)

  def maxOf(name: String, c: String, op: String, t: Double): Constraint =
    Constraint(name, c, max(col(c)).cast("double"), op, t)

  /** Mean of a numeric column via an EXACT decimal sum (scale 10) and
    * one final double division — order-independent, unlike avg() over
    * doubles. Input values must carry ≤10 fractional digits for the
    * widening cast to be lossless (true for prices, quantities,
    * counters; not for arbitrary doubles). */
  def meanOf(name: String, c: String, op: String, t: Double): Constraint =
    Constraint(name, c,
      sum(col(c).cast("decimal(28,10)")).cast("double") /
        greatest(count(col(c)), lit(1L)).cast("double"), op, t)

  /** Run a suite in ONE aggregate pass: returns one row per
    * constraint — (name, column, metric, op, threshold, pass) — in
    * suite order. The wide 1-row aggregate is unpivoted driver-free
    * (explode of a literal-struct array over the single row). */
  def check(df: DataFrame, suite: Seq[Constraint]): DataFrame = {
    require(suite.nonEmpty, "Quality.check: empty suite")
    val names = suite.map(_.name)
    require(names.distinct.size == names.size,
      s"Quality.check: duplicate constraint names: ${names.diff(names.distinct).distinct.mkString(", ")}")
    val wide = df.agg(
      suite.head.metric.as("m0"),
      suite.tail.zipWithIndex.map { case (cst, i) =>
        cst.metric.as(s"m${i + 1}")
      }: _*)
    val rows = suite.zipWithIndex.map { case (cst, i) =>
      val m = col(s"m$i")
      val pass = cst.op match {
        case ">=" => m >= lit(cst.threshold)
        case "<=" => m <= lit(cst.threshold)
      }
      struct(
        lit(cst.name).as("name"), lit(cst.column).as("column"),
        m.as("metric"), lit(cst.op).as("op"),
        lit(cst.threshold).as("threshold"),
        // a NULL metric (e.g. min of an all-null column) fails loudly
        coalesce(pass, lit(false)).as("pass"))
    }
    wide.select(explode(array(rows: _*)).as("c")).select(col("c.*"))
  }

  /** The DuckDB mirror of [[check]]: same suite, same math, rendered
    * as one aggregate CTE + an unpivot over literal rows. `metricSql`
    * must mirror each constraint's metric expression (the caller owns
    * the pairing — same order as the suite). */
  def checkSql(table: String, suite: Seq[Constraint],
      metricSql: Seq[String]): String = {
    require(suite.size == metricSql.size, "checkSql: suite/sql mismatch")
    val aggs = metricSql.zipWithIndex
      .map { case (m, i) => s"$m AS m$i" }.mkString(", ")
    val rows = suite.zipWithIndex.map { case (cst, i) =>
      val cmp = s"m$i ${cst.op} ${cst.threshold}"
      s"SELECT '${cst.name}' AS name, '${cst.column}' AS \"column\", " +
        s"m$i AS metric, '${cst.op}' AS op, " +
        s"CAST(${cst.threshold} AS DOUBLE) AS threshold, " +
        s"coalesce($cmp, false) AS pass FROM w"
    }.mkString(" UNION ALL ")
    s"WITH w AS (SELECT $aggs FROM $table) $rows"
  }

  /** Single-pass column profile — the discovery half (what Deequ calls
    * ColumnProfilerRunner): per column, row count, null count, exact
    * distinct count, completeness, and min/max rendered as strings so
    * heterogeneous columns share one long-format schema. String
    * rendering is engine-portable for integer, string, and date
    * columns; float/decimal columns profile correctly but their
    * min/max STRINGS are engine-formatted — keep those out of
    * cross-engine comparisons (or compare the numeric metrics only).
    * Cost: one scan; one Expand copy per column for the exact
    * distinct. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "Quality.profile: no columns")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"))
    }
    val wide = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("n_rows").as("n_rows"),
        (col("n_rows") - col(s"nn_$c")).as("n_nulls"),
        col(s"nd_$c").as("n_distinct"),
        col(s"nn_$c").cast("double") /
          greatest(col("n_rows"), lit(1L)).cast("double") as "completeness",
        col(s"mn_$c").as("min_value"),
        col(s"mx_$c").as("max_value"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** Referential-integrity check — the one classic constraint the
    * single-pass [[check]] cannot express because it spans TWO
    * tables: what fraction of child rows reference a key absent from
    * the parent (orphans)? One LEFT ANTI join on the key plus exact
    * counts; null child keys are counted separately (they are
    * incomplete, not orphaned — completeness is [[completeness]]'s
    * job). At scale the anti join shuffles both sides on the key
    * once; AQE broadcasts a small parent, and bucketed layouts on the
    * key (the mergeUpsert note in SCALE.md) make it exchange-free.
    * Output: one row — (n_child, n_null_keys, n_orphans,
    * orphan_rate) with orphan_rate = n_orphans / non-null children,
    * a single IEEE division of exact counts. */
  def orphanRate(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val keyed = child.select(col(childKey).as("__k"))
    val nonNull = keyed.where(col("__k").isNotNull)
    val orphans = nonNull.join(
      parent.select(col(parentKey).as("__k")).distinct(),
      Seq("__k"), "left_anti")
    val counts = keyed.agg(
      count(lit(1)).as("n_child"),
      sum(when(col("__k").isNull, 1L).otherwise(0L)).as("n_null_keys"))
    counts.crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
      .select(col("n_child"), col("n_null_keys"), col("n_orphans"),
        (col("n_orphans").cast("double") /
          greatest(col("n_child") - col("n_null_keys"), lit(1L))
            .cast("double")).as("orphan_rate"))
  }

  /** The DuckDB mirror of [[orphanRate]]. */
  def orphanRateSql(childFrom: String, childKey: String,
      parentFrom: String, parentKey: String): String =
    s"SELECT count(*) AS n_child, " +
      s"CAST(sum(CASE WHEN $childKey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_keys, " +
      s"CAST(sum(CASE WHEN $childKey IS NOT NULL AND NOT EXISTS " +
      s"(SELECT 1 FROM $parentFrom p WHERE p.$parentKey = c.$childKey) " +
      "THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans, " +
      s"CAST(sum(CASE WHEN $childKey IS NOT NULL AND NOT EXISTS " +
      s"(SELECT 1 FROM $parentFrom p WHERE p.$parentKey = c.$childKey) " +
      "THEN 1 ELSE 0 END) AS DOUBLE) / " +
      s"greatest(count(*) - sum(CASE WHEN $childKey IS NULL THEN 1 ELSE 0 END), 1) AS orphan_rate " +
      s"FROM $childFrom c"

  /** The load gate: run the suite and THROW if any constraint fails,
    * naming every failing constraint with its measured metric — the
    * "abort the write, don't ship the corrupt partition" composition
    * point. Returns the input unchanged on success so it chains:
    * `Quality.enforce(df, suite).write.parquet(...)`. Driver cost is
    * one suite-sized collect (rows = constraints, never data). */
  def enforce(df: DataFrame, suite: Seq[Constraint]): DataFrame = {
    val failed = check(df, suite).filter(!col("pass"))
      .select(col("name"), col("column"), col("metric"), col("op"),
        col("threshold"))
      .collect()
    if (failed.nonEmpty) {
      val detail = failed.map { r =>
        s"${r.getString(0)} (${r.getString(1)}): metric ${r.getDouble(2)} " +
          s"violates ${r.getString(3)} ${r.getDouble(4)}"
      }.mkString("; ")
      throw new IllegalStateException(
        s"Quality.enforce: ${failed.length} constraint(s) failed — $detail")
    }
    df
  }

  /** Drift detection between two [[profile]] outputs (yesterday's
    * corpus vs today's) — the monitoring half of the gate: a schema
    * that silently starts shipping nulls, collapsing cardinality, or
    * shifting range is exactly what a 100 TB ingest can't eyeball.
    * FULL-outer-joins the two profiles on column name (a column that
    * appeared or vanished between snapshots — the loudest schema
    * drift — gets a row with `in_old`/`in_new` presence flags and is
    * always `drifted`) and flags per column:
    * null-rate jump beyond `maxNullRateJump` (absolute), distinct-RATIO
    * drop/rise beyond `maxDistinctRatioJump` (absolute — ratio, not
    * count, so table growth alone never trips it), and any min/max
    * boundary change. Cost: both inputs are profile outputs (rows =
    * columns), so the diff is driver-trivial whatever the table size.
    * Determinism: ratios of exact counts, string equality — no new
    * float surface. */
  def profileDiff(oldP: DataFrame, newP: DataFrame,
      maxNullRateJump: Double, maxDistinctRatioJump: Double): DataFrame = {
    val o = oldP.select(col("column"), lit(true).as("in_old"),
      (lit(1.0) - col("completeness")).as("null_rate_old"),
      (col("n_distinct").cast("double") /
        greatest(col("n_rows"), lit(1L)).cast("double"))
        .as("distinct_ratio_old"),
      col("min_value").as("min_old"), col("max_value").as("max_old"))
    val n = newP.select(col("column"), lit(true).as("in_new"),
      (lit(1.0) - col("completeness")).as("null_rate_new"),
      (col("n_distinct").cast("double") /
        greatest(col("n_rows"), lit(1L)).cast("double"))
        .as("distinct_ratio_new"),
      col("min_value").as("min_new"), col("max_value").as("max_new"))
    val nullJump = abs(col("null_rate_new") - col("null_rate_old"))
    val cardJump = abs(col("distinct_ratio_new") - col("distinct_ratio_old"))
    // null-safe: a column whose min/max went NULL (all-null today) is
    // a range change, not a silent equality
    val rangeChanged =
      not(col("min_new") <=> col("min_old")) ||
        not(col("max_new") <=> col("max_old"))
    // FULL outer: a column that appeared or vanished between snapshots
    // is the loudest schema drift — an inner join would emit no row for
    // it at all. Unmatched columns always set drifted (via the presence
    // flags); their jump comparisons are null → coalesced to false so
    // the specific-drift booleans stay three-valued-logic-free.
    val inOld = coalesce(col("in_old"), lit(false))
    val inNew = coalesce(col("in_new"), lit(false))
    o.join(n, Seq("column"), "full").select(
      col("column"), inOld.as("in_old"), inNew.as("in_new"),
      col("null_rate_old"), col("null_rate_new"),
      col("distinct_ratio_old"), col("distinct_ratio_new"),
      coalesce(nullJump > lit(maxNullRateJump), lit(false))
        .as("null_drift"),
      coalesce(cardJump > lit(maxDistinctRatioJump), lit(false))
        .as("cardinality_drift"),
      rangeChanged.as("range_drift"),
      (!inOld || !inNew ||
        coalesce(nullJump > lit(maxNullRateJump), lit(false)) ||
        coalesce(cardJump > lit(maxDistinctRatioJump), lit(false)) ||
        rangeChanged)
        .as("drifted"))
  }

  /** The DuckDB mirror of [[profileDiff]]: `oldSql`/`newSql` must be
    * [[profileSql]]-shaped queries (same output columns). */
  def profileDiffSql(oldSql: String, newSql: String,
      maxNullRateJump: Double, maxDistinctRatioJump: Double): String = {
    def side(tag: String, q: String) =
      s"$tag AS (SELECT \"column\", TRUE AS in_$tag, " +
        s"1.0 - completeness AS null_rate_$tag, " +
        s"CAST(n_distinct AS DOUBLE) / greatest(n_rows, 1) AS distinct_ratio_$tag, " +
        s"min_value AS min_$tag, max_value AS max_$tag FROM ($q))"
    s"WITH ${side("old", oldSql)}, ${side("new", newSql)} " +
      "SELECT \"column\", coalesce(in_old, FALSE) AS in_old, " +
      "coalesce(in_new, FALSE) AS in_new, " +
      "null_rate_old, null_rate_new, " +
      "distinct_ratio_old, distinct_ratio_new, " +
      s"coalesce(abs(null_rate_new - null_rate_old) > $maxNullRateJump, FALSE) AS null_drift, " +
      s"coalesce(abs(distinct_ratio_new - distinct_ratio_old) > $maxDistinctRatioJump, FALSE) AS cardinality_drift, " +
      "(min_new IS DISTINCT FROM min_old OR max_new IS DISTINCT FROM max_old) AS range_drift, " +
      "(NOT coalesce(in_old, FALSE) OR NOT coalesce(in_new, FALSE) OR " +
      s"coalesce(abs(null_rate_new - null_rate_old) > $maxNullRateJump, FALSE) OR " +
      s"coalesce(abs(distinct_ratio_new - distinct_ratio_old) > $maxDistinctRatioJump, FALSE) OR " +
      "min_new IS DISTINCT FROM min_old OR max_new IS DISTINCT FROM max_old) AS drifted " +
      "FROM old FULL JOIN new USING (\"column\")"
  }

  /** Population stability index over FIXED bin edges — the standard
    * ML-monitoring distribution-drift metric ([[profileDiff]] sees
    * schema-level drift; PSI sees a value distribution sliding inside
    * an unchanged schema). Bins are (-inf,e0), [e0,e1), …,
    * [e(n-1),inf): edges are caller-fixed literals, NOT quantiles of
    * either side, so bin ids are pure per-row arithmetic — no sampled
    * boundaries, bit-identical in any engine. Counts are
    * add-1-smoothed (empty bins contribute finite terms — the
    * standard epsilon dodge made exact), fractions are single IEEE
    * divisions of exact integers, and each bin's term
    * (p_new − p_old)·ln(p_new/p_old) is rounded at 4 decimals to
    * absorb engine-ulp ln (the bm25 convention). NULL values are
    * excluded (their drift belongs to [[profileDiff]]'s null rate).
    *
    * Output: one row per bin — (bin, n_old, n_new, p_old, p_new,
    * psi_term) — plus a bin = −1 TOTAL row whose psi_term is the
    * ordered fold of the rounded terms (sorted ascending, so the
    * IEEE sum order is pinned cross-engine). Interpretation is the
    * industry folklore scale: < 0.1 stable, 0.1–0.25 shifting,
    * > 0.25 drifted. Cost: one aggregate pass per side to ≤ bins
    * rows; everything after is bounded by the bin count. */
  private def requireEdges(edges: Seq[Double]): Unit = {
    require(edges.nonEmpty, "psi: no edges")
    require(edges == edges.sorted && edges.distinct.size == edges.size,
      "psi: edges must be strictly increasing")
  }

  /** Per-bin counts of `c` over the [[psi]] bin layout — the
    * persistable BASELINE artifact of the drift watch: compute once
    * over the reference corpus, write the ≤ edges+1 rows, and feed
    * [[psiFromBaseline]] forever after without rescanning the
    * reference. Output: (bin, n). Exclusions: NULL values (their
    * drift belongs to [[profileDiff]]'s null rate) and, for
    * float/double columns, NaN — engine NaN-ordering semantics would
    * otherwise silently land NaN in the top bin (Spark and DuckDB
    * both order NaN above all values), skewing PSI with a value that
    * is missing data, not a distribution shift. The SQL mirrors
    * ([[psiSql]]/[[psiByGroupSql]]) apply the same guard. */
  def binCounts(df: DataFrame, c: String, edges: Seq[Double]): DataFrame = {
    requireEdges(edges)
    df.where(binnableValues(df, c))
      .select(edges.map(e => when(col(c) >= lit(e), 1L).otherwise(0L))
        .reduce(_ + _).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
  }

  /** NULL- and (for float columns) NaN-excluding bin filter shared by
    * the PSI counters. */
  private def binnableValues(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.DoubleType |
          org.apache.spark.sql.types.FloatType =>
        col(c).isNotNull && !isnan(col(c))
      case _ => col(c).isNotNull
    }

  def psi(oldDf: DataFrame, newDf: DataFrame, c: String,
      edges: Seq[Double]): DataFrame =
    psiFromBaseline(binCounts(oldDf, c, edges), newDf, c, edges)

  /** [[psi]] against a precomputed [[binCounts]] baseline — the
    * production shape: the old side costs a ≤ bins-row read, only the
    * new side is scanned. `psi(old, new, …)` is DEFINED as
    * `psiFromBaseline(binCounts(old, …), new, …)`, so the flavors
    * cannot drift.
    *
    * The baseline artifact is VALIDATED in-plan: a baseline row whose
    * bin falls outside [0, edges.size] (an artifact built with a
    * different edge list than the one passed here) raises a descriptive
    * error instead of silently dropping off the spine's left join and
    * losing baseline mass — a plausible-but-wrong PSI was the failure
    * mode. The check is a per-row expression on the ≤ bins-row
    * artifact (no driver action), so it composes into streaming
    * drift-watch plans unchanged. */
  def psiFromBaseline(oldCounts: DataFrame, newDf: DataFrame, c: String,
      edges: Seq[Double]): DataFrame =
    withTermTotal(
      smoothedBins(oldCounts, newDf, c, edges, "psiFromBaseline")
        .withColumn("psi_term",
          round((col("p_new") - col("p_old")) *
            log(col("p_new") / col("p_old")), 4)),
      "psi_term")

  /** Shared spine of the fixed-bin drift metrics: validated baseline
    * counts + new-side counts left-joined onto the 0..edges bin spine,
    * add-1-smoothed into (bin, n_old, n_new, p_old, p_new). */
  private def smoothedBins(oldCounts: DataFrame, newDf: DataFrame,
      c: String, edges: Seq[Double], caller: String): DataFrame = {
    requireEdges(edges)
    val nb = edges.size + 1
    val spine = newDf.sparkSession.range(nb.toLong)
      .select(col("id").as("bin"))
    val oldChecked = oldCounts.select(
      when(col("bin") < 0L || col("bin") >= nb.toLong,
        raise_error(concat(
          lit(s"$caller: baseline bin outside [0, ${nb - 1}] — " +
            "artifact built with different edges? bin="),
          col("bin").cast("string"))))
        .otherwise(col("bin")).as("bin"),
      col("n").as("n_old"))
    // PINNED (≤ bins+1 rows): `joined` feeds both the totals
    // aggregate and the smoothed projection, and the term frame above
    // it is itself consumed twice (per-bin rows + the bin = −1 total)
    // — un-pinned, the corpus-scanning bin counts on BOTH sides
    // re-ran 4x (r18 final-plan audit: rel_quality_psi carried 16
    // orders scans). The pin is a pure optimization, so it SKIPS when
    // either input is a streaming frame (localCheckpoint would throw
    // AnalysisException there) — psiFromBaseline/jsFromBaseline keep
    // composing into streaming drift-watch plans as documented, just
    // without the batch-side scan dedup; the foreachBatch face
    // (StreamOps.psiBatches) sees regular batch micro-frames and pins.
    val joined0 = spine
      .join(oldChecked, Seq("bin"), "left")
      .join(binCounts(newDf, c, edges)
        .select(col("bin"), col("n").as("n_new")), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    val joined =
      if (joined0.isStreaming) joined0 else joined0.localCheckpoint(true)
    // totals via a 1-row cross join (bounded; a global window here
    // would trip the fleet-wide unpartitioned-window audit)
    val totals = joined.agg(sum(col("n_old")).as("tot_old"),
      sum(col("n_new")).as("tot_new"))
    joined.crossJoin(totals).select(
      col("bin"), col("n_old"), col("n_new"),
      ((col("n_old") + lit(1L)).cast("double") /
        (col("tot_old") + lit(nb.toLong)).cast("double")).as("p_old"),
      ((col("n_new") + lit(1L)).cast("double") /
        (col("tot_new") + lit(nb.toLong)).cast("double")).as("p_new"))
  }

  /** Append the bin = −1 ordered-fold total row (the psi/js output
    * convention: per-bin terms + one grand total). */
  private def withTermTotal(bins: DataFrame, termName: String): DataFrame = {
    val total = bins.agg(
      sum(col("n_old")).as("n_old"), sum(col("n_new")).as("n_new"),
      round(aggregate(sort_array(collect_list(col(termName))),
        lit(0.0), (acc, x) => acc + x), 4).as(termName))
      .select(lit(-1L).as("bin"), col("n_old"), col("n_new"),
        lit(1.0).as("p_old"), lit(1.0).as("p_new"), col(termName))
    bins.unionByName(total)
  }

  /** Jensen–Shannon divergence over the same smoothed fixed-bin
    * distributions as [[psi]] — the BOUNDED (≤ ln 2), symmetric,
    * never-infinite drift companion: PSI explodes as a bin empties
    * (useful as an alarm, unhelpful as a dashboard trend); JSD
    * saturates, so it trends cleanly however disjoint the corpora
    * get. Per bin m = (p+q)/2 and
    * js_term = ½·p·ln(p/m) + ½·q·ln(q/m); the bin = −1 row carries the
    * ordered-fold total. Same artifact path as PSI:
    * [[jsFromBaseline]] consumes a persisted [[binCounts]] frame with
    * the identical in-plan edge validation. */
  def jsDivergence(oldDf: DataFrame, newDf: DataFrame, c: String,
      edges: Seq[Double]): DataFrame =
    jsFromBaseline(binCounts(oldDf, c, edges), newDf, c, edges)

  def jsFromBaseline(oldCounts: DataFrame, newDf: DataFrame, c: String,
      edges: Seq[Double]): DataFrame = {
    val m = (col("p_old") + col("p_new")) / lit(2.0)
    withTermTotal(
      smoothedBins(oldCounts, newDf, c, edges, "jsFromBaseline")
        .withColumn("js_term",
          round(lit(0.5) * col("p_old") * log(col("p_old") / m) +
            lit(0.5) * col("p_new") * log(col("p_new") / m), 4)),
      "js_term")
  }

  /** [[psi]] stratified by a group column — per-source /
    * per-language drift, the monitoring shape a multi-source corpus
    * needs (a global PSI can read stable while one source drifts and
    * another compensates). Groups are the UNION of groups present on
    * either side (a source that vanished or appeared still gets its
    * rows — smoothing makes the empty side finite and very drifted,
    * which is the right signal). Per group: the same smoothed terms
    * and a bin = −1 ordered-fold total as [[psi]]. Everything is
    * equi-joins on (group, bin) and bounded aggregates — no windows;
    * output size = groups × (bins + 1), so `groupCol` should be
    * low-cardinality (sources, languages — not user ids). */
  def psiByGroup(oldDf: DataFrame, newDf: DataFrame, c: String,
      groupCol: String, edges: Seq[Double]): DataFrame = {
    requireEdges(edges)
    val nb = edges.size + 1
    def counts(df: DataFrame, alias: String) = df
      .where(binnableValues(df, c) && col(groupCol).isNotNull)
      .select(col(groupCol).as("g"),
        edges.map(e => when(col(c) >= lit(e), 1L).otherwise(0L))
          .reduce(_ + _).as("bin"))
      .groupBy(col("g"), col("bin")).agg(count(lit(1)).as(alias))
    // oc/nc PINNED (groups × bins rows): each is consumed by the
    // group spine AND the joined frame, and everything above `bins`
    // is consumed twice more (per-bin rows + per-group totals) —
    // un-pinned, the corpus-scanning counts re-ran ~8x (r18
    // final-plan audit: rel_quality_psi_grouped carried 32 orders
    // scans).
    val oc = counts(oldDf, "n_old").localCheckpoint(true)
    val nc = counts(newDf, "n_new").localCheckpoint(true)
    val groups = oc.select(col("g")).union(nc.select(col("g"))).distinct()
    val spine = groups.crossJoin(
      oldDf.sparkSession.range(nb.toLong).select(col("id").as("bin")))
    val joined = spine
      .join(oc, Seq("g", "bin"), "left").join(nc, Seq("g", "bin"), "left")
      .select(col("g"), col("bin"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    val totals = joined.groupBy(col("g")).agg(
      sum(col("n_old")).as("tot_old"), sum(col("n_new")).as("tot_new"))
    val bins = joined.join(totals, Seq("g")).select(
      col("g"), col("bin"), col("n_old"), col("n_new"),
      ((col("n_old") + lit(1L)).cast("double") /
        (col("tot_old") + lit(nb.toLong)).cast("double")).as("p_old"),
      ((col("n_new") + lit(1L)).cast("double") /
        (col("tot_new") + lit(nb.toLong)).cast("double")).as("p_new"))
      .withColumn("psi_term",
        round((col("p_new") - col("p_old")) *
          log(col("p_new") / col("p_old")), 4))
      // pinned: consumed by the per-group total and the union —
      // groups × (bins+1) rows
      .localCheckpoint(true)
    val total = bins.groupBy(col("g")).agg(
      sum(col("n_old")).as("n_old"), sum(col("n_new")).as("n_new"),
      round(aggregate(sort_array(collect_list(col("psi_term"))),
        lit(0.0), (acc, x) => acc + x), 4).as("psi_term"))
      .select(col("g"), lit(-1L).as("bin"), col("n_old"), col("n_new"),
        lit(1.0).as("p_old"), lit(1.0).as("p_new"), col("psi_term"))
    bins.unionByName(total)
  }

  /** The DuckDB mirror of [[psiByGroup]]. */
  def psiByGroupSql(oldFrom: String, newFrom: String, valueExpr: String,
      groupExpr: String, edges: Seq[Double]): String = {
    val nb = edges.size + 1
    val binExpr = edges
      .map(e => s"CASE WHEN $valueExpr >= $e THEN 1 ELSE 0 END")
      .mkString("(", " + ", ")")
    def side(tag: String, from: String) =
      s"${tag}c AS (SELECT $groupExpr AS g, $binExpr AS bin, " +
        s"count(*) AS n_$tag FROM $from " +
        s"WHERE $valueExpr IS NOT NULL " +
        s"AND NOT isnan(CAST($valueExpr AS DOUBLE)) " +
        s"AND $groupExpr IS NOT NULL " +
        "GROUP BY 1, 2)"
    s"WITH ${side("old", oldFrom)}, ${side("new", newFrom)}, " +
      "groups AS (SELECT DISTINCT g FROM " +
      "(SELECT g FROM oldc UNION SELECT g FROM newc)), " +
      s"spine AS (SELECT g, bin FROM groups, " +
      s"(SELECT unnest(range($nb)) AS bin) bb), " +
      "j AS (SELECT spine.g, spine.bin, coalesce(n_old, 0) AS n_old, " +
      "coalesce(n_new, 0) AS n_new FROM spine " +
      "LEFT JOIN oldc ON spine.g = oldc.g AND spine.bin = oldc.bin " +
      "LEFT JOIN newc ON spine.g = newc.g AND spine.bin = newc.bin), " +
      "t AS (SELECT g, sum(n_old) AS tot_old, sum(n_new) AS tot_new " +
      "FROM j GROUP BY 1), " +
      "b AS (SELECT j.g, bin, n_old, n_new, " +
      s"CAST(n_old + 1 AS DOUBLE) / (tot_old + $nb) AS p_old, " +
      s"CAST(n_new + 1 AS DOUBLE) / (tot_new + $nb) AS p_new " +
      "FROM j JOIN t ON j.g = t.g), " +
      "r AS (SELECT g, bin, n_old, n_new, p_old, p_new, " +
      "round((p_new - p_old) * ln(p_new / p_old), 4) AS psi_term FROM b) " +
      "SELECT * FROM r UNION ALL " +
      "SELECT g, CAST(-1 AS BIGINT), CAST(sum(n_old) AS BIGINT), " +
      "CAST(sum(n_new) AS BIGINT), CAST(1.0 AS DOUBLE), " +
      "CAST(1.0 AS DOUBLE), " +
      "round(list_aggregate(list_sort(list(psi_term)), 'sum'), 4) " +
      "FROM r GROUP BY g"
  }

  /** The DuckDB mirror of [[psi]]: `oldFrom`/`newFrom` are table
    * names or parenthesized-subquery-with-alias strings exposing
    * `valueExpr`. */
  def psiSql(oldFrom: String, newFrom: String, valueExpr: String,
      edges: Seq[Double]): String = {
    val nb = edges.size + 1
    val binExpr = edges
      .map(e => s"CASE WHEN $valueExpr >= $e THEN 1 ELSE 0 END")
      .mkString("(", " + ", ")")
    def side(tag: String, from: String) =
      s"${tag}c AS (SELECT $binExpr AS bin, count(*) AS n_$tag " +
        s"FROM $from WHERE $valueExpr IS NOT NULL " +
        s"AND NOT isnan(CAST($valueExpr AS DOUBLE)) GROUP BY 1)"
    s"WITH ${side("old", oldFrom)}, ${side("new", newFrom)}, " +
      s"spine AS (SELECT unnest(range($nb)) AS bin), " +
      "j AS (SELECT spine.bin, coalesce(n_old, 0) AS n_old, " +
      "coalesce(n_new, 0) AS n_new FROM spine " +
      "LEFT JOIN oldc ON spine.bin = oldc.bin " +
      "LEFT JOIN newc ON spine.bin = newc.bin), " +
      "t AS (SELECT sum(n_old) AS tot_old, sum(n_new) AS tot_new FROM j), " +
      "b AS (SELECT bin, n_old, n_new, " +
      s"CAST(n_old + 1 AS DOUBLE) / (tot_old + $nb) AS p_old, " +
      s"CAST(n_new + 1 AS DOUBLE) / (tot_new + $nb) AS p_new " +
      "FROM j, t), " +
      "r AS (SELECT bin, n_old, n_new, p_old, p_new, " +
      "round((p_new - p_old) * ln(p_new / p_old), 4) AS psi_term FROM b) " +
      "SELECT * FROM r UNION ALL " +
      "SELECT CAST(-1 AS BIGINT) AS bin, CAST(sum(n_old) AS BIGINT), " +
      "CAST(sum(n_new) AS BIGINT), CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE), " +
      "round(list_aggregate(list_sort(list(psi_term)), 'sum'), 4) FROM r"
  }

  /** DuckDB mirror of [[jsDivergence]] — psiSql with the JS term. */
  def jsSql(oldFrom: String, newFrom: String, valueExpr: String,
      edges: Seq[Double]): String = {
    val nb = edges.size + 1
    val binExpr = edges
      .map(e => s"CASE WHEN $valueExpr >= $e THEN 1 ELSE 0 END")
      .mkString("(", " + ", ")")
    def side(tag: String, from: String) =
      s"${tag}c AS (SELECT $binExpr AS bin, count(*) AS n_$tag " +
        s"FROM $from WHERE $valueExpr IS NOT NULL " +
        s"AND NOT isnan(CAST($valueExpr AS DOUBLE)) GROUP BY 1)"
    s"WITH ${side("old", oldFrom)}, ${side("new", newFrom)}, " +
      s"spine AS (SELECT unnest(range($nb)) AS bin), " +
      "j AS (SELECT spine.bin, coalesce(n_old, 0) AS n_old, " +
      "coalesce(n_new, 0) AS n_new FROM spine " +
      "LEFT JOIN oldc ON spine.bin = oldc.bin " +
      "LEFT JOIN newc ON spine.bin = newc.bin), " +
      "t AS (SELECT sum(n_old) AS tot_old, sum(n_new) AS tot_new FROM j), " +
      "b AS (SELECT bin, n_old, n_new, " +
      s"CAST(n_old + 1 AS DOUBLE) / (tot_old + $nb) AS p_old, " +
      s"CAST(n_new + 1 AS DOUBLE) / (tot_new + $nb) AS p_new " +
      "FROM j, t), " +
      "r AS (SELECT bin, n_old, n_new, p_old, p_new, " +
      "round(0.5 * p_old * ln(p_old / ((p_old + p_new) / 2.0)) " +
      "+ 0.5 * p_new * ln(p_new / ((p_old + p_new) / 2.0)), 4) AS js_term FROM b) " +
      "SELECT * FROM r UNION ALL " +
      "SELECT CAST(-1 AS BIGINT) AS bin, CAST(sum(n_old) AS BIGINT), " +
      "CAST(sum(n_new) AS BIGINT), CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE), " +
      "round(list_aggregate(list_sort(list(js_term)), 'sum'), 4) FROM r"
  }

  /** Shardable profile state — the incremental face of [[profile]]
    * for a corpus too large (or too append-only) to rescan: profile
    * each shard/day/partition ONCE into a 1-row mergeable state and
    * fold states instead of data. Counts, min and max merge exactly
    * (sum / min / max are associative); the distinct count travels as
    * a DataSketches HLL sketch (`hll_sketch_agg`), the one
    * approximate field ([[profile]]'s exact distinct is the thing
    * that CANNOT be merged post-aggregation). The estimate is NOT
    * bit-stable under shard reordering — DataSketches' HIP
    * accumulator is presentation-order-dependent (measured: ±0.7% on
    * a 1000-distinct column), so downstream checks must gate it with
    * a tolerance band (the rel_approx_distinct convention), never
    * equality; the default lgK=12 sketch's ~1% rsd sits comfortably
    * inside a 5% band. Sketchable
    * input types are int/long/string/binary — the same column kinds
    * whose min/max strings render portably. Persist shard rows as a
    * plain table; [[mergeProfileShards]] folds any subset. */
  def profileShard(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "Quality.profileShard: no columns")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"nn_$c"),
        hll_sketch_agg(col(c)).as(s"hll_$c"),
        min(col(c)).as(s"mn_$c"),
        max(col(c)).as(s"mx_$c"))
    }
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Fold [[profileShard]] rows into the long-format profile: exact
    * n_rows / n_nulls / completeness / min / max (the merges are
    * lossless) and `n_distinct_est` from the unioned HLL sketches.
    * Input may be any union of shard rows — one per day, per
    * partition, per backfill — and folding is associative, so
    * re-merging a merged state with new shards is the same as
    * merging everything at once. */
  def mergeProfileShards(shards: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "Quality.mergeProfileShards: no columns")
    val aggs = cols.flatMap { c =>
      Seq(sum(col(s"nn_$c")).as(s"nn_$c"),
        hll_union_agg(col(s"hll_$c")).as(s"hll_$c"),
        min(col(s"mn_$c")).as(s"mn_$c"),
        max(col(s"mx_$c")).as(s"mx_$c"))
    }
    val wide = shards.agg(sum(col("n_rows")).as("n_rows"), aggs: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("n_rows").as("n_rows"),
        (col("n_rows") - col(s"nn_$c")).as("n_nulls"),
        hll_sketch_estimate(col(s"hll_$c")).as("n_distinct_est"),
        col(s"nn_$c").cast("double") /
          greatest(col("n_rows"), lit(1L)).cast("double") as "completeness",
        col(s"mn_$c").cast("string").as("min_value"),
        col(s"mx_$c").cast("string").as("max_value"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** The scale flavor of [[profile]]: identical long-format output
    * with `n_distinct_est` (HLL) in place of the exact distinct — no
    * Expand, no per-column input copies, ONE scan with constant
    * sketch state. Defined as the 1-shard [[mergeProfileShards]] ∘
    * [[profileShard]] composition, so the incremental and one-shot
    * flavors cannot drift. At 100 TB this is the default;
    * [[profile]] is the audit flavor. */
  def approxProfile(df: DataFrame, cols: Seq[String]): DataFrame =
    mergeProfileShards(profileShard(df, cols), cols)

  /** k-anonymity report over a generalization ladder (Sweeney 2002) —
    * the privacy gate a training-data release needs: a row is
    * re-identifiable when its quasi-identifier combination is shared
    * by fewer than k rows. Each `levels` entry is a named
    * quasi-identifier list, coarser at higher levels (bucket the
    * value, drop a column…); the report shows, per level, how much
    * data the suppression model would discard and what k the kept
    * classes actually achieve — the curve an operator reads to pick
    * the cheapest level that meets policy.
    *
    * Scale shape: ONE scan — each row expands to one (level, key)
    * pair per level (keys are sentinel-coalesced string
    * concatenations, so NULLs can't collide with adjacent fields),
    * then one (level, key) count and one levels-sized rollup. No
    * driver-side anything; output has one row per level.
    *
    * Determinism: counts are exact integers; `suppression_rate` is a
    * single exact integer-to-integer IEEE division. QI expressions
    * are cast to string — bucket doubles to integers FIRST (floor
    * division), never feed raw doubles.
    *
    * Output: (lvl, level, n_rows, n_classes, n_suppressed_rows,
    * suppression_rate, k_effective) — `k_effective` is the smallest
    * surviving class (0 when every class is suppressed). */
  def kAnonymity(df: DataFrame, levels: Seq[(String, Seq[Column])],
      k: Int): DataFrame = {
    require(k >= 2, s"kAnonymity: k must be >= 2, got $k")
    require(levels.nonEmpty, "kAnonymity: need at least one level")
    require(levels.map(_._1).distinct.size == levels.size,
      "kAnonymity: duplicate level names")
    require(levels.forall(_._2.nonEmpty),
      "kAnonymity: a level needs at least one quasi-identifier")
    val tagged = df.select(explode(array(levels.zipWithIndex.map {
      case ((name, qis), i) =>
        struct(lit(i.toLong).as("lvl"), lit(name).as("level"),
          // \u0001-separated, NULLs to a distinct sentinel: concat_ws
          // alone SKIPS nulls -- ("a",NULL,"b") would collide with
          // ("a","b",NULL) -- and concatenation without a separator
          // would collide ("a","bc") with ("ab","c")
          concat_ws("\u0001",
            qis.map(q => coalesce(q.cast("string"), lit("\u0002"))): _*)
            .as("key"))
    }: _*)).as("t")).select(col("t.*"))
    val classes = tagged.groupBy(col("lvl"), col("level"), col("key"))
      .agg(count(lit(1)).as("n"))
    classes.groupBy(col("lvl"), col("level"))
      .agg(sum(col("n")).as("n_rows"),
        count(lit(1)).as("n_classes"),
        sum(when(col("n") < k, col("n")).otherwise(lit(0L)))
          .as("n_suppressed_rows"),
        min(when(col("n") >= k, col("n"))).as("__ke"))
      .select(col("lvl"), col("level"), col("n_rows"), col("n_classes"),
        col("n_suppressed_rows"),
        (col("n_suppressed_rows").cast("double") /
          col("n_rows").cast("double")).as("suppression_rate"),
        coalesce(col("__ke"), lit(0L)).as("k_effective"))
  }

  /** Binary-classifier evaluation in ONE aggregate pass: confusion
    * counts plus accuracy / precision / recall / F1 — the verdict
    * row a quality-classifier distillation loop (NB vs its heuristic
    * labels, or any gate vs human audit labels) reads before trusting
    * the model. Rows where either side is NULL are counted separately
    * (`n_null`), never silently folded into a class.
    *
    * Determinism: all four rates are SINGLE divisions of exact
    * integers — F1 uses the algebraic identity 2·tp/(2·tp+fp+fn), so
    * no composed float arithmetic exists to drift. Zero denominators
    * yield NULL (undefined, loudly), not 0.
    *
    * Output: one row — (tp, fp, fn, tn, n_null, accuracy, precision,
    * recall, f1). */
  def binaryEval(df: DataFrame, pred: Column, truth: Column): DataFrame = {
    val p = pred.cast("boolean")
    val t = truth.cast("boolean")
    val counted = df.agg(
      sum(when(p && t, 1L).otherwise(0L)).as("tp"),
      sum(when(p && !t, 1L).otherwise(0L)).as("fp"),
      sum(when(!p && t, 1L).otherwise(0L)).as("fn"),
      sum(when(!p && !t, 1L).otherwise(0L)).as("tn"),
      sum(when(p.isNull || t.isNull, 1L).otherwise(0L)).as("n_null"))
    def ratio(num: Column, den: Column) =
      when(den > 0, num.cast("double") / den.cast("double"))
    counted.select(col("tp"), col("fp"), col("fn"), col("tn"),
      col("n_null"),
      ratio(col("tp") + col("tn"),
        col("tp") + col("fp") + col("fn") + col("tn")).as("accuracy"),
      ratio(col("tp"), col("tp") + col("fp")).as("precision"),
      ratio(col("tp"), col("tp") + col("fn")).as("recall"),
      ratio(col("tp") * 2L,
        col("tp") * 2L + col("fp") + col("fn")).as("f1"))
  }

  /** Calibration (reliability-diagram) bins: the [[psi]] fixed-edge
    * bin layout applied to a classifier SCORE, with each bin's
    * empirical positive rate — a well-calibrated score's pos_rate
    * rises monotonically through the bins; a flat or folded curve
    * says the score ranks but its magnitude lies. NULL scores/labels
    * and (for float scores) NaN are excluded, like [[binCounts]].
    *
    * Output: (bin, n, n_pos, pos_rate) — exact counts, one exact
    * division. Bins follow the psi convention: (-inf,e0), [e0,e1) …
    * [e_last,inf). */
  def calibrationBins(df: DataFrame, scoreCol: String, truth: Column,
      edges: Seq[Double]): DataFrame = {
    requireEdges(edges)
    df.where(binnableValues(df, scoreCol) && truth.isNotNull)
      .select(edges.map(e =>
          when(col(scoreCol) >= lit(e), 1L).otherwise(0L))
        .reduce(_ + _).as("bin"),
        truth.cast("boolean").as("__t"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("n_pos"))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("n_pos").cast("double") / col("n").cast("double"))
          .as("pos_rate"))
  }

  /** Distinct-l-diversity over the same generalization ladder as
    * [[kAnonymity]]: k-anonymity stops re-identification by class
    * size, but a class whose SENSITIVE attribute is constant still
    * leaks it (the homogeneity attack); l-diversity requires every
    * equivalence class to hold at least `l` distinct sensitive
    * values. The report shows, per ladder level, how many classes
    * (and rows) violate that — read together with the k-anonymity
    * curve to pick the release level.
    *
    * Scale shape: one scan expanding each row to one (level, key,
    * sensitive) triple per level, one exact distinct per class
    * (grouping directly on the (lvl, key, sensitive) triple first —
    * no countDistinct Expand), one levels-sized rollup.
    *
    * Output: (lvl, level, n_classes, n_diverse_classes,
    * n_violating_classes, n_rows_at_risk, at_risk_rate, l_effective)
    * — `l_effective` is the worst class's distinct-value count. */
  def lDiversity(df: DataFrame, levels: Seq[(String, Seq[Column])],
      sensitive: Column, l: Int): DataFrame = {
    require(l >= 2, s"lDiversity: l must be >= 2, got $l")
    require(levels.nonEmpty, "lDiversity: need at least one level")
    require(levels.map(_._1).distinct.size == levels.size,
      "lDiversity: duplicate level names")
    val tagged = df.select(explode(array(levels.zipWithIndex.map {
      case ((name, qis), i) =>
        struct(lit(i.toLong).as("lvl"), lit(name).as("level"),
          concat_ws("\u0001",
            qis.map(q => coalesce(q.cast("string"), lit("\u0002"))): _*)
            .as("key"),
          coalesce(sensitive.cast("string"), lit("\u0002")).as("sens"))
    }: _*)).as("t")).select(col("t.*"))
    // two stacked exact aggregates instead of one countDistinct: the
    // first collapses to unique (lvl, key, sens) rows (map-side
    // partials apply), the second counts them per class
    val classes = tagged
      .groupBy(col("lvl"), col("level"), col("key"), col("sens"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("lvl"), col("level"), col("key"))
      .agg(sum(col("n")).as("n_rows"), count(lit(1)).as("n_sens"))
    classes.groupBy(col("lvl"), col("level"))
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("n_sens") >= l, 1L).otherwise(0L))
          .as("n_diverse_classes"),
        sum(when(col("n_sens") < l, 1L).otherwise(0L))
          .as("n_violating_classes"),
        sum(when(col("n_sens") < l, col("n_rows")).otherwise(lit(0L)))
          .as("n_rows_at_risk"),
        sum(col("n_rows")).as("__tot"),
        min(col("n_sens")).as("l_effective"))
      .select(col("lvl"), col("level"), col("n_classes"),
        col("n_diverse_classes"), col("n_violating_classes"),
        col("n_rows_at_risk"),
        (col("n_rows_at_risk").cast("double") /
          col("__tot").cast("double")).as("at_risk_rate"),
        col("l_effective"))
  }

  /** Categorical concentration report — Shannon entropy and the
    * Herfindahl–Hirschman index per column: the mixture-planning
    * signal (is the corpus dominated by one source/language/label?)
    * and the drift complement to [[profile]]'s distinct counts (a
    * stable n_distinct can hide a collapsing distribution). Per
    * column: non-null rows, exact distinct count, entropy in nats
    * with its normalized form (entropy / ln n_distinct — 1 means
    * uniform), and HHI = Σ p² (1 means single-valued).
    *
    * Determinism: value fractions are exact divisions; entropy/HHI
    * fold their per-value terms in sorted order and round at 4 (ln
    * ulp, the psi convention). State per column is one row per
    * DISTINCT value — this is a CATEGORICAL audit tool (sources,
    * labels, priorities), not for high-cardinality ids, same caveat
    * as profile's exact distincts. Each column must hold at least one
    * non-null value: an all-null column reports entropy 0.0 here but
    * produces NO row in the SQL mirror (empty-group aggregate) — its
    * absence of data belongs to [[profile]]'s completeness, not to a
    * concentration number.
    *
    * Output: (column, n_rows, n_distinct, entropy, norm_entropy,
    * hhi) — norm_entropy NULL for a single-valued column (0/0). */
  def concentrationReport(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "concentrationReport: no columns")
    require(cols.distinct.size == cols.size,
      "concentrationReport: duplicate columns")
    cols.map { c =>
      val counts = df.where(col(c).isNotNull)
        .groupBy(col(c).cast("string").as("__v"))
        .agg(count(lit(1)).as("__n"))
      val folded = counts.agg(
        sum(col("__n")).as("__N"), count(lit(1)).as("n_distinct"),
        sort_array(collect_list(col("__n"))).as("__ns"))
      val p = (n: Column) => n.cast("double") / col("__N").cast("double")
      folded.select(
        lit(c).as("column"), col("__N").as("n_rows"), col("n_distinct"),
        round(aggregate(col("__ns"), lit(0.0),
          (acc, n) => acc - p(n) * log(p(n))), 4).as("entropy"),
        when(col("n_distinct") > 1L,
          round(aggregate(col("__ns"), lit(0.0),
            (acc, n) => acc - p(n) * log(p(n))) /
            log(col("n_distinct").cast("double")), 4))
          .as("norm_entropy"),
        round(aggregate(col("__ns"), lit(0.0),
          (acc, n) => acc + p(n) * p(n)), 4).as("hhi"))
    }.reduce(_.unionByName(_))
  }

  /** The DuckDB mirror of one [[concentrationReport]] column. */
  def concentrationSql(table: String, c: String): String =
    s"SELECT '$c' AS \"column\", CAST(sum(n) AS BIGINT) AS n_rows, " +
      "CAST(count(*) AS BIGINT) AS n_distinct, " +
      "round(list_aggregate(list_transform(list_sort(list(n)), x -> " +
      "-(CAST(x AS DOUBLE) / CAST(any_value(tot) AS DOUBLE)) * ln(CAST(x AS DOUBLE) / CAST(any_value(tot) AS DOUBLE))), 'sum'), 4) AS entropy, " +
      "CASE WHEN count(*) > 1 THEN round(list_aggregate(list_transform(list_sort(list(n)), x -> " +
      "-(CAST(x AS DOUBLE) / CAST(any_value(tot) AS DOUBLE)) * ln(CAST(x AS DOUBLE) / CAST(any_value(tot) AS DOUBLE))), 'sum') / ln(CAST(count(*) AS DOUBLE)), 4) END AS norm_entropy, " +
      "round(list_aggregate(list_transform(list_sort(list(n)), x -> " +
      "(CAST(x AS DOUBLE) / CAST(any_value(tot) AS DOUBLE)) * (CAST(x AS DOUBLE) / CAST(any_value(tot) AS DOUBLE))), 'sum'), 4) AS hhi " +
      s"FROM (SELECT CAST($c AS VARCHAR) AS v, count(*) AS n FROM $table " +
      s"WHERE $c IS NOT NULL GROUP BY 1), " +
      s"(SELECT CAST(count($c) AS BIGINT) AS tot FROM $table)"

  /** Confident-learning label-noise pruner (the Northcutt et al.
    * JAIR'21 idea at its one-margin core): rows where a trained
    * scorer CONFIDENTLY disagrees with the given label — positive
    * label but score below −margin, negative label but score above
    * +margin — are the mislabel candidates a curation loop prunes or
    * re-audits before the next distillation round (label noise is
    * where a distilled gate's ceiling comes from). Emits the flagged
    * rows only, with the disagreement direction; margin in score
    * units (log-odds for the NB gate) keeps "confident" explicit
    * rather than a hidden percentile.
    *
    * Pure per-row projection + filter — scan-speed, stream-legal,
    * output bounded by the noise rate. Deterministic: one literal
    * comparison per row on an already-deterministic score. */
  def confidentMislabels(df: DataFrame, score: Column, label: Column,
      margin: Double): DataFrame = {
    require(margin > 0, s"confidentMislabels: margin must be > 0")
    val lab = label.cast("boolean")
    df.withColumn("noise_kind",
        when(lab && score < -margin, lit("labeled_pos_scored_neg"))
          .when(!lab && score > margin, lit("labeled_neg_scored_pos")))
      .where(col("noise_kind").isNotNull)
  }

  /** Benford first-digit audit — the classic fabricated-numbers test
    * for financial/count columns: the first significant digit of
    * naturally-scaled data follows P(d) = log10(1+1/d); a flat or
    * spiked digit histogram flags synthetic or truncated data. The
    * digit comes from the INTEGER rendering of floor(|value|)
    * (identical across engines — float log10 at power-of-ten
    * boundaries is not), so values in (0,1) and NULLs/zeros are
    * excluded and counted nowhere.
    *
    * Output: one row per digit 1–9 — (digit, n, p_expected,
    * n_expected, chi_term) with chi_term = (n−e)²/e rounded at 4 —
    * plus a digit = −1 TOTAL row whose chi_term is the ordered fold
    * of the rounded terms (the psi total-row convention). Compare
    * against χ²(8): > 15.5 rejects uniform-vs-Benford at 5%. One
    * aggregate pass to 9 rows. */
  def benfordReport(df: DataFrame, c: String): DataFrame = {
    val v = abs(col(c).cast("double"))
    val digit = substring(floor(v).cast("long").cast("string"), 1, 1)
      .cast("long")
    val counts = df
      // upper bound: past 2^63 the long cast of floor(v) overflows
      // (engine-divergently) — magnitudes beyond any real ledger are
      // excluded rather than risked
      .where(col(c).isNotNull && v >= 1.0 && v < 9.0e18)
      .select(digit.as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val spine = df.sparkSession.range(1, 10).select(col("id").as("digit"))
      .join(counts, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"))
    val total = spine.agg(sum(col("n")).as("__N"))
    val pExp = (1 to 9).map(d => math.log10(1.0 + 1.0 / d))
    val pCol = (1 to 9).foldLeft(lit(0.0)) {
      case (acc, d) => when(col("digit") === d, lit(pExp(d - 1)))
        .otherwise(acc)
    }
    // (n−e)·(n−e), never pow(x, 2): both engines multiply identically,
    // pow's libm path is an ulp hazard
    val e = pCol * col("__N").cast("double")
    val diff = col("n").cast("double") - e
    val bins = spine.crossJoin(total).select(
      col("digit"), col("n"), pCol.as("p_expected"),
      e.as("n_expected"),
      round(diff * diff / e, 4).as("chi_term"))
    val totalRow = bins.agg(sum(col("n")).as("n"),
      round(aggregate(sort_array(collect_list(col("chi_term"))),
        lit(0.0), _ + _), 4).as("chi_term"))
      .select(lit(-1L).as("digit"), col("n"), lit(1.0).as("p_expected"),
        col("n").cast("double").as("n_expected"), col("chi_term"))
    bins.unionByName(totalRow)
  }

  /** t-closeness over the same generalization ladder (Li et al.,
    * ICDE'07) — the third rung of the privacy ladder: k-anonymity
    * bounds class SIZE, l-diversity bounds distinct sensitive VALUES,
    * t-closeness bounds how far a class's sensitive DISTRIBUTION sits
    * from the global one (a class that is 95% one diagnosis still
    * leaks even with l=3 distinct values). Distance is total
    * variation — ½·Σ|p_class − p_global| — the standard categorical
    * instantiation of the paper's EMD with unit ground distance.
    *
    * Determinism: fractions are single divisions of exact counts; the
    * per-class TVD folds its ≤|sensitive domain| terms in sorted
    * order and rounds at 4; per-level max is a max of rounded values.
    *
    * Scale shape: one ladder expansion, one (lvl, key, sens) count,
    * one (lvl, sens) global count, one class×domain spine join
    * (bounded by classes × domain size), one levels-sized rollup.
    * Output: (lvl, level, n_classes, n_violating_classes,
    * n_rows_at_risk, at_risk_rate, max_tvd). */
  def tCloseness(df: DataFrame, levels: Seq[(String, Seq[Column])],
      sensitive: Column, t: Double): DataFrame = {
    require(t > 0 && t < 1, s"tCloseness: t in (0,1), got $t")
    require(levels.nonEmpty, "tCloseness: need at least one level")
    require(levels.map(_._1).distinct.size == levels.size,
      "tCloseness: duplicate level names")
    val tagged = df.select(explode(array(levels.zipWithIndex.map {
      case ((name, qis), i) =>
        struct(lit(i.toLong).as("lvl"), lit(name).as("level"),
          // the kAnonymity/lDiversity key convention (\u0001 separator,
          // \u0002 NULL sentinel -- see kAnonymity for why), matching
          // tClosenessSql's chr(1)/chr(2); bare concatenation would
          // merge distinct QI tuples ("1","23") with ("12","3")
          concat_ws("\u0001",
            qis.map(q => coalesce(q.cast("string"), lit("\u0002"))): _*)
            .as("key"),
          coalesce(sensitive.cast("string"), lit("\u0002")).as("sens"))
    }: _*)).as("x")).select(col("x.*"))
    val classSens = tagged
      .groupBy(col("lvl"), col("level"), col("key"), col("sens"))
      .agg(count(lit(1)).as("nc_s"))
    val classTotals = classSens.groupBy(col("lvl"), col("level"),
        col("key"))
      .agg(sum(col("nc_s")).as("nc"))
    val globalSens = tagged.groupBy(col("lvl"), col("sens"))
      .agg(count(lit(1)).as("ng_s"))
    val globalTotals = globalSens.groupBy(col("lvl"))
      .agg(sum(col("ng_s")).as("ng"))
    // spine: every class × every sensitive value of its level, so a
    // value ABSENT from a class still contributes |0 − p_global|
    val spine = classTotals.join(globalSens, Seq("lvl"))
      .join(globalTotals, Seq("lvl"))
    val perClass = spine
      .join(classSens, Seq("lvl", "level", "key", "sens"), "left")
      .select(col("lvl"), col("level"), col("key"), col("nc"),
        abs(coalesce(col("nc_s"), lit(0L)).cast("double") /
            col("nc").cast("double") -
          col("ng_s").cast("double") / col("ng").cast("double"))
          .as("__d"))
      .groupBy(col("lvl"), col("level"), col("key"))
      .agg(max(col("nc")).as("n_rows"),
        round(aggregate(sort_array(collect_list(col("__d"))),
          lit(0.0), _ + _) / 2.0, 4).as("tvd"))
    perClass.groupBy(col("lvl"), col("level"))
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("tvd") > t, 1L).otherwise(0L))
          .as("n_violating_classes"),
        sum(when(col("tvd") > t, col("n_rows")).otherwise(lit(0L)))
          .as("n_rows_at_risk"),
        sum(col("n_rows")).as("__tot"),
        max(col("tvd")).as("max_tvd"))
      .select(col("lvl"), col("level"), col("n_classes"),
        col("n_violating_classes"), col("n_rows_at_risk"),
        (col("n_rows_at_risk").cast("double") /
          col("__tot").cast("double")).as("at_risk_rate"),
        col("max_tvd"))
  }

  /** The DuckDB mirror of one [[tCloseness]] level. */
  def tClosenessSql(table: String, lvl: Int, level: String,
      qiSql: String, sensSql: String, t: Double): String = {
    val sens = s"coalesce(CAST($sensSql AS VARCHAR), chr(2))"
    s"SELECT CAST($lvl AS BIGINT) AS lvl, '$level' AS level, " +
      "CAST(count(*) AS BIGINT) AS n_classes, " +
      s"CAST(coalesce(sum(CASE WHEN tvd > $t THEN 1 END), 0) AS BIGINT) AS n_violating_classes, " +
      s"CAST(coalesce(sum(CASE WHEN tvd > $t THEN n_rows END), 0) AS BIGINT) AS n_rows_at_risk, " +
      s"CAST(coalesce(sum(CASE WHEN tvd > $t THEN n_rows END), 0) AS DOUBLE) / CAST(sum(n_rows) AS DOUBLE) AS at_risk_rate, " +
      "max(tvd) AS max_tvd FROM (" +
      s"SELECT key, max(nc) AS n_rows, round(list_aggregate(list_sort(list(d)), 'sum') / 2.0, 4) AS tvd FROM (" +
      s"SELECT ct.key, ct.nc, abs(CAST(coalesce(cs.nc_s, 0) AS DOUBLE) / CAST(ct.nc AS DOUBLE) - CAST(gs.ng_s AS DOUBLE) / CAST(gt.ng AS DOUBLE)) AS d " +
      s"FROM (SELECT key, CAST(sum(n) AS BIGINT) AS nc FROM (SELECT concat_ws(chr(1), $qiSql) AS key, count(*) AS n FROM $table GROUP BY $qiSql, $sens) c0 GROUP BY key) ct " +
      s"CROSS JOIN (SELECT $sens AS sens, CAST(count(*) AS BIGINT) AS ng_s FROM $table GROUP BY 1) gs " +
      s"CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS ng FROM $table) gt " +
      s"LEFT JOIN (SELECT concat_ws(chr(1), $qiSql) AS key, $sens AS sens, CAST(count(*) AS BIGINT) AS nc_s FROM $table GROUP BY $qiSql, $sens) cs " +
      "ON cs.key = ct.key AND cs.sens = gs.sens" +
      ") sp GROUP BY key) pc"
  }

  /** The DuckDB mirror of one [[lDiversity]] level. */
  def lDiversitySql(table: String, lvl: Int, level: String,
      qiSql: String, sensSql: String, l: Int): String =
    s"SELECT CAST($lvl AS BIGINT) AS lvl, '$level' AS level, " +
      "CAST(count(*) AS BIGINT) AS n_classes, " +
      s"CAST(coalesce(sum(CASE WHEN n_sens >= $l THEN 1 END), 0) AS BIGINT) AS n_diverse_classes, " +
      s"CAST(coalesce(sum(CASE WHEN n_sens < $l THEN 1 END), 0) AS BIGINT) AS n_violating_classes, " +
      s"CAST(coalesce(sum(CASE WHEN n_sens < $l THEN n_rows END), 0) AS BIGINT) AS n_rows_at_risk, " +
      s"CAST(coalesce(sum(CASE WHEN n_sens < $l THEN n_rows END), 0) AS DOUBLE) / CAST(sum(n_rows) AS DOUBLE) AS at_risk_rate, " +
      "CAST(min(n_sens) AS BIGINT) AS l_effective " +
      s"FROM (SELECT count(*) AS n_rows, count(DISTINCT coalesce(CAST($sensSql AS VARCHAR), chr(2))) AS n_sens " +
      s"FROM $table GROUP BY $qiSql)"

  /** The DuckDB mirror of one [[kAnonymity]] level: `qiSql` is the
    * comma-joined quasi-identifier expression list. */
  def kAnonymitySql(table: String, lvl: Int, level: String,
      qiSql: String, k: Int): String =
    s"SELECT CAST($lvl AS BIGINT) AS lvl, '$level' AS level, " +
      "CAST(sum(n) AS BIGINT) AS n_rows, " +
      "CAST(count(*) AS BIGINT) AS n_classes, " +
      s"CAST(coalesce(sum(CASE WHEN n < $k THEN n END), 0) AS BIGINT) AS n_suppressed_rows, " +
      s"CAST(coalesce(sum(CASE WHEN n < $k THEN n END), 0) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS suppression_rate, " +
      s"CAST(coalesce(min(CASE WHEN n >= $k THEN n END), 0) AS BIGINT) AS k_effective " +
      s"FROM (SELECT count(*) AS n FROM $table GROUP BY $qiSql)"

  /** The DuckDB mirror of [[profile]] for the same column list. */
  def profileSql(table: String, cols: Seq[String]): String = {
    val aggs = ("count(*) AS n_rows" +: cols.flatMap { c =>
      Seq(s"count($c) AS nn_$c", s"count(DISTINCT $c) AS nd_$c",
        s"CAST(min($c) AS VARCHAR) AS mn_$c",
        s"CAST(max($c) AS VARCHAR) AS mx_$c")
    }).mkString(", ")
    val rows = cols.map { c =>
      s"SELECT '$c' AS \"column\", n_rows, n_rows - nn_$c AS n_nulls, " +
        s"nd_$c AS n_distinct, " +
        s"CAST(nn_$c AS DOUBLE) / greatest(n_rows, 1) AS completeness, " +
        s"mn_$c AS min_value, mx_$c AS max_value FROM w"
    }.mkString(" UNION ALL ")
    s"WITH w AS (SELECT $aggs FROM $table) $rows"
  }
}
