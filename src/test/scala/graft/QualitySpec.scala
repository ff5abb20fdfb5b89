package graft

import graft.operators.Quality
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  // 10 rows: id unique; k has nulls (2) and dups; v numeric with a
  // negative outlier; s in a 2-value domain except one stray
  private def frame = Seq(
    (1L, Option(10L), 1.5, "a"), (2L, Option(10L), 2.5, "a"),
    (3L, Option(20L), 0.25, "b"), (4L, None, 4.0, "b"),
    (5L, Option(30L), -1.0, "a"), (6L, Option(30L), 0.5, "zzz"),
    (7L, Option(40L), 3.25, "b"), (8L, None, 2.0, "a"),
    (9L, Option(50L), 1.0, "b"), (10L, Option(50L), 0.75, "a"))
    .toDF("id", "k", "v", "s")

  test("check: one pass, exact metrics, verdicts in suite order") {
    val suite = Seq(
      Quality.completeness("k_complete", "k"),            // 0.8 < 1 fail
      Quality.completenessAtLeast("k_mostly", "k", 0.75), // pass
      Quality.uniqueRatio("id_unique", "id", ">=", 1.0),  // pass
      Quality.uniqueRatio("k_card", "k", "<=", 0.7),      // 5/8 pass
      Quality.fractionWhere("s_domain", "s",
        col("s").isin("a", "b"), ">=", 1.0),              // 0.9 fail
      Quality.minOf("v_nonneg", "v", ">=", 0.0),          // -1 fail
      Quality.maxOf("v_cap", "v", "<=", 4.0),             // pass
      Quality.meanOf("v_mean", "v", "<=", 2.0))           // 1.475 pass
    val out = Quality.check(frame, suite)
    // ONE scan: the whole suite folds into aggregates over a single
    // leaf — no self-join/union re-reading the source
    assert(out.queryExecution.optimizedPlan.collectLeaves().size === 1)
    val rows = out.collect().map(r =>
      (r.getString(0), r.getDouble(2), r.getBoolean(5)))
    assert(rows.map(_._1).toSeq ===
      suite.map(_.name), "suite order preserved")
    val byName = rows.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byName("k_complete") === ((0.8, false)))
    assert(byName("k_mostly") === ((0.8, true)))
    assert(byName("id_unique") === ((1.0, true)))
    assert(byName("k_card") === ((0.625, true)))
    assert(byName("s_domain") === ((0.9, false)))
    assert(byName("v_nonneg") === ((-1.0, false)))
    assert(byName("v_cap") === ((4.0, true)))
    assert(byName("v_mean") === ((1.475, true)))
  }

  test("check: null predicate rows count as failures; null metric fails " +
      "loudly instead of passing vacuously") {
    val df = Seq((1L, Option("x")), (2L, None), (3L, Option("y")))
      .toDF("id", "s")
      .withColumn("allnull", lit(null).cast("double"))
    val out = Quality.check(df, Seq(
      // s = 'x' is NULL on the null row -> counted as non-compliant
      Quality.fractionWhere("s_is_x", "s", col("s") === "x", ">=", 0.5),
      // min(allnull) is NULL -> pass coalesces to false
      Quality.minOf("ghost_floor", "allnull", ">=", 0.0)))
      .collect().map(r => r.getString(0) -> r.getBoolean(5)).toMap
    assert(out("s_is_x") === false) // 1/3 < 0.5
    assert(out("ghost_floor") === false)
  }

  test("approxUniqueRatio: no Expand in the plan (the exact flavor has " +
      "one), estimate within tolerance") {
    val big = spark.range(10000)
      .select(col("id"), (col("id") % 97).as("k"), (col("id") % 7).as("j"))
    // Expand appears once the suite holds DISTINCTs on >=2 columns (a
    // single distinct is rewritten as a two-phase group-by instead)
    val exact = Quality.check(big, Seq(
      Quality.uniqueRatio("u", "k", "<=", 1.0),
      Quality.uniqueRatio("u2", "j", "<=", 1.0)))
    val approx = Quality.check(big, Seq(
      Quality.approxUniqueRatio("u", "k", "<=", 1.0),
      Quality.approxUniqueRatio("u2", "j", "<=", 1.0)))
    val exactPlan = exact.queryExecution.executedPlan.toString
    val approxPlan = approx.queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"), "exact distinct expands (control)")
    assert(!approxPlan.contains("Expand"), "HLL flavor must not expand")
    val est = approx.collect().head.getDouble(2)
    val truth = 97.0 / 10000
    assert(math.abs(est - truth) <= truth * 0.15,
      s"estimate $est vs $truth")
  }

  test("check: rejects duplicate names and bad ops") {
    intercept[IllegalArgumentException] {
      Quality.check(frame, Seq(
        Quality.minOf("m", "v", ">=", 0), Quality.maxOf("m", "v", "<=", 1)))
    }
    intercept[IllegalArgumentException] {
      Quality.Constraint("x", "v", lit(1.0), "==", 1.0)
    }
    // names flow into checkSql as SQL literals — quotes are refused
    // at construction, not discovered when the oracle breaks
    intercept[IllegalArgumentException] {
      Quality.Constraint("bad'name", "v", lit(1.0), ">=", 1.0)
    }
  }

  test("profile: nulls, exact distincts, portable min/max strings, one " +
      "scan") {
    val out = Quality.profile(frame, Seq("id", "k", "s"))
    assert(out.queryExecution.optimizedPlan.collectLeaves().size === 1)
    val rows = out.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
        r.getString(5), r.getString(6)))).toMap
    // min/max computed on the TYPED column, then rendered: "10" not "9"
    assert(rows("id") === ((10L, 0L, 10L, 1.0, "1", "10")))
    assert(rows("k") === ((10L, 2L, 5L, 0.8, "10", "50")))
    assert(rows("s") === ((10L, 0L, 3L, 1.0, "a", "zzz")))
  }

  test("enforce: passes through clean data, throws naming every " +
      "failing constraint") {
    val suite = Seq(
      Quality.uniqueRatio("id_unique", "id", ">=", 1.0),
      Quality.maxOf("v_cap", "v", "<=", 10.0))
    assert(Quality.enforce(frame, suite).count() === 10L)
    val dirty = frame.union(frame.limit(1)) // dup id breaks uniqueness
      .withColumn("v", col("v") * 100)      // and the cap
    val e = intercept[IllegalStateException] {
      Quality.enforce(dirty, suite)
    }
    assert(e.getMessage.contains("2 constraint(s) failed"))
    assert(e.getMessage.contains("id_unique") &&
      e.getMessage.contains("v_cap"))
  }

  test("profileDiff: flags null/cardinality/range drift per column, " +
      "quiet columns stay quiet, all-null min is a range change") {
    val yesterday = Seq(
      (1L, Option("a"), Option(10L)), (2L, Option("b"), Option(20L)),
      (3L, Option("c"), Option(30L)), (4L, Option("d"), Option(40L)))
      .toDF("id", "s", "v")
    // today: s loses half its values to null (null jump 0.5),
    // v collapses to one value (ratio 1.0 -> 0.25 + range shift),
    // id untouched
    val today = Seq(
      (1L, Option("a"), Option(7L)), (2L, None, Option(7L)),
      (3L, Option("c"), Option(7L)), (4L, None, Option(7L)))
      .toDF("id", "s", "v")
    val diff = graft.operators.Quality.profileDiff(
      Quality.profile(yesterday, Seq("id", "s", "v")),
      Quality.profile(today, Seq("id", "s", "v")),
      maxNullRateJump = 0.1, maxDistinctRatioJump = 0.1)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Boolean]("null_drift"),
          r.getAs[Boolean]("cardinality_drift"),
          r.getAs[Boolean]("range_drift"),
          r.getAs[Boolean]("drifted")))).toMap
    assert(diff("id") === ((false, false, false, false)))
    assert(diff("s") === ((true, true, true, true))) // d -> c max shift too
    assert(diff("v") === ((false, true, true, true)))

    // an all-null column today: min/max strings go NULL — null-safe
    // compare must report range drift, not silent equality
    val gone = today.withColumn("v", lit(null).cast("long"))
    val d2 = Quality.profileDiff(
      Quality.profile(yesterday, Seq("v")),
      Quality.profile(gone, Seq("v")), 2.0, 2.0)
      .collect().head
    assert(d2.getAs[Boolean]("range_drift") === true,
      "range_drift on vanished column")
    assert(d2.getAs[Boolean]("drifted") === true)
  }

  test("profileDiff: a column that appears or vanishes between " +
      "snapshots is a drifted row, not a silently-missing one") {
    val yesterday = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val today = Seq((1L, 10L), (2L, 20L)).toDF("id", "v")
    val diff = Quality.profileDiff(
      Quality.profile(yesterday, Seq("id", "s")),
      Quality.profile(today, Seq("id", "v")),
      maxNullRateJump = 0.5, maxDistinctRatioJump = 0.5)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(diff.keySet === Set("id", "s", "v"),
      "full outer join: every column from either side gets a row")
    // vanished column: present old-side only, always drifted
    val s = diff("s")
    assert(s.getAs[Boolean]("in_old") && !s.getAs[Boolean]("in_new"))
    assert(s.getAs[Boolean]("drifted"))
    // appeared column: present new-side only, always drifted
    val v = diff("v")
    assert(!v.getAs[Boolean]("in_old") && v.getAs[Boolean]("in_new"))
    assert(v.getAs[Boolean]("drifted"))
    // the jump booleans on a one-sided row are false (not null) —
    // presence carries the drift, comparisons stay two-valued
    assert(!s.getAs[Boolean]("null_drift") &&
      !s.getAs[Boolean]("cardinality_drift"))
    // shared, unchanged column stays quiet
    val id = diff("id")
    assert(id.getAs[Boolean]("in_old") && id.getAs[Boolean]("in_new"))
    assert(!id.getAs[Boolean]("drifted"))
  }

  test("profileShard/mergeProfileShards: exact fields survive any " +
      "sharding, distinct estimate tracks exact") {
    val big = spark.range(1000).select(col("id"),
      (col("id") % 37).cast("long").as("k"),
      concat(lit("s"), (col("id") % 97).cast("string")).as("s"))
      .withColumn("k", when(col("id") % 10 === 0, lit(null)).otherwise(col("k")))
    val cols = Seq("id", "k", "s")
    def shard(m: Long) = (0L until m).map(i =>
      Quality.profileShard(big.where(col("id") % m === i), cols))
      .reduce(_ unionByName _)
    val exact = Quality.profile(big, cols).collect()
      .map(r => r.getString(0) -> r).toMap
    for (m <- Seq(1L, 4L)) {
      val merged = Quality.mergeProfileShards(shard(m), cols).collect()
        .map(r => r.getString(0) -> r).toMap
      cols.foreach { c =>
        val (e, g) = (exact(c), merged(c))
        // n_rows, n_nulls, completeness, min, max: merge-lossless
        assert(g.getLong(1) === e.getLong(1), s"$c n_rows @$m")
        assert(g.getLong(2) === e.getLong(2), s"$c n_nulls @$m")
        assert(g.getDouble(4) === e.getDouble(4), s"$c completeness @$m")
        assert(g.getString(5) === e.getString(5), s"$c min @$m")
        assert(g.getString(6) === e.getString(6), s"$c max @$m")
        // the HLL estimate is the one approximate field
        val est = g.getLong(3); val truth = e.getLong(3)
        assert(math.abs(est - truth) <= math.max(1L, truth / 20),
          s"$c distinct est $est vs $truth @$m")
      }
    }
    // shard REORDERING: exact fields identical; the HLL estimate is
    // allowed to wobble (DataSketches' HIP accumulator is
    // presentation-order-dependent — the scaladoc's caveat) but must
    // stay inside the tolerance band both ways
    val fwd = Quality.mergeProfileShards(shard(4L), cols).collect()
      .map(r => r.getString(0) -> r).toMap
    val rev = Quality.mergeProfileShards(
      (3L to 0L by -1L).map(i =>
        Quality.profileShard(big.where(col("id") % 4 === i), cols))
        .reduce(_ unionByName _), cols).collect()
      .map(r => r.getString(0) -> r).toMap
    cols.foreach { c =>
      Seq(1, 2, 5, 6).foreach(i => assert(fwd(c).get(i) === rev(c).get(i)))
      val truth = exact(c).getLong(3)
      assert(math.abs(rev(c).getLong(3) - truth) <= math.max(1L, truth / 20))
    }
  }

  test("psi: hand-computed bins, add-1 smoothing on empty bins, null " +
      "exclusion, ordered-fold total, identical sides -> 0") {
    // edges (10, 20): bins (-inf,10) / [10,20) / [20,inf)
    val old_ = Seq(1.0, 5.0, 12.0, 25.0).toDF("x")
    val new_ = Seq(Option(11.0), Option(13.0), Option(30.0), None)
      .toDF("x") // null excluded -> n=3; bin0 EMPTY (smoothing leg)
    val rows = Quality.psi(old_, new_, "x", Seq(10.0, 20.0))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(rows.keySet === Set(-1L, 0L, 1L, 2L))
    // smoothed fractions: p = (n+1)/(tot+3), tot_old=4, tot_new=3
    def term(no: Long, nn: Long) = {
      val po = (no + 1.0) / 7.0; val pn = (nn + 1.0) / 6.0
      BigDecimal((pn - po) * math.log(pn / po))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(rows(0L) === ((2L, 0L, 3.0 / 7, 1.0 / 6, term(2, 0))))
    assert(rows(1L) === ((1L, 2L, 2.0 / 7, 3.0 / 6, term(1, 2))))
    assert(rows(2L) === ((1L, 1L, 2.0 / 7, 2.0 / 6, term(1, 1))))
    val expTotal = Seq(term(2, 0), term(1, 2), term(1, 1)).sorted.sum
    assert(rows(-1L)._1 === 4L && rows(-1L)._2 === 3L)
    assert(math.abs(rows(-1L)._5 - expTotal) < 1e-9)
    assert(rows(-1L)._5 > 0.25, "a 2/4->0/3 bin collapse reads as drifted")
    // identical distributions: every term and the total are exactly 0
    val same = Quality.psi(old_, old_, "x", Seq(10.0, 20.0))
      .select(col("psi_term")).as[Double].collect()
    assert(same.forall(_ === 0.0))
    intercept[IllegalArgumentException] {
      Quality.psi(old_, new_, "x", Seq(20.0, 10.0))
    }
    // production shape: the baseline survives a parquet round trip and
    // psiFromBaseline reproduces psi bit-for-bit (it IS the definition)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_psi_base").toString + "/baseline"
    Quality.binCounts(old_, "x", Seq(10.0, 20.0)).write.parquet(dir)
    val replayed = Quality.psiFromBaseline(
      spark.read.parquet(dir), new_, "x", Seq(10.0, 20.0))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
    val direct = Quality.psi(old_, new_, "x", Seq(10.0, 20.0))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
    assert(replayed === direct)

    // a baseline built with MORE edges than the ones passed in has
    // bins beyond the spine — that artifact mismatch must raise, not
    // silently drop baseline mass off the left join
    val wideBaseline =
      Quality.binCounts(old_, "x", Seq(5.0, 10.0, 15.0, 20.0))
    val err = intercept[Exception] {
      Quality.psiFromBaseline(wideBaseline, new_, "x", Seq(10.0, 20.0))
        .collect()
    }
    assert(err.getMessage.contains("baseline bin outside"),
      s"expected the artifact-mismatch raise, got: ${err.getMessage}")
  }

  test("binCounts/psi: NaN values are excluded like NULL, not binned " +
      "into the top bucket by NaN-ordering semantics") {
    val edges = Seq(10.0, 20.0)
    val clean = Seq(5.0, 15.0, 25.0).toDF("x")
    val dirty = Seq(5.0, 15.0, 25.0, Double.NaN, Double.NaN).toDF("x")
    val cleanCounts = Quality.binCounts(clean, "x", edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dirtyCounts = Quality.binCounts(dirty, "x", edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dirtyCounts === cleanCounts,
      "NaN rows must not land in any bin (they would hit the top bin " +
        "via NaN > everything ordering)")
    // grouped flavor applies the same guard
    val dirtyG = Seq(("a", 5.0), ("a", Double.NaN), ("b", 25.0))
      .toDF("g", "x")
    val psiG = Quality.psiByGroup(dirtyG, dirtyG, "x", "g", edges)
      .filter(col("bin") =!= lit(-1L))
    val totals = psiG.groupBy(col("g"))
      .agg(sum(col("n_old")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(totals === Map("a" -> 1L, "b" -> 1L),
      "per-group bin totals count only non-NaN values")
  }

  test("orphanRate: nulls are incomplete not orphaned, duplicate " +
      "parents count once, exact rate") {
    val parent = Seq(1L, 2L, 2L, 3L).toDF("pk") // dup parent keys
    val child = Seq(Option(1L), Option(2L), Option(9L), Option(8L), None)
      .toDF("fk")
    val r = Quality.orphanRate(child, "fk", parent, "pk").collect().head
    assert(r.getLong(0) === 5L)  // n_child counts ALL rows
    assert(r.getLong(1) === 1L)  // the null key
    assert(r.getLong(2) === 2L)  // 9 and 8
    assert(r.getDouble(3) === 0.5) // 2 of 4 non-null
    // intact relation: exactly zero
    val ok = Quality.orphanRate(parent.toDF("fk"), "fk", parent, "pk")
      .collect().head
    assert(ok.getLong(2) === 0L && ok.getDouble(3) === 0.0)
  }

  test("approxProfile: profile's exact fields, HLL distinct, no Expand") {
    val big = spark.range(5000).select(col("id"),
      (col("id") % 61).as("k"))
    val ap = Quality.approxProfile(big, Seq("id", "k"))
    assert(!ap.queryExecution.executedPlan.toString.contains("Expand"))
    val rows = ap.collect().map(r => r.getString(0) -> r).toMap
    val ex = Quality.profile(big, Seq("id", "k")).collect()
      .map(r => r.getString(0) -> r).toMap
    Seq("id", "k").foreach { c =>
      Seq(1, 2, 4, 5, 6).foreach(i => assert(rows(c).get(i) === ex(c).get(i)))
      val (est, truth) = (rows(c).getLong(3), ex(c).getLong(3))
      assert(math.abs(est - truth) <= math.max(1L, truth / 20), s"$c")
    }
  }

  test("psi invariants: every term >= 0 (same-sign product), swap " +
      "symmetry, empty side finite, counts conserved") {
    val edges = Seq(5.0, 10.0)
    val frames = Seq(
      "uniform" -> Seq(1.0, 4.0, 6.0, 9.0, 11.0, 14.0),
      "low-skew" -> Seq(1.0, 1.0, 2.0, 3.0, 4.0, 4.5),
      "high-skew" -> Seq(11.0, 12.0, 13.0, 14.0),
      "edge-exact" -> Seq(5.0, 10.0, 5.0, 10.0),
      "empty" -> Seq.empty[Double])
    for ((na, a) <- frames; (nb, b) <- frames) {
      val ad = a.toDF("x"); val bd = b.toDF("x")
      val fwd = Quality.psi(ad, bd, "x", edges).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getDouble(5)))).toMap
      // (p_new - p_old) and ln(p_new/p_old) always share sign, so
      // every term — and the total — is >= 0 on ANY pair of inputs
      fwd.values.foreach { case (_, _, t) =>
        assert(t >= 0.0 && !t.isNaN && !t.isInfinite, s"$na vs $nb: $t")
      }
      // counts conserved through binning + smoothing bookkeeping
      assert(fwd(-1L)._1 === a.size.toLong, s"$na n_old")
      assert(fwd(-1L)._2 === b.size.toLong, s"$nb n_new")
      // the formula is symmetric in (old, new): swapping sides leaves
      // every per-bin term — hence the total — identical
      val rev = Quality.psi(bd, ad, "x", edges).collect()
        .map(r => r.getLong(0) -> r.getDouble(5)).toMap
      fwd.foreach { case (bin, (_, _, t)) =>
        assert(rev(bin) === t, s"$na/$nb bin $bin") }
    }
  }

  test("jsDivergence invariants: every term in [0, ln 2], swap " +
      "symmetry, identical sides ~0, and it stays BOUNDED where psi " +
      "explodes (the disjoint-corpora case)") {
    val edges = Seq(5.0, 10.0)
    val frames = Seq(
      "uniform" -> Seq(1.0, 4.0, 6.0, 9.0, 11.0, 14.0),
      "low-skew" -> Seq(1.0, 1.0, 2.0, 3.0, 4.0, 4.5),
      "high-skew" -> Seq(11.0, 12.0, 13.0, 14.0),
      "empty" -> Seq.empty[Double])
    val ln2 = math.log(2.0)
    for ((na, a) <- frames; (nb, b) <- frames) {
      val ad = a.toDF("x"); val bd = b.toDF("x")
      val fwd = Quality.jsDivergence(ad, bd, "x", edges).collect()
        .map(r => r.getLong(0) -> r.getDouble(5)).toMap
      fwd.foreach { case (bin, t) =>
        assert(t >= -1e-12 && !t.isNaN && !t.isInfinite, s"$na/$nb $bin")
        assert(t <= ln2 + 1e-9, s"$na/$nb bin $bin: $t > ln2")
      }
      val rev = Quality.jsDivergence(bd, ad, "x", edges).collect()
        .map(r => r.getLong(0) -> r.getDouble(5)).toMap
      fwd.foreach { case (bin, t) => assert(rev(bin) === t) }
    }
    val same = Seq(1.0, 6.0, 12.0).toDF("x")
    Quality.jsDivergence(same, same, "x", edges)
      .select(col("js_term")).as[Double].collect()
      .foreach(t => assert(t === 0.0))
    // disjoint corpora: psi total is large and unbounded-ish, js total
    // saturates below ln 2 — the dashboard-trend property
    val lo = Seq.fill(50)(1.0).toDF("x")
    val hi = Seq.fill(50)(14.0).toDF("x")
    val psiTot = Quality.psi(lo, hi, "x", edges)
      .filter(col("bin") === -1L).head().getDouble(5)
    val jsTot = Quality.jsDivergence(lo, hi, "x", edges)
      .filter(col("bin") === -1L).head().getDouble(5)
    assert(psiTot > 2 * ln2)
    assert(jsTot <= ln2 + 1e-9 && jsTot > 0.3)
  }

  test("psiByGroup: per-stratum totals, union-of-groups (vanished and " +
      "appeared sources still report), stable stratum reads ~0") {
    val edges = Seq(10.0)
    val old_ = Seq(("a", 1.0), ("a", 2.0), ("a", 15.0),
      ("b", 1.0), ("b", 20.0), ("gone", 5.0)).toDF("src", "x")
    // a: unchanged; b: all mass moves above the edge; gone: vanished;
    // fresh: appeared
    val new_ = Seq(("a", 1.0), ("a", 2.0), ("a", 15.0),
      ("b", 11.0), ("b", 20.0), ("fresh", 3.0)).toDF("src", "x")
    val out = Quality.psiByGroup(old_, new_, "x", "src", edges)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(6)))).toMap
    // 4 groups x (2 bins + total)
    assert(out.keySet.map(_._1) === Set("a", "b", "gone", "fresh"))
    assert(out.size === 12)
    def total(g: String) = out((g, -1L))
    assert(total("a") === ((3L, 3L, 0.0)), "unchanged stratum is exactly 0")
    assert(total("b")._3 > 0.0, "shifted stratum drifts")
    // vanished/appeared: the empty side is all-smoothing — loudly
    // drifted, never a crash or a silent drop
    assert(total("gone") === ((1L, 0L, total("gone")._3)))
    assert(total("fresh")._1 === 0L && total("fresh")._2 === 1L)
    assert(total("gone")._3 > total("a")._3)
    assert(total("fresh")._3 > total("a")._3)
  }

  test("checkSql/profileSql render one row per constraint/column") {
    val suite = Seq(Quality.completeness("c", "k"),
      Quality.maxOf("m", "v", "<=", 4.0))
    val sql = Quality.checkSql("t", suite,
      Seq("CAST(count(k) AS DOUBLE) / count(*)", "CAST(max(v) AS DOUBLE)"))
    assert(sql.split("UNION ALL").length === 2)
    assert(sql.contains("'c' AS name") && sql.contains("m1 <= 4.0"))
    val psql = Quality.profileSql("t", Seq("a", "b"))
    assert(psql.split("UNION ALL").length === 2)
    assert(psql.contains("count(DISTINCT a) AS nd_a"))
  }

  test("kAnonymity: per-level class counts, suppression, and achieved " +
      "k follow the generalization ladder") {
    // 12 rows: (region, age) QIs — raw level has classes of sizes
    // 4/4/2/1/1; region-only has 9/3
    val df = Seq(
      ("east", 30), ("east", 30), ("east", 30), ("east", 30),
      ("east", 40), ("east", 40), ("east", 40), ("east", 40),
      ("west", 30), ("west", 30), ("east", 55), ("west", 99))
      .toDF("region", "age")
    val out = Quality.kAnonymity(df, Seq(
        "raw" -> Seq(col("region"), col("age")),
        "region_only" -> Seq(col("region"))), k = 3)
      .collect().map(r => r.getAs[String]("level") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_classes"),
          r.getAs[Long]("n_suppressed_rows"),
          r.getAs[Double]("suppression_rate"),
          r.getAs[Long]("k_effective")))).toMap
    assert(out("raw") == ((12L, 5L, 4L, 4.0 / 12.0, 4L)))
    assert(out("region_only") == ((12L, 2L, 0L, 0.0, 3L)))
  }

  test("kAnonymity: NULL quasi-identifiers form their own class and " +
      "cannot collide with adjacent fields; all-suppressed reports " +
      "k_effective 0") {
    val df = Seq((Some("a"), None: Option[String]), (None, Some("a")),
        (Some("a"), None), (None, Some("a")))
      .toDF("x", "y")
    val out = Quality.kAnonymity(df,
        Seq("xy" -> Seq(col("x"), col("y"))), k = 2)
      .collect().head
    // ("a",NULL) and (NULL,"a") are DISTINCT classes of 2 each
    assert(out.getAs[Long]("n_classes") == 2L)
    assert(out.getAs[Long]("n_suppressed_rows") == 0L)
    val strict = Quality.kAnonymity(df,
        Seq("xy" -> Seq(col("x"), col("y"))), k = 3)
      .collect().head
    assert(strict.getAs[Long]("n_suppressed_rows") == 4L)
    assert(strict.getAs[Long]("k_effective") == 0L)
    intercept[IllegalArgumentException](
      Quality.kAnonymity(df, Seq("a" -> Seq(col("x"))), k = 1))
    intercept[IllegalArgumentException](
      Quality.kAnonymity(df, Seq.empty, k = 2))
  }

  test("lDiversity: homogeneous classes flagged, NULL sensitive is one " +
      "ordinary value, l_effective = worst class") {
    import spark.implicits._
    val df = Seq(
      // class A: 3 rows, sensitive {x, y, z} -> diverse at l=2
      ("A", Some("x")), ("A", Some("y")), ("A", Some("z")),
      // class B: 2 rows, both "x" -> homogeneous (the attack case)
      ("B", Some("x")), ("B", Some("x")),
      // class C: NULL + "x" -> NULL counts as its own single value
      ("C", None), ("C", Some("x"))).toDF("qi", "sens")
    val out = Quality.lDiversity(df, Seq("qi" -> Seq(col("qi"))),
      col("sens"), l = 2).collect().head
    assert(out.getLong(2) == 3L) // n_classes
    assert(out.getLong(3) == 2L) // diverse: A and C
    assert(out.getLong(4) == 1L) // violating: B
    assert(out.getLong(5) == 2L) // rows at risk: B's 2
    assert(out.getDouble(6) == 2.0 / 7.0)
    assert(out.getLong(7) == 1L) // l_effective: B's single value
    // two NULLs are the SAME sentinel value, not two distinct ones
    val nn = Quality.lDiversity(
      Seq(("D", None: Option[String]), ("D", None)).toDF("qi", "sens"),
      Seq("only" -> Seq(col("qi"))), col("sens"), l = 2).collect().head
    assert(nn.getLong(7) == 1L)
    intercept[IllegalArgumentException](
      Quality.lDiversity(df, Seq("a" -> Seq(col("qi"))), col("sens"), 1))
  }

  test("concentrationReport: uniform column norm-entropy 1, skewed " +
      "column HHI toward 1, single-valued column NULL norm-entropy") {
    import spark.implicits._
    val df = Seq(
      ("a", "x", "k"), ("b", "x", "k"), ("c", "x", "k"), ("d", "y", "k"))
      .toDF("uniform", "skew", "constant")
    val out = Quality.concentrationReport(df,
        Seq("uniform", "skew", "constant"))
      .collect().map(r => (r.getString(0), r)).toMap
    val u = out("uniform")
    assert(u.getLong(2) == 4L)
    assert(u.getDouble(3) ==
      BigDecimal(math.log(4.0)).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(u.getDouble(4) == 1.0) // uniform -> normalized entropy 1
    assert(u.getDouble(5) == 0.25) // HHI = 4·(1/4)²
    val s = out("skew") // p = (3/4, 1/4): HHI = 9/16 + 1/16 = .625
    assert(s.getDouble(5) == 0.625)
    assert(s.getDouble(4) < 1.0)
    val c = out("constant")
    assert(c.getLong(2) == 1L && c.getDouble(3) == 0.0 && c.isNullAt(4)
      && c.getDouble(5) == 1.0)
    intercept[IllegalArgumentException](
      Quality.concentrationReport(df, Seq.empty))
  }

  test("confidentMislabels: only confident DISAGREEMENTS flag, " +
      "direction labeled, margin exclusive") {
    import spark.implicits._
    val df = Seq(
      (1L, 5.0, true),   // confident agree -> clean
      (2L, -5.0, true),  // labeled pos, scored hard neg -> noise
      (3L, 5.0, false),  // labeled neg, scored hard pos -> noise
      (4L, -0.5, true),  // inside the margin -> clean
      (5L, -1.0, true))  // AT the margin: not strictly beyond -> clean
      .toDF("id", "score", "label")
    val out = Quality.confidentMislabels(df, col("score"), col("label"),
        margin = 1.0)
      .collect().map(r => (r.getLong(0), r.getString(3))).toMap
    assert(out == Map(2L -> "labeled_pos_scored_neg",
      3L -> "labeled_neg_scored_pos"))
    intercept[IllegalArgumentException](
      Quality.confidentMislabels(df, col("score"), col("label"), 0.0))
  }

  test("benfordReport: hand-built digit histogram, spine keeps empty " +
      "digits, chi total is the ordered fold, sub-1 values excluded") {
    import spark.implicits._
    // 1xx appears 4x, 2xx 1x, 9 1x; 0.5 excluded
    val df = Seq(100.0, 150.0, 199.0, 1.0, 250.0, 9.0, 0.5, -120.0)
      .toDF("v")
    val out = Quality.benfordReport(df, "v")
      .collect().map(r => (r.getLong(0), r)).toMap
    assert(out(1L).getLong(1) == 5L) // incl. abs(-120)
    assert(out(2L).getLong(1) == 1L)
    assert(out(9L).getLong(1) == 1L)
    assert(out(3L).getLong(1) == 0L) // spine keeps it
    assert(out(-1L).getLong(1) == 7L)
    assert(out(1L).getDouble(2) == math.log10(2.0))
    // total chi = sum of the 9 rounded terms
    val terms = (1L to 9L).map(d => out(d).getDouble(4))
    assert(math.abs(out(-1L).getDouble(4) - terms.sorted.sum) < 5e-4)
    // magnitudes past the long boundary are excluded, not risked
    val big = Quality.benfordReport(
      Seq(5.0, 1.0e19).toDF("v"), "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(big(-1L) == 1L && big(5L) == 1L)
  }

  test("tCloseness: hand-computed TVD with absent-value spine, " +
      "homogeneous class maximal, global-mirroring class zero") {
    import spark.implicits._
    // global: 4×x, 4×y -> p = (.5, .5)
    val df = Seq(
      ("A", "x"), ("A", "y"), ("A", "x"), ("A", "y"), // mirrors global
      ("B", "x"), ("B", "x"),                          // homogeneous x
      ("C", "y"), ("C", "y")).toDF("qi", "sens")
    val out = Quality.tCloseness(df, Seq("l0" -> Seq(col("qi"))),
      col("sens"), t = 0.4).collect().head
    // TVD: A = 0; B = ½(|1-.5| + |0-.5|) = .5; C = .5 -> 2 violations
    assert(out.getLong(2) == 3L)
    assert(out.getLong(3) == 2L)
    assert(out.getLong(4) == 4L) // B and C rows
    assert(out.getDouble(5) == 4.0 / 8.0)
    assert(out.getDouble(6) == 0.5)
    intercept[IllegalArgumentException](
      Quality.tCloseness(df, Seq("a" -> Seq(col("qi"))), col("sens"), 1.0))
  }

  test("binaryEval: hand-counted confusion matrix, single-division " +
      "rates, NULLs counted apart, zero denominators stay NULL") {
    import spark.implicits._
    val df = Seq(
      (Some(true), Some(true)), (Some(true), Some(true)),   // tp x2
      (Some(true), Some(false)),                            // fp
      (Some(false), Some(true)), (Some(false), Some(true)),
      (Some(false), Some(true)),                            // fn x3
      (Some(false), Some(false)), (Some(false), Some(false)), // tn x2
      (None, Some(true)), (Some(true), None))               // nulls x2
      .toDF("p", "t")
    val out = Quality.binaryEval(df, col("p"), col("t")).collect().head
    assert((out.getLong(0), out.getLong(1), out.getLong(2),
      out.getLong(3), out.getLong(4)) == ((2L, 1L, 3L, 2L, 2L)))
    assert(out.getDouble(5) == 4.0 / 8.0)  // accuracy
    assert(out.getDouble(6) == 2.0 / 3.0)  // precision
    assert(out.getDouble(7) == 2.0 / 5.0)  // recall
    assert(out.getDouble(8) == 4.0 / 8.0)  // f1 = 2tp/(2tp+fp+fn)
    // degenerate: never predicts positive -> precision NULL, not 0
    val neg = Quality.binaryEval(
      Seq((false, true), (false, false)).toDF("p", "t"),
      col("p"), col("t")).collect().head
    assert(neg.isNullAt(6) && neg.getDouble(7) == 0.0)
  }

  test("calibrationBins: psi bin layout, empirical positive rate per " +
      "bin, NULL score excluded") {
    import spark.implicits._
    val df = Seq(
      (Some(-1.0), false), (Some(-0.5), false), (Some(-0.1), true),
      (Some(0.2), true), (Some(0.9), true), (Some(0.4), false),
      (None, true)).toDF("s", "keep")
    val out = Quality.calibrationBins(df, "s", col("keep"), Seq(0.0))
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(0L) == ((3L, 1L, 1.0 / 3.0))) // below 0: one true
    assert(out(1L) == ((3L, 2L, 2.0 / 3.0))) // at/above 0: two true
    intercept[IllegalArgumentException](
      Quality.calibrationBins(df, "s", col("keep"), Seq.empty))
  }
}
