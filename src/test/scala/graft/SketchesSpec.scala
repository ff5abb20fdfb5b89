package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def keys(ks: Long*) = ks.toDF("k")

  private def estimates(data: Seq[Long], probes: Seq[Long],
      width: Int): Map[Long, Long] = {
    val sketch = Sketches.cmsBuild(keys(data: _*), "k", width)
    Sketches.cmsEstimate(sketch, keys(probes.distinct: _*), "k", width)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("n_est"))
      .toMap
  }

  test("cms: the estimate NEVER underestimates, and with few distinct " +
      "keys in a wide sketch it is exact") {
    val data = Seq.fill(5)(10L) ++ Seq.fill(3)(20L) ++ Seq(30L)
    val est = estimates(data, Seq(10L, 20L, 30L), width = 1024)
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (k, n) => assert(est(k) >= n, s"key $k") }
    // 3 distinct keys, 4 rows of 1024 cells: a same-cell collision in
    // EVERY row is as good as impossible — min over rows is exact
    assert(est == exact)
  }

  test("cms: a narrow sketch overestimates under collision but stays " +
      "within the e/width * N bound for every probe") {
    val data = (1L to 400L).flatMap(k => Seq.fill((k % 5 + 1).toInt)(k))
    val n = data.size.toLong
    val width = 16 // deliberately tiny: collisions guaranteed
    val est = estimates(data, (1L to 400L), width)
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    var over = 0
    exact.foreach { case (k, cnt) =>
      assert(est(k) >= cnt)
      if (est(k) > cnt) over += 1
      // CMS guarantee: err <= e/w * N with prob 1 - e^-depth; at
      // depth 4 over 400 probes a handful of 3x-bound outliers would
      // signal a broken hash family, not bad luck
      assert(est(k) - cnt <= (3 * math.E / width * n).toLong,
        s"key $k est ${est(k)} exact $cnt")
    }
    assert(over > 0, "width 16 with 400 keys must collide somewhere")
  }

  test("cms: sketches MERGE by per-cell sum — sketch(A ++ B) equals the " +
      "cell-wise union-sum of sketch(A) and sketch(B)") {
    val a = Seq(1L, 2L, 2L, 3L)
    val b = Seq(2L, 3L, 3L, 4L)
    val w = 64
    val merged = Sketches.cmsBuild(keys(a: _*), "k", w)
      .unionByName(Sketches.cmsBuild(keys(b: _*), "k", w))
      .groupBy("r", "c").agg(sum("cnt").as("cnt"))
    val direct = Sketches.cmsBuild(keys(a ++ b: _*), "k", w)
    val m = merged.collect().map(r =>
      (r.getAs[Long]("r"), r.getAs[Long]("c")) -> r.getAs[Long]("cnt")).toMap
    val d = direct.collect().map(r =>
      (r.getAs[Long]("r"), r.getAs[Long]("c")) -> r.getAs[Long]("cnt")).toMap
    assert(m == d)
  }

  private def vals(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    rows.toDF("g", "v")
  }

  test("kmv: exact below k, deterministic across partitionings and " +
      "duplicate arrivals; estimator lands inside the error bound") {
    import spark.implicits._
    val small = vals(Seq.tabulate(40)(i => ("a", i.toLong)))
    val sk = Sketches.kmvSketch(small, Seq("g"), col("v"), k = 64)
    val est = sk.select(Sketches.kmvEstimate(col("kmv"), 64))
      .as[Double].head()
    assert(est === 40.0, "below k the sketch IS the exact count")
    // duplicates and partitioning must not move the sketch
    val big = vals(Seq.tabulate(2000)(i => ("a", i.toLong)))
    val s1 = Sketches.kmvSketch(big, Seq("g"), col("v"), 64)
      .select("kmv").as[Seq[Long]].head()
    val s2 = Sketches.kmvSketch(
        big.unionByName(big).repartition(13), Seq("g"), col("v"), 64)
      .select("kmv").as[Seq[Long]].head()
    assert(s1 === s2, "pure function of the value SET")
    val e = (63.0 * Sketches.KmvSpace.toDouble) / s1(63).toDouble
    assert(math.abs(e - 2000.0) / 2000.0 < 0.4,
      s"estimate $e outside the 3-sigma band around 2000")
  }

  test("kmv: merge of per-shard sketches equals the direct sketch " +
      "of the union") {
    import spark.implicits._
    val a = vals(Seq.tabulate(900)(i => ("g1", i.toLong)))
    val b = vals(Seq.tabulate(900)(i => ("g1", (i + 450).toLong)))
    val merged = Sketches.kmvMerge(
      Sketches.kmvSketch(a, Seq("g"), col("v"), 64)
        .unionByName(Sketches.kmvSketch(b, Seq("g"), col("v"), 64)),
      Seq("g"), 64).select("kmv").as[Seq[Long]].head()
    val direct = Sketches.kmvSketch(a.unionByName(b), Seq("g"),
      col("v"), 64).select("kmv").as[Seq[Long]].head()
    assert(merged === direct)
  }

  test("kmv overlap: identical sets score jaccard exactly 1, " +
      "disjoint exactly 0, half-overlap lands near 1/3") {
    import spark.implicits._
    val rows = Seq.tabulate(1000)(i => ("p", i.toLong)) ++
      Seq.tabulate(1000)(i => ("q", i.toLong)) ++ // identical to p
      Seq.tabulate(1000)(i => ("r", (i + 500).toLong)) ++ // half of p
      Seq.tabulate(1000)(i => ("z", (i + 100000).toLong)) // disjoint
    val sk = Sketches.kmvSketch(vals(rows), Seq("g"), col("v"), 64)
    val out = Sketches.kmvOverlap(sk, "g", 64)
      .select("g_a", "g_b", "jaccard_est", "inter_est")
      .as[(String, String, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out(("p", "q"))._1 === 1.0, "identical sets: exact 1")
    assert(out(("p", "z"))._1 === 0.0, "disjoint sets: exact 0")
    val (jpr, ipr) = out(("p", "r"))
    assert(math.abs(jpr - 1.0 / 3) < 0.15, s"jaccard $jpr vs 1/3")
    assert(math.abs(ipr - 500.0) / 500.0 < 0.5, s"intersection $ipr vs 500")
  }

  test("cms: build rejects degenerate parameters") {
    intercept[IllegalArgumentException] {
      Sketches.cmsBuild(keys(1L), "k", width = 1)
    }
    intercept[IllegalArgumentException] {
      Sketches.cmsBuild(keys(1L), "k", width = 16, seeds = Seq.empty)
    }
  }
}
