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

  test("cms: build rejects degenerate parameters") {
    intercept[IllegalArgumentException] {
      Sketches.cmsBuild(keys(1L), "k", width = 1)
    }
    intercept[IllegalArgumentException] {
      Sketches.cmsBuild(keys(1L), "k", width = 16, seeds = Seq.empty)
    }
  }
}
