package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def tris(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Double)] =
    Graph.triangleCounts(edges.toDF("src", "dst")).collect()
      .map(r => r.getAs[Long]("node") ->
        ((r.getAs[Long]("degree"), r.getAs[Long]("n_tri"),
          r.getAs[Double]("clustering")))).toMap

  test("triangleCounts: K4 — every node sits in C(3,2)=3 triangles with " +
      "clustering exactly 1") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val r = tris(k4)
    assert(r.size == 4)
    r.values.foreach { case (deg, t, c) =>
      assert(deg == 3L); assert(t == 3L); assert(c == 1.0)
    }
  }

  test("triangleCounts: a path and a star are triangle-free; degree-1 " +
      "nodes report clustering 0 (not NaN)") {
    val path = tris(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(path.values.forall(_._2 == 0L))
    assert(path(1L) == ((1L, 0L, 0.0)))
    val star = tris((2L to 6L).map(i => (1L, i)))
    assert(star.values.forall(_._2 == 0L))
    assert(star(1L)._1 == 5L)
  }

  test("triangleCounts: apexWaves chunking is bit-identical to the " +
      "single-job plan on a triangle-rich random graph") {
    // dense-ish deterministic graph: cliques bridged by a random
    // sprinkle, so triangles span wave boundaries in every direction
    val rnd = new scala.util.Random(31)
    val cliques = for {
      c <- 0L until 6L; a <- 0L until 7L; b <- (a + 1) until 7L
    } yield (c * 7 + a, c * 7 + b)
    val sprinkle = Seq.fill(60)(
      (rnd.nextInt(42).toLong, rnd.nextInt(42).toLong))
    val edges = (cliques ++ sprinkle).toDF("src", "dst")
    def run(w: Int) = Graph.triangleCounts(edges, apexWaves = w)
      .as[(Long, Long, Long, Double)].collect().toSet
    val base = run(1)
    assert(base.exists(_._3 >= 10L), "fixture is triangle-rich")
    assert(run(3) === base, "3 waves == single job")
    assert(run(8) === base, "8 waves (more waves than some apexes) ==")
  }

  test("wedgeCount: exact Σ d_out·(d_out−1)/2 on hand-computable " +
      "graphs, canonicalization included") {
    // K4: every node degree 3; orientation gives out-degrees 3,2,1,0
    // → wedges = 3+1+0+0 = 4 (= the 4 triangles' closing checks ∩ K4
    // wedge structure: C(3,2)+C(2,2) = 3+1)
    val k4 = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b))
      .toDF("src", "dst")
    assert(Graph.wedgeCount(k4) === 4L)
    // star: hub degree 5, leaves degree 1 — all edges orient
    // leaf→hub, every out-degree ≤ 1 → zero wedges (the celebrity
    // guarantee the degree ordering exists for)
    val star = (2L to 6L).map(i => (1L, i)).toDF("src", "dst")
    assert(Graph.wedgeCount(star) === 0L)
    // path 1-2-3: middle node loses both orientation races (ends have
    // degree 1) → out-degrees 1,0,1 → zero wedges; triangle: 1
    assert(Graph.wedgeCount(
      Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")) === 0L)
    val dirtyTri = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 1L), (1L, 1L)).toDF("src", "dst")
    assert(Graph.wedgeCount(dirtyTri) === 1L)
  }

  test("autoApexWaves: W>1 exactly when the wedge-byte estimate " +
      "exceeds the budget; budgeted run bit-identical to manual W") {
    val bpw = Graph.BytesPerWedge
    // boundary: 10 wedges = 10·bpw bytes — budget at the estimate
    // stays single-job, one byte under it splits
    assert(Graph.autoApexWaves(10L, 10L * bpw) === 1)
    assert(Graph.autoApexWaves(10L, 10L * bpw - 1) === 2)
    assert(Graph.autoApexWaves(10L, 1L) === 320) // 10·32/1, under cap
    assert(Graph.autoApexWaves(0L, 1L) === 1)
    assert(Graph.autoApexWaves(Long.MaxValue / 8, 1L) === 4096) // cap
    intercept[IllegalArgumentException](Graph.autoApexWaves(1L, 0L))
    // the budgeted entry point: an unlimited budget plans W=1 with NO
    // sizing pass; a starved budget forces waves — both bit-identical
    // to the manual calls (every apex in exactly one wave)
    val rnd = new scala.util.Random(31)
    val cliques = for {
      c <- 0L until 6L; a <- 0L until 7L; b <- (a + 1) until 7L
    } yield (c * 7 + a, c * 7 + b)
    val sprinkle = Seq.fill(60)(
      (rnd.nextInt(42).toLong, rnd.nextInt(42).toLong))
    val edges = (cliques ++ sprinkle).toDF("src", "dst")
    val base = Graph.triangleCounts(edges)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(Graph.triangleCountsBudgeted(edges)
      .as[(Long, Long, Long, Double)].collect().toSet === base)
    val wedges = Graph.wedgeCount(edges)
    assert(wedges > 0L)
    // budget sized so the auto rule lands on W in [2, 8]
    val tight = wedges * bpw / 3
    assert(Graph.autoApexWaves(wedges, tight) >= 2)
    assert(Graph.triangleCountsBudgeted(edges, tight)
      .as[(Long, Long, Long, Double)].collect().toSet === base)
  }

  test("triangleCounts: duplicate, reversed, and self-loop edges do not " +
      "change the count (canonicalization)") {
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val dirty = tri ++ Seq((2L, 1L), (3L, 2L), (1L, 1L), (2L, 2L)) ++ tri
    val r = tris(dirty)
    assert(r == tris(tri))
    r.values.foreach { case (deg, t, c) =>
      assert(deg == 2L); assert(t == 1L); assert(c == 1.0)
    }
  }

  test("triangleCounts: two triangles sharing a node sum at the hinge; " +
      "hinge clustering is 2·2/(4·3)") {
    // bowtie: 1-2-3 and 3-4-5
    val r = tris(Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (3L, 4L), (4L, 5L), (5L, 3L)))
    assert(r(3L)._1 == 4L)
    assert(r(3L)._2 == 2L)
    assert(r(3L)._3 == 0.3333) // round(1/3, 4)
    assert(r(1L)._2 == 1L && r(5L)._2 == 1L)
  }

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int = 3,
      portable: Boolean = true): Map[Long, Double] =
    Graph.pageRank(edges.toDF("src", "dst"), iters, portable = portable)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("a symmetric cycle is the uniform fixed point: every rank stays " +
      "exactly 1/N through every round") {
    val r = ranksOf(Seq((1L, 2L), (2L, 3L), (3L, 1L)), iters = 5)
    // (1-a)/3 + a*(1/3)/1 = 1/3 EXACTLY in IEEE when rank is 1/3?
    // not bit-exactly in general — assert tight numeric equality
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12, r))
  }

  test("a hub absorbing many spokes outranks them; spokes stay at the " +
      "teleport floor") {
    // 10 spokes all point at node 100; nobody points back
    val edges = (1L to 10L).map(i => (i, 100L))
    val r = ranksOf(edges)
    val n = 11.0
    assert(r(100L) > r(1L) * 5)
    // a spoke has NO in-edges: rank = (1-α)/N exactly after round 1+
    assert(r(1L) === (1.0 - 0.85) / n)
    (1L to 10L).foreach(i => assert(r(i) === r(1L)))
  }

  test("dangling mass decays (GraphX semantics): total rank < 1 when a " +
      "sink exists, and the sink still outranks its feeder") {
    val r = ranksOf(Seq((1L, 2L)))  // 2 is a pure sink
    assert(r.values.sum < 1.0)
    assert(r(2L) > r(1L))
  }

  test("hand-computed two-round chain: ranks match the recurrence") {
    // 1 -> 2 -> 3, N=3, α=0.85, start 1/3
    val r = ranksOf(Seq((1L, 2L), (2L, 3L)), iters = 2)
    val n = 3.0; val a = 0.85; val base = (1.0 - a) / n
    val r1 = Map(1L -> base, 2L -> (base + a / n), 3L -> (base + a / n))
    val expect2 = Map(
      1L -> base,
      2L -> (base + a * r1(1L)),
      3L -> (base + a * r1(2L)))
    expect2.foreach { case (k, v) => assert(math.abs(r(k) - v) < 1e-15) }
  }

  test("portable and algebraic flavors agree; portable is bit-stable " +
      "under repartitioning") {
    val edges = (for {
      s <- 1L to 40L
      d <- Seq(s % 7, (s * 3) % 11 + 20)
      if s != d
    } yield (s, d)).distinct
    val p = ranksOf(edges, portable = true)
    val alg = ranksOf(edges, portable = false)
    p.foreach { case (k, v) => assert(math.abs(alg(k) - v) < 1e-12) }
    val again = Graph.pageRank(
      edges.toDF("src", "dst").repartition(7), 3, portable = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    p.foreach { case (k, v) => assert(again(k) === v) } // bit-exact
  }

  test("NULL-endpoint edges are dropped, never become phantom nodes") {
    val edges = Seq((java.lang.Long.valueOf(1L), java.lang.Long.valueOf(2L)),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(3L)),
      (java.lang.Long.valueOf(4L), null.asInstanceOf[java.lang.Long]))
      .toDF("src", "dst")
    val r = Graph.pageRank(edges, 2).collect()
      .map(x => Option(x.get(0)).map(_.asInstanceOf[Long]) -> x.getDouble(1))
    // only nodes 1 and 2 exist; no null node row, N = 2
    assert(r.map(_._1).toSet === Set(Some(1L), Some(2L)))
  }

  test("guards: bad iters/alpha fail at construction") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException](Graph.pageRank(e, 0))
    intercept[IllegalArgumentException](Graph.pageRank(e, 3, alpha = 1.0))
  }

  private def lpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, (Long, Long)] =
    Graph.labelPropagation(edges.toDF("src", "dst"), iters).collect()
      .map(r => r.getAs[Long]("node") ->
        ((r.getAs[Long]("label"), r.getAs[Long]("community_size")))).toMap

  test("labelPropagation: two disjoint triangles converge to separate " +
      "min-node labels with community_size 3") {
    val out = lpa(Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L)), iters = 3)
    assert(out == Map(
      1L -> ((1L, 3L)), 2L -> ((1L, 3L)), 3L -> ((1L, 3L)),
      10L -> ((10L, 3L)), 11L -> ((10L, 3L)), 12L -> ((10L, 3L))))
  }

  test("labelPropagation: one bridge edge does NOT merge two dense " +
      "communities (the density-vs-connectivity contrast with CC)") {
    // two K4's joined by a single bridge 4-5: CC would report one
    // component; LPA keeps two communities
    val k4a = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val k4b = for (a <- 5L to 8L; b <- (a + 1) to 8L) yield (a, b)
    val out = lpa(k4a ++ k4b :+ ((4L, 5L)), iters = 3)
    assert((1L to 4L).forall(n => out(n)._1 == 1L))
    assert((5L to 8L).forall(n => out(n)._1 == 5L))
    assert(out(1L)._2 == 4L && out(8L)._2 == 4L)
  }

  test("labelPropagation: dirty input canonicalizes (dups, reversed " +
      "edges, self-loops, NULLs drop); iters guard fires") {
    val dirty = Seq((Some(1L), Some(2L)), (Some(2L), Some(1L)),
        (Some(1L), Some(2L)), (Some(2L), Some(2L)),
        (None, Some(3L)), (Some(3L), None))
      .toDF("src", "dst")
    // only the 1-2 edge survives. A lone pair OSCILLATES under
    // synchronous updates (each adopts the other's label every round):
    // odd iters swap, even iters restore — deterministic either way
    val odd = Graph.labelPropagation(dirty, 1).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("label")).toMap
    assert(odd == Map(1L -> 2L, 2L -> 1L))
    val even = Graph.labelPropagation(dirty, 2).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("label")).toMap
    assert(even == Map(1L -> 1L, 2L -> 2L))
    intercept[IllegalArgumentException](
      Graph.labelPropagation(dirty, 0))
  }
}
