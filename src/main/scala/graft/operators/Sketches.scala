package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a first-class
  * mergeable frequency artifact — the point-query complement to the
  * engine's Misra-Gries heavy hitters ([[Relational]]) and HLL
  * distinct counts: MG answers "which keys are heavy", CMS answers
  * "how often does THIS key occur" for any key, in depth×width
  * integers regardless of corpus size.
  *
  * The hash family is the classic universal (a·k + b) mod p mod w with
  * p = 2³¹−1 and fixed public LCG constants — pure 64-bit integer
  * arithmetic, so the sketch is bit-identical across engines and
  * partitionings (no engine-specific hash, unlike HLL), and the DuckDB
  * oracle replays the exact cells.
  *
  * Scale shape: the build is ONE pass — each row explodes to `depth`
  * (row, cell) pairs and a single groupBy sums them, so Spark's
  * partial aggregation IS the sketch merge (map-side combine produces
  * per-partition sketches; the reduce adds them cell-wise — exactly
  * how 1000 executors would each sketch their split of 100 TB and the
  * driver would union the d×w results). Estimation joins a bounded
  * probe set against the d×w-row sketch — broadcast-sized by
  * construction. */
object Sketches {

  /** 2³¹ − 1, the Mersenne prime of the classic universal family. */
  val CmsPrime = 2147483647L

  /** Public LCG multiplier/increment pairs (glibc, MSVC, Delphi,
    * Numerical Recipes) — one (a, b) per sketch row. */
  val CmsSeeds: Seq[(Long, Long)] = Seq(
    (1103515245L, 12345L),
    (214013L, 2531011L),
    (134775813L, 89L),
    (1664525L, 1013904223L))

  /** h_r(k) = ((a·k + b) mod p) mod width. Requires a non-negative
    * integer key (TPC-H surrogate keys are; hash or offset anything
    * else first) — a·k stays under 2⁶³ for keys below 2³². */
  def cmsHash(key: Column, a: Long, b: Long, width: Int): Column =
    ((lit(a) * key.cast("long") + lit(b)) % CmsPrime) % width

  /** Build a depth×width Count-Min sketch over `keyCol`.
    * Output: (r, c, cnt) — one row per touched cell (untouched cells
    * are implicit zeros), ≤ depth·width rows total. Merge two sketches
    * by unioning and summing per (r, c) — associative, commutative,
    * and exactly what the build's own partial aggregation does. */
  def cmsBuild(df: DataFrame, keyCol: String, width: Int,
      seeds: Seq[(Long, Long)] = CmsSeeds): DataFrame = {
    require(width >= 2, s"cmsBuild: width must be >= 2, got $width")
    require(seeds.nonEmpty, "cmsBuild: need at least one hash row")
    val cells = seeds.zipWithIndex.map { case ((a, b), r) =>
      struct(lit(r.toLong).as("r"),
        cmsHash(col(keyCol), a, b, width).as("c"))
    }
    df.select(explode(array(cells: _*)).as("__cell"))
      .groupBy(col("__cell.r").as("r"), col("__cell.c").as("c"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates for `probes` (a bounded key frame)
    * against a built sketch: est(k) = min_r sketch[r][h_r(k)] — an
    * upper bound on the true count, within ε·N (ε ≈ e/width) with
    * probability 1 − e^(−depth).
    *
    * Output: probes + (n_est). The probe side is expected bounded
    * (top-k keys, a blocklist, a join's build side); the sketch side
    * is ≤ depth·width rows — Spark broadcasts it via AQE. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
      width: Int, seeds: Seq[(Long, Long)] = CmsSeeds): DataFrame = {
    val cells = seeds.zipWithIndex.map { case ((a, b), r) =>
      struct(lit(r.toLong).as("r"),
        cmsHash(col(keyCol), a, b, width).as("c"))
    }
    probes
      .withColumn("__cell", explode(array(cells: _*)))
      .select(probes.columns.map(col) :+
        col("__cell.r").as("r") :+ col("__cell.c").as("c"): _*)
      .join(broadcast(sketch), Seq("r", "c"))
      .groupBy(probes.columns.map(col): _*)
      .agg(min(col("cnt")).cast("long").as("n_est"))
  }
}
