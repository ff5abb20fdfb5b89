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

  /** 2^60 — the KMV hash-space size, exactly representable as a
    * double (a power of two), planted via a BIGINT cast on both
    * engines (never a >16-digit decimal literal — the DuckDB
    * decimal→double double-rounding hazard). */
  val KmvSpace = 1152921504606846976L

  private def kmvHash(value: Column): Column =
    conv(substring(md5(value.cast("string")), 1, 15), 16, 10)
      .cast("long")

  /** K-minimum-values distinct sketch (Bar-Yossef et al. 2002; the
    * Theta/KMV family DataSketches builds on) — the DETERMINISTIC
    * distinct counter: per group keep the k smallest 60-bit md5-prefix
    * hashes of the distinct values. Unlike HLL (whose HIP estimate is
    * presentation-order-dependent — the profileShard caveat), a KMV
    * sketch and its estimate are pure functions of the value SET:
    * bit-identical across engines, partitionings and arrival orders,
    * so the whole sketch pipeline is DuckDB-hash-gateable, and unlike
    * HLL it supports set INTERSECTION estimates ([[kmvOverlap]]).
    * Error ~1/√(k−2) relative; k·8 bytes per group. Two values
    * colliding on the 60-bit prefix fold into one (P ≈ pairs·2⁻⁶⁰ —
    * negligible, documented).
    *
    * Plan shape: one distinct-hash projection, one per-group min-k
    * (rank window PARTITIONED by the group), one bounded collect_list
    * (≤ k rows per group). Output: (groupCols*, kmv sorted-ascending
    * array<long>, |kmv| ≤ k). */
  def kmvSketch(df: DataFrame, groupCols: Seq[String], value: Column,
      k: Int): DataFrame = {
    require(k >= 2, s"kmvSketch: k >= 2, got $k")
    require(groupCols.nonEmpty, "kmvSketch: need group columns")
    val hashed = df
      .select(groupCols.map(col) :+ kmvHash(value).as("__h"): _*)
      .distinct()
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col("__h"))
    hashed.withColumn("__rn", row_number().over(win))
      .filter(col("__rn") <= k)
      .groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(col("__h"))).as("kmv"))
  }

  /** The KMV distinct estimate of a sketch array: exact |kmv| when
    * the sketch never filled (fewer distincts than k), else the
    * classic (k−1)/θ with θ = kmv[k]/2^60. Every op is an
    * exactly-rounded IEEE op on exactly-representable inputs —
    * engine-replayable raw, no rounding needed. */
  def kmvEstimate(kmv: Column, k: Int): Column =
    when(size(kmv) < k, size(kmv).cast("double"))
      .otherwise((lit((k - 1).toDouble) * lit(KmvSpace).cast("double")) /
        element_at(kmv, k).cast("double"))

  /** Merge KMV sketches to a coarser grouping WITHOUT re-reading
    * data: union the hash arrays, re-take the k smallest — the
    * mergeProfileShards pattern with a deterministic artifact.
    * Associative and commutative (spec-pinned ≡ a direct sketch of
    * the union). */
  def kmvMerge(sketches: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame = {
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col("__h"))
    sketches
      .select(groupCols.map(col) :+ explode(col("kmv")).as("__h"): _*)
      .distinct()
      .withColumn("__rn", row_number().over(win))
      .filter(col("__rn") <= k)
      .groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(col("__h"))).as("kmv"))
  }

  /** Pairwise set-overlap estimates between the groups of a
    * [[kmvSketch]] frame — the query HLL structurally cannot answer
    * (HLL unions; it never intersects). For each group pair the
    * merged sketch is the k smallest of the two arrays' union (a
    * per-row array op — sketches are k-bounded), L = |merged|,
    * shared = |merged ∩ A ∩ B|: jaccard_est = shared/L,
    * union_est = the merged sketch's [[kmvEstimate]], and
    * intersection_est = jaccard_est · union_est (Beyer et al.'s
    * unbiased composition). Output: (g_a, g_b, n_a, n_b, shared_k,
    * jaccard_est, union_est, inter_est) for every unordered pair.
    *
    * Scale note: the `g_a < g_b` theta-join plans as a nested loop —
    * deliberate, because the input is the per-GROUP sketch frame
    * (group-count rows of k-bounded arrays, never corpus rows) and
    * all-pairs IS the requested output, inherently quadratic in
    * groups. Past ~10^4 groups, pre-filter the frame or bucket pairs
    * by a blocking key before calling. */
  def kmvOverlap(sketches: DataFrame, groupCol: String,
      k: Int): DataFrame = {
    val a = sketches.select(col(groupCol).as("g_a"),
      col("kmv").as("__ka"))
    val b = sketches.select(col(groupCol).as("g_b"),
      col("kmv").as("__kb"))
    val merged = slice(array_sort(array_union(col("__ka"), col("__kb"))),
      1, k)
    a.join(b, col("g_a") < col("g_b"))
      .withColumn("__m", merged)
      .withColumn("__l", least(lit(k), size(col("__m"))))
      .withColumn("__sh", size(array_intersect(
        array_intersect(col("__m"), col("__ka")), col("__kb"))))
      .select(col("g_a"), col("g_b"),
        size(col("__ka")).cast("long").as("n_a"),
        size(col("__kb")).cast("long").as("n_b"),
        col("__sh").cast("long").as("shared_k"),
        (col("__sh").cast("double") / col("__l").cast("double"))
          .as("jaccard_est"),
        kmvEstimate(col("__m"), k).as("union_est"),
        ((col("__sh").cast("double") / col("__l").cast("double")) *
          kmvEstimate(col("__m"), k)).as("inter_est"))
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
