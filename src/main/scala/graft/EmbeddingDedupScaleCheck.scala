package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The cell-blocked embedding-dedup families at data scale — the r17
  * probe's named fix, measured: a FIXED coarse-cell count makes every
  * within-cell pair stage (n/nlist)² — quadratic in the corpus
  * (dedup_split_embedding read exponent 1.05 at 16 cells in the sf10
  * probe) — while [[Similarity.autoCellCount]]-sized cells keep the
  * expected per-cell pair cost constant. Times BOTH flavors of BOTH
  * families on one SF directory:
  *
  *   - SemDeDup: `semDedup` at the oracle's 16 cells vs
  *     `semDedupAutoCells` (exact within-cell compare — the paper's
  *     shape, quadratic the fastest).
  *   - IVFPQ near-dup pairs: `nearDupPairsIvf` over artifacts fit at
  *     16 cells vs at auto-scaled cells (ADC prefilter shrinks the
  *     refine but the candidate join is still cell-quadratic).
  *
  * Invariant checks ride along: one output row per vector / one keep
  * per cluster (SemDeDup), a_id < b_id and pairs ≥ the auto flavor's
  * recall floor sanity (pair counts differ across cell geometries by
  * design — blocking recall, not correctness).
  *
  * Usage: runMain graft.EmbeddingDedupScaleCheck <sfDir> [minSim]
  * (defaults: sf0.01, 0.35 — the dedup_semantic query's threshold)
  */
object EmbeddingDedupScaleCheck {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val minSim = if (args.length > 1) args(1).toDouble else 0.35
    val spark = GraftSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val emb = Tables(spark, dir, "embeddings")
    val n = emb.count()
    val autoN = Similarity.autoCellCount(n, 1024L)
    println(s"EMBDEDUP_N=$n AUTO_NLIST=$autoN")

    def semInvariants(df: org.apache.spark.sql.DataFrame): Long = {
      val agg = df.agg(count(lit(1)).as("rows"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("keeps"),
        countDistinct(col("cluster_id")).as("clusters")).head()
      require(agg.getLong(0) == n, s"rows ${agg.getLong(0)} != corpus $n")
      require(agg.getLong(1) == agg.getLong(2),
        s"keeps ${agg.getLong(1)} != clusters ${agg.getLong(2)}")
      agg.getLong(1)
    }

    // --- SemDeDup ---
    val fixedCoarse = Similarity.fitCentroids(emb, "vec_id", "embedding",
      nlist = 16, iters = 2, seed = 42L)
    val (fk, tSemFixed) = time {
      semInvariants(Similarity.semDedup(emb, fixedCoarse, minSim))
    }
    println(f"SEMDEDUP_FIXED16_SEC=$tSemFixed%.2f KEEPS=$fk")
    val (ak, tSemAuto) = time {
      semInvariants(Similarity.semDedupAutoCells(emb, minSim,
        targetCellSize = 1024L))
    }
    println(f"SEMDEDUP_AUTO_SEC=$tSemAuto%.2f KEEPS=$ak")

    // --- IVFPQ near-dup pairs ---
    def pairCount(nlist: Int): Long = {
      val (coarse, cb) = Similarity.fitIvfPq(emb, "vec_id", "embedding",
        dims = 64, nlist = nlist, m = 4, ksub = 8, iters = 2, seed = 42L)
      val pairs = Similarity.nearDupPairsIvf(emb, coarse, cb,
        candSim = 0.2, minSim = 0.3)
      val agg = pairs.agg(count(lit(1)).as("c"),
        sum(when(col("a_id") < col("b_id"), 0L).otherwise(1L))
          .as("bad")).head()
      require(agg.isNullAt(1) || agg.getLong(1) == 0L, "a_id < b_id")
      agg.getLong(0)
    }
    val (pf, tIvfFixed) = time(pairCount(16))
    println(f"NEARDUP_IVF_FIXED16_SEC=$tIvfFixed%.2f PAIRS=$pf")
    val (pa, tIvfAuto) = time(pairCount(autoN))
    println(f"NEARDUP_IVF_AUTO_SEC=$tIvfAuto%.2f PAIRS=$pa")
    spark.stop()
  }
}
