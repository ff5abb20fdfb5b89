package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}
import graft.functions.VectorFns

/** Throwaway experiment harness for the optimization round (not part
  * of the product surface; driven manually, never registered).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("32")
    val d = "/root/testdata/sf0.1"
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $tag ${(System.nanoTime() - t0) / 1e9}%.3f"); r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    if (args.headOption.contains("tri")) { triAb(spark, d); spark.stop(); return }
    val docs = Tables(spark, d, "documents")
    val lshPairs = Dedup.lshCandidatePairs(docs, "doc_id", "text", 16, 4)
      .localCheckpoint(true)
    val emb = Tables(spark, d, "embeddings")
    val nl = Similarity.autoCellCount(emb.count(), 1024L)
    val (coarse, _) = Similarity.fitIvfPq(emb, "vec_id", "embedding",
      dims = 64, nlist = nl, m = 4, ksub = 8, iters = 2, seed = 42L)
    val assigned = emb.select(col("vec_id"), col("embedding"),
        VectorFns.norm2(col("embedding")).as("__vn"))
      .withColumn("cell", Similarity.nearestCellsExpr(coarse,
        col("embedding"), col("__vn"), 1).getItem(0))
    val a = assigned.select(col("cell"), col("vec_id").as("a_id"),
      col("embedding").as("a_vec"), col("__vn").as("a_norm"))
    val b = assigned.select(col("cell"), col("vec_id").as("b_id"),
      col("embedding").as("b_vec"), col("__vn").as("b_norm"))
    val semPairs = a.join(b, Seq("cell"))
      .filter(col("a_id") < col("b_id"))
      .filter(VectorFns.simDiv(VectorFns.dot(col("a_vec"), col("b_vec")),
        col("a_norm") * col("b_norm")) >= 0.35)
      .select(col("a_id"), col("b_id"))
      .localCheckpoint(true)
    def cc(sr: String, p: DataFrame): Unit = {
      System.setProperty("graft.cc.singleRounds", sr)
      noop(Dedup.duplicateClusters(p, requireConvergence = true))
    }
    cc("2", lshPairs); cc("2", semPairs) // warmup
    if (args.headOption.contains("ccj")) {
      def ccj(sj: String, p: DataFrame): Unit = {
        System.setProperty("graft.cc.singleJumpPasses", sj)
        try cc("2", p)
        finally System.setProperty("graft.cc.singleJumpPasses", "1")
      }
      (1 to 3).foreach { i =>
        time(s"lsh_jump1_$i") { ccj("99", lshPairs) }
        time(s"lsh_jump2_$i") { ccj("1", lshPairs) }
        time(s"sem_jump1_$i") { ccj("99", semPairs) }
        time(s"sem_jump2_$i") { ccj("1", semPairs) }
      }
      spark.stop(); return
    }
    (1 to 3).foreach { i =>
      time(s"lsh_single_$i") { cc("99", lshPairs) }
      time(s"lsh_adapt_$i") { cc("2", lshPairs) }
      time(s"lsh_double_$i") { cc("0", lshPairs) }
      time(s"sem_single_$i") { cc("99", semPairs) }
      time(s"sem_adapt_$i") { cc("2", semPairs) }
      time(s"sem_double_$i") { cc("0", semPairs) }
    }
    spark.stop()
  }

  /** Interleaved A/B for the graph_triangles closing-join Bloom
    * prefilter (graft.tri.bloom seam): off vs on, 3 trials each, plus
    * a one-time exceptAll equality check. */
  private def triAb(spark: org.apache.spark.sql.SparkSession,
      d: String): Unit = {
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $tag ${(System.nanoTime() - t0) / 1e9}%.3f"); r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def run(bloom: String): DataFrame = {
      System.setProperty("graft.tri.bloom", bloom)
      SparkEntry.queries("graph_triangles")(spark, d)
    }
    val off = run("off")
    val on = run("on")
    println("DIFF rows: " + off.exceptAll(on).count() +
      " / " + on.exceptAll(off).count())
    noop(off); noop(on) // warmup both shapes
    (1 to 3).foreach { i =>
      time(s"tri_off_$i") { noop(run("off")) }
      time(s"tri_on_$i") { noop(run("on")) }
    }
  }

}
