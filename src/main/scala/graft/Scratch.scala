package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{Similarity, Dedup}
import graft.functions.VectorFns

/** Throwaway experiment harness for the optimization round (not part
  * of the product surface; driven manually, never registered).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("32")
    val d = "/root/testdata/sf0.1"
    val emb = Tables(spark, d, "embeddings")
    val n = emb.count()
    val nl = Similarity.autoCellCount(n, 1024L)
    val (coarse, cb) = Similarity.fitIvfPq(emb, "vec_id", "embedding",
      dims = 64, nlist = nl, m = 4, ksub = 8, iters = 2, seed = 42L)
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $tag ${(System.nanoTime() - t0) / 1e9}%.3f"); r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def mkPairs(): DataFrame = {
      val assigned = emb
        .select(col("vec_id"), col("embedding"),
          VectorFns.norm2(col("embedding")).as("__vn"))
        .withColumn("cell",
          Similarity.nearestCellsExpr(coarse, col("embedding"),
            col("__vn"), 1).getItem(0))
      val a = assigned.select(col("cell"), col("vec_id").as("a_id"),
        col("embedding").as("a_vec"), col("__vn").as("a_norm"))
      val b = assigned.select(col("cell"), col("vec_id").as("b_id"),
        col("embedding").as("b_vec"), col("__vn").as("b_norm"))
      a.join(b, Seq("cell"))
        .filter(col("a_id") < col("b_id"))
        .filter(VectorFns.simDiv(
          VectorFns.dot(col("a_vec"), col("b_vec")),
          col("a_norm") * col("b_norm")) >= 0.35)
        .select(col("a_id"), col("b_id"))
    }
    // warmup
    val p0 = mkPairs().localCheckpoint(true)
    noop(Dedup.duplicateClusters(p0, requireConvergence = true))
    noop(Dedup.duplicateClusters(p0, requireConvergence = true))
    noop(Dedup.duplicateClusters(p0, requireConvergence = true))
    (1 to 3).foreach { i =>
      var p: DataFrame = null
      time(s"pairsCkpt_$i") { p = mkPairs().localCheckpoint(true) }
      time(s"cc_v1_$i") {
        noop(Dedup.duplicateClusters(p, requireConvergence = true))
      }
      time(s"cc_v2_$i") {
        noop(Dedup.duplicateClusters(p, requireConvergence = true))
      }
      time(s"cc_v3_$i") {
        noop(Dedup.duplicateClusters(p, requireConvergence = true))
      }
    }
    val a = Dedup.duplicateClusters(p0, requireConvergence = true)
    val b = Dedup.duplicateClusters(p0, requireConvergence = true)
    println("DIFF rows: " + a.exceptAll(b).count() + " / " +
      b.exceptAll(a).count())
    spark.stop()
  }
}
