package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Physical small-file compaction at data scale (the LayoutSpec
  * 160-file case, run against a real SF directory): fragment the SF's
  * lineitem into a few hundred heterogeneous parquet files, plan with
  * [[Layout.compactionPlan]], execute with [[Layout.compactFiles]],
  * and verify the executed layout against the plan — zero rows lost,
  * exactly one physical file per bin, every bin holding exactly its
  * planned rows (counted per source file via input_file_name).
  *
  * Usage: runMain graft.CompactScaleCheck <sfDir> (default sf0.01)
  */
object CompactScaleCheck {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.build("16")
    val frag = java.nio.file.Files
      .createTempDirectory("graft_compact_frag").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft_compact_out").toString
    // heterogeneous fragmentation: skew partition sizes via a
    // sqrt-growing group key (deterministic, no rand())
    val src = Tables(spark, dir, "lineitem")
    val nRows = src.count()
    src.withColumn("__b",
        floor(sqrt(abs(col("l_orderkey")).cast("double"))))
      .repartition(240, col("__b")).drop("__b")
      .write.mode("overwrite").parquet(frag)
    val inv = Layout.fileInventory(spark, frag).cache()
    val nFiles = inv.count()
    val totalBytes = inv.agg(sum("bytes")).head.getLong(0)
    val target = totalBytes / 16 + 1
    val (plan, tPlan) = time {
      val p = Layout.compactionPlan(inv, "file_name", "bytes", target)
        .cache()
      p.count(); p
    }
    val (_, tExec) = time(Layout.compactFiles(spark, frag, plan, out))
    // verify: rows preserved, one file per bin, per-bin rows == plan
    val written = spark.read.parquet(out)
    val outRows = written.count()
    val srcRows = spark.read.parquet(frag)
      .withColumn("f", element_at(split(input_file_name(), "/"), -1))
      .groupBy("f").count()
    val wantRows = plan.join(srcRows,
        plan("file_name") === srcRows("f"))
      .groupBy("bin").agg(sum("count").as("want"))
    val gotRows = written.groupBy("bin").count()
    val mismatches = wantRows.join(gotRows, Seq("bin"), "full")
      .where(coalesce(col("want"), lit(-1L)) =!=
        coalesce(col("count"), lit(-2L)))
      .count()
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val filesPerBin = fs.listStatus(new org.apache.hadoop.fs.Path(out))
      .filter(_.getPath.getName.startsWith("bin="))
      .map(d => fs.listStatus(d.getPath)
        .count(_.getPath.getName.endsWith(".parquet")))
    val nBins = plan.select("bin").distinct().count()
    println(s"COMPACT_SCALE dir=$dir rows=$nRows files=$nFiles " +
      s"bytes=$totalBytes target=$target bins=$nBins " +
      f"plan=$tPlan%.2f exec=$tExec%.2f " +
      s"rows_out=$outRows bin_row_mismatches=$mismatches " +
      s"out_dirs=${filesPerBin.length} " +
      s"one_file_per_bin=${filesPerBin.forall(_ == 1)}")
    spark.stop()
  }
}
