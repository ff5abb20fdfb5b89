package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The dashboard's data access (SURVEY.md §2.1 S11), engine-side: the
  * reference polls output directories, sorts files by mtime and loads
  * the newest two (src/main/python/taxi_dashboard.py:18-58). Here the
  * batch id IS the recency key — `MultiSink` writes
  * `<dataset>/batch_id=N` — so "latest N batches" is partition pruning
  * on the batch_id partition column, not filesystem mtime races.
  */
object Dashboard {

  /** Latest `n` numeric batch ids for a dataset — a FILESYSTEM listing
    * of the `batch_id=N` directory names (numeric sort, so no
    * zero-padding rollover), zero data read. The previous formulation
    * scanned every batch's rows just to learn the ids. */
  def latestBatchNumbers(spark: SparkSession, datasetDir: String,
      n: Int): Seq[Long] = {
    val path = new org.apache.hadoop.fs.Path(datasetDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("batch_id="))
      .map(_.stripPrefix("batch_id=").toLong)
      .sorted(Ordering[Long].reverse).take(n)
  }

  /** Latest `n` stamped batch ids (the `batch_000042` display form). */
  def latestBatchIds(spark: SparkSession, datasetDir: String,
      n: Int): Seq[String] =
    latestBatchNumbers(spark, datasetDir, n).map(StreamOps.formatBatchId)

  /** The newest `n` batches of a dataset, batch id attached. Only the
    * selected directories are ever read — true pruning by path, not a
    * filter over the full dataset. */
  def latestBatches(spark: SparkSession, datasetDir: String,
      n: Int): DataFrame = {
    val nums = latestBatchNumbers(spark, datasetDir, n)
    // zero-path spark.read.parquet() throws an opaque schema-inference
    // error — surface "no batches yet" instead (poll loops should gate
    // on latestBatchNumbers before reading)
    require(nums.nonEmpty,
      s"no batch_id=N partitions under $datasetDir — nothing written yet?")
    spark.read.parquet(nums.map(b => s"$datasetDir/batch_id=$b"): _*)
  }

  /** Top locations by trip count over the latest `n` batches — the
    * reference's bar-chart query (taxi_dashboard.py:170-197). */
  def topLocations(spark: SparkSession, aggDir: String, n: Int,
      k: Int): DataFrame =
    latestBatches(spark, aggDir, n)
      .groupBy(col("location_id"))
      .agg(sum(col("trip_count")).as("trip_count"))
      .orderBy(col("trip_count").desc, col("location_id"))
      .limit(k)
}
