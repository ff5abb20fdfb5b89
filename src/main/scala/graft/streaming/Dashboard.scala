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

  /** Latest `n` batch ids present for a dataset. The stamped batch_id
    * ("batch_000042") is zero-padded, so lexicographic order IS batch
    * order — no parsing. (The data column shadows the same-named
    * numeric partition directory key on read.) */
  def latestBatchIds(spark: SparkSession, datasetDir: String,
      n: Int): Seq[String] =
    spark.read.parquet(s"$datasetDir/batch_id=*")
      .select(col("batch_id"))
      .distinct().orderBy(col("batch_id").desc).limit(n)
      .collect().map(_.getString(0)).toSeq

  /** The newest `n` batches of a dataset, batch id attached. Partition
    * pruning keeps the scan to exactly those directories. */
  def latestBatches(spark: SparkSession, datasetDir: String,
      n: Int): DataFrame = {
    val ids = latestBatchIds(spark, datasetDir, n)
    spark.read.parquet(s"$datasetDir/batch_id=*")
      .filter(col("batch_id").isin(ids: _*))
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
