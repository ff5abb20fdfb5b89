package graft.streaming

import graft.operators.Relational
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Replay producer (SURVEY.md §3.1, §7.1 item 4): slices a static table
  * into deterministic ordered batches and drops each as one file into a
  * directory a file-source stream watches — the reference's
  * Kafka-on-a-filesystem simulation (producer/MainProducer.scala:77-124)
  * without its two anti-patterns:
  *
  *  - the ordinal is computed ONCE (single sort + window), then every
  *    batch is a plain range filter — the reference re-ran the full
  *    row_number window over the entire dataset per batch
  *    (producer/ProducerOperations.scala:138-142, O(total) per batch);
  *  - rows are written by executors (coalesce(1).write), never
  *    collect()ed to the driver (reference: MainProducer.scala:98).
  */
object Replay {

  /** One-time preparation: ordinal-stamped frame. Ordinals are 1-based,
    * dense, and deterministic given a total order (callers pass a
    * unique tie-breaker). withScalableOrdinal already materializes the
    * sorted data as an eager checkpoint, so every batch() range filter
    * reads those blocks — no extra persist layer, no re-sort. */
  def prepare(df: DataFrame, orderCols: Seq[Column]): DataFrame =
    Relational.withScalableOrdinal(df, orderCols)

  /** Number of batches for a prepared frame. */
  def batchCount(prepared: DataFrame, batchSize: Long): Long = {
    val n = prepared.count()
    (n + batchSize - 1) / batchSize
  }

  /** Batch b (0-based) of the prepared frame: a pure range filter. */
  def batch(prepared: DataFrame, batchSize: Long, b: Long): DataFrame =
    prepared.filter(col("row_num")
        .between(b * batchSize + 1, (b + 1) * batchSize))
      .drop("row_num")

  /** Write batches [0, n) as one JSON-lines file each into `dir`,
    * sleeping `intervalMillis` between drops (0 = no pacing, for tests).
    * File-per-batch matches the reference's wire contract
    * (producer/FileSender.scala:117-132). Each batch lands in its own
    * subdirectory so a re-run of batch b overwrites rather than
    * duplicates; consumers watch the directory with a trailing glob
    * (the file source does not recurse on its own).
    */
  def writeBatches(prepared: DataFrame, dir: String, batchSize: Long,
      nBatches: Long, intervalMillis: Long = 0L,
      format: String = "json"): Unit = {
    (0L until nBatches).foreach { b =>
      batch(prepared, batchSize, b)
        .coalesce(1).write.mode("overwrite").format(format)
        .save(s"$dir/${StreamOps.formatBatchId(b)}")
      if (intervalMillis > 0) Thread.sleep(intervalMillis)
    }
  }
}
