package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The consumer pipeline (SURVEY.md §3.2), idiomatic and idempotent:
  * one checkpointed foreachBatch sink writing four datasets per
  * micro-batch — raw, pickup-key counts, dropoff-key counts, combined —
  * the reference's data contract (consumer/StreamProcessor.scala:142-193)
  * with its two defects fixed:
  *
  *  - batch_id is foreachBatch's real batchId, not a plan-time literal
  *    (reference bug at StreamProcessor.scala:34-38);
  *  - each dataset writes to <dir>/<name>/batch_id=N with
  *    mode("overwrite") — a replayed micro-batch overwrites its own
  *    directory instead of appending duplicates (reference appends,
  *    StreamProcessor.scala:156-184, duplicate-prone on recovery).
  */
object MultiSink {

  final case class Config(
      outDir: String,
      checkpointDir: String,
      keyA: String, tagA: String,
      keyB: String, tagB: String,
      tsCols: Seq[String] = Seq("ts"),
      format: String = "parquet",
      triggerSeconds: Long = 10L,
      // AvailableNow: drain everything already present in micro-batches
      // (respecting maxFilesPerTrigger etc.), then terminate — the
      // incremental-batch pattern: a cron-scheduled run catches up from
      // the checkpoint and exits, no always-on cluster
      drainOnce: Boolean = false)

  object Config {
    /** Sink side from the config file's `graft.consumer.output` block
      * (reference: consumer/MainConsumer.scala:18-37 reading
      * application.conf) — re-pointing dirs/format/trigger needs no
      * recompile. Key columns/tags stay code-side: they are the data
      * contract, not deployment knobs.
      */
    def fromConf(c: graft.GraftConfig,
        keyA: String, tagA: String, keyB: String, tagB: String): Config = {
      // fallbacks come from the one Defaults map — a dropped resource
      // file cannot silently change behavior or drift from the docs
      def d(k: String) = c.str(k, graft.GraftConfig.Defaults(k))
      Config(
        outDir = d("graft.consumer.output.directory"),
        checkpointDir = d("graft.consumer.output.checkpointDir"),
        keyA = keyA, tagA = tagA, keyB = keyB, tagB = tagB,
        format = d("graft.consumer.output.format"),
        triggerSeconds = d("graft.consumer.output.triggerSeconds").toLong,
        drainOnce = d("graft.consumer.output.drainOnce").toBoolean)
    }
  }

  /** Console sink (SURVEY §2.1 S6) — the reference's debug output
    * (consumer/StreamProcessor.scala:199-202), wrapped so pipelines can
    * tee a stream to the terminal with the same trigger cadence as the
    * real sink. */
  def console(stream: DataFrame, numRows: Int = 20,
      truncate: Boolean = false, triggerSeconds: Long = 10L,
      mode: String = "append"): StreamingQuery =
    stream.writeStream
      .outputMode(mode)
      .format("console")
      .option("numRows", numRows)
      .option("truncate", truncate)
      .trigger(Trigger.ProcessingTime(s"$triggerSeconds seconds"))
      .start()

  def start(stream: DataFrame, cfg: Config): StreamingQuery = {
    def write(df: DataFrame, name: String, batchId: Long): Unit =
      df.write.mode("overwrite").format(cfg.format)
        .save(s"${cfg.outDir}/$name/batch_id=$batchId")

    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(
        if (cfg.drainOnce) Trigger.AvailableNow()
        else Trigger.ProcessingTime(s"${cfg.triggerSeconds} seconds"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val repaired = StreamOps.repairNullTs(batch, cfg.tsCols)
          val stamped = StreamOps.stampBatchMeta(repaired, batchId)
          // one pass over the source for all four sinks
          stamped.persist()
          try {
            write(stamped, "raw", batchId)
            val counts = StreamOps.taggedKeyCounts(
              stamped, cfg.keyA, cfg.tagA, cfg.keyB, cfg.tagB)
              .withColumn("batch_id", lit(StreamOps.formatBatchId(batchId)))
            counts.persist()
            try {
              write(counts.filter(col("aggregation_type") === cfg.tagA),
                "pickup_agg", batchId)
              write(counts.filter(col("aggregation_type") === cfg.tagB),
                "dropoff_agg", batchId)
              write(counts, "combined_agg", batchId)
            } finally counts.unpersist()
          } finally stamped.unpersist()
        }
        ()
      }
      .start()
  }
}
