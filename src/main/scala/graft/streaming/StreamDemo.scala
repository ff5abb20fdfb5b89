package graft.streaming

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end runtime check of the streaming pipeline — the reference's
  * three-process flow (producer → file-drop dir → consumer → four
  * datasets) in one deterministic run:
  *
  *   1. Replay slices sf events into JSON batch files (the producer);
  *   2. a file-source stream consumes them through MultiSink (the
  *      consumer): raw + pickup/dropoff/combined counts per micro-batch;
  *   3. row counts of every output dataset print as KEY=N lines.
  *
  * Usage: runMain graft.streaming.StreamDemo <sfDir> <workDir>
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val workDir = if (args.length > 1) args(1) else "/tmp/graft_stream_demo"
    val spark = graft.GraftSession.build("8")

    val incoming = s"$workDir/incoming"
    val processed = s"$workDir/processed"
    val checkpoint = s"$workDir/checkpoint"

    // --- producer: slice events into ordered JSON batch drops
    val events = Tables(spark, sfDir, "events")
      .select(StreamSources.eventSchema.fieldNames.map(col): _*)
    val prepared = Replay.prepare(events, Seq(col("ts"), col("event_id")))
    val total = prepared.count()
    val batchSize = math.max(1L, total / 5)
    val nBatches = Replay.batchCount(prepared, batchSize)
    Replay.writeBatches(prepared, incoming, batchSize, nBatches)
    println(s"PRODUCED_BATCHES=$nBatches")

    // --- consumer: file stream -> four checkpointed datasets
    // batches land one-subdirectory-each; the file source doesn't
    // recurse, so watch them with a glob
    val stream = StreamSources.fileStream(spark, s"$incoming/*",
      maxFilesPerTrigger = 2)
    val q = MultiSink.start(stream, MultiSink.Config(
      outDir = processed, checkpointDir = checkpoint,
      keyA = "user_id", tagA = "pickup_location",
      keyB = "event_type", tagB = "dropoff_location",
      triggerSeconds = 1L))
    q.processAllAvailable()
    q.stop()

    // --- verify: every dataset materialized, raw row count preserved
    Seq("raw", "pickup_agg", "dropoff_agg", "combined_agg").foreach { d =>
      val n = spark.read.parquet(s"$processed/$d/batch_id=*").count()
      println(s"${d.toUpperCase}_ROWS=$n")
    }
    println(s"SOURCE_ROWS=$total")

    // --- stateful operators smoke: session windows over the same stream
    val sess = StatefulSessions.sessions(
      StreamSources.fileStream(spark, s"$incoming/*", maxFilesPerTrigger = 100),
      gapSeconds = 1800L, watermarkDelay = "0 seconds")
    val sq = sess.writeStream.outputMode("append").format("memory")
      .queryName("sessions_out")
      .option("checkpointLocation", s"$workDir/checkpoint_sessions")
      .start()
    sq.processAllAvailable()
    sq.stop()
    println(s"SESSIONS_EMITTED=${spark.table("sessions_out").count()}")

    spark.stop()
  }
}
