package graft.streaming

import graft.{GraftConfig, Tables}
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
  * Every knob — source/bus/output/checkpoint paths, batch size, pacing,
  * formats, trigger, rate limit — comes from GraftConfig (bundled
  * graft.conf defaults, optionally overlaid by a site conf), mirroring
  * the reference's application.conf-driven mains
  * (producer/MainProducer.scala:18-23, consumer/MainConsumer.scala:18-37).
  *
  * Usage: runMain graft.streaming.StreamDemo [site.conf] [sfDir] [workDir]
  *   - a .conf argument overlays the bundled defaults;
  *   - positional sfDir/workDir (legacy form) override the path keys.
  */
object StreamDemo {

  /** Path overrides derived from legacy positional args. */
  private def positionalOverrides(pos: Seq[String]): Map[String, String] =
    pos.lift(0).map(d =>
      Map("graft.producer.data.sourceDir" -> d)).getOrElse(Map.empty) ++
      pos.lift(1).map(w => Map(
        "graft.producer.file.outputDir" -> s"$w/incoming",
        "graft.consumer.source.directory" -> s"$w/incoming",
        "graft.consumer.output.directory" -> s"$w/processed",
        "graft.consumer.output.checkpointDir" -> s"$w/checkpoint"))
        .getOrElse(Map.empty)

  def main(args: Array[String]): Unit = {
    val c = GraftConfig.loadWithDefaults(args.find(_.endsWith(".conf")))
      .overlay(positionalOverrides(args.filterNot(_.endsWith(".conf")).toSeq))
    val spark = graft.GraftSession.build(
      c.int("graft.consumer.spark.shufflePartitions", 8).toString)
    run(spark, c)
    spark.stop()
  }

  def run(spark: SparkSession, c: GraftConfig): Unit = {
    val sfDir = c.str("graft.producer.data.sourceDir", "/root/testdata/sf0.001")
    val table = c.str("graft.producer.data.table", "events")
    val busDir = c.str("graft.producer.file.outputDir",
      "/tmp/graft_stream_demo/incoming")
    val watchDir = c.str("graft.consumer.source.directory", busDir)
    val processed = c.str("graft.consumer.output.directory",
      "/tmp/graft_stream_demo/processed")
    val checkpoint = c.str("graft.consumer.output.checkpointDir",
      "/tmp/graft_stream_demo/checkpoint")

    // --- producer: slice the source table into ordered JSON batch drops
    val events = Tables(spark, sfDir, table)
      .select(StreamSources.eventSchema.fieldNames.map(col): _*)
    val prepared = Replay.prepare(events, Seq(col("ts"), col("event_id")))
    val total = prepared.count()
    val confBatch = c.long("graft.producer.data.batchSize", 0L)
    val batchSize = if (confBatch > 0) confBatch else math.max(1L, total / 5)
    val nBatches = Replay.batchCount(prepared, batchSize)
    Replay.writeBatches(prepared, busDir, batchSize, nBatches,
      intervalMillis = c.long("graft.producer.data.intervalSeconds", 0L) * 1000L,
      format = c.str("graft.producer.file.format", "json"))
    println(s"PRODUCED_BATCHES=$nBatches")

    // --- consumer: file stream -> four checkpointed datasets
    // batches land one-subdirectory-each; the file source doesn't
    // recurse, so watch them with a glob
    val stream = StreamSources.fileStream(spark, s"$watchDir/*",
      format = c.str("graft.consumer.source.format", "json"),
      maxFilesPerTrigger = c.int("graft.consumer.source.maxFilesPerTrigger", 2))
    val q = MultiSink.start(stream, MultiSink.Config.fromConf(c,
      keyA = "user_id", tagA = "pickup_location",
      keyB = "event_type", tagB = "dropoff_location"))
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
      StreamSources.fileStream(spark, s"$watchDir/*",
        format = c.str("graft.consumer.source.format", "json"),
        maxFilesPerTrigger = 100),
      gapSeconds = 1800L, watermarkDelay = "0 seconds")
    val sq = sess.writeStream.outputMode("append").format("memory")
      .queryName("sessions_out")
      .option("checkpointLocation", s"${checkpoint}_sessions")
      .start()
    sq.processAllAvailable()
    sq.stop()
    println(s"SESSIONS_EMITTED=${spark.table("sessions_out").count()}")
  }
}
