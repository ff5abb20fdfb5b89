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

  /** The reference dashboard's three panels (taxi_dashboard.py:127-201)
    * rendered as console text — latest raw rows (tolerant display-column
    * subset, P7), then pickup/dropoff top-location bar charts — over a
    * MultiSink output root. Driver-side data is bounded by construction:
    * the raw preview is `previewRows` rows, each bar panel `topK` rows;
    * all heavy lifting (pruned latest-batch reads, the count, the
    * aggregation) stays in Spark jobs. Missing datasets render as the
    * reference's "no data yet" notice instead of failing.
    */
  def renderPanels(spark: SparkSession, processedDir: String,
      nBatches: Int = 2, topK: Int = 10, previewRows: Int = 10): String = {
    val sb = new StringBuilder
    def panel(title: String)(body: => String): Unit =
      sb.append(s"== $title ==\n").append(body).append('\n')

    val rawDir = s"$processedDir/raw"
    if (latestBatchNumbers(spark, rawDir, nBatches).isEmpty)
      panel("latest trips")("no batches yet")
    else {
      val raw = latestBatches(spark, rawDir, nBatches)
      val display = graft.operators.Relational.selectPresent(raw,
        Seq("batch_id", "event_id", "ts", "user_id", "event_type", "value"))
      panel(s"latest trips ($nBatches batches, ${raw.count()} rows)")(
        fmtTable(display, previewRows))
    }
    Seq("pickup_agg" -> "top pickup locations",
        "dropoff_agg" -> "top dropoff locations").foreach { case (d, title) =>
      val dir = s"$processedDir/$d"
      if (latestBatchNumbers(spark, dir, nBatches).isEmpty)
        panel(title)("no batches yet")
      else panel(title)(fmtBars(topLocations(spark, dir, nBatches, topK)))
    }
    sb.result()
  }

  /** Bounded tab-separated preview (the st.dataframe analog). */
  private def fmtTable(df: DataFrame, n: Int): String = {
    val rows = df.limit(n).collect()
    (df.columns.mkString("\t") +:
      rows.map(_.toSeq.map(String.valueOf).mkString("\t"))).mkString("\n")
  }

  /** Console bar chart (the st.bar_chart analog); input is the already-
    * bounded (location_id, trip_count) top-k frame. */
  private def fmtBars(df: DataFrame): String = {
    val rows = df.collect().map(r =>
      (String.valueOf(r.get(0)), r.getLong(1)))
    val max = math.max(1L, if (rows.isEmpty) 1L else rows.map(_._2).max)
    rows.map { case (id, c) =>
      f"$id%12s $c%6d ${"#" * ((c * 40) / max).toInt}"
    }.mkString("\n")
  }
}
