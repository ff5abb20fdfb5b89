package graft.streaming

import graft.operators.Incremental
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** A maintained TABLE driven by a change stream — the streaming closure
  * of [[graft.operators.Incremental]]: each micro-batch of change rows
  * (upserts + deletes) replays onto the current table state via
  * `applyChangeLog`, and each resulting state is written as an
  * immutable VERSION directory `v=%06d` (version = the foreachBatch
  * batch id) under one table root.
  *
  * Version-per-batch is the whole consistency story, from first
  * principles rather than a table-format dependency:
  *  - **exactly-once from at-least-once**: a replayed batch rewrites
  *    its own version directory (same inputs → same bytes) instead of
  *    double-applying — the MultiSink `batch_id=N` overwrite contract
  *    lifted to whole-table state;
  *  - **no read-overwrite hazard**: batch N reads `v=N-1` and writes
  *    `v=N` — never the directory it is reading — so the state never
  *    needs a `localCheckpoint` pin, which at 100 TB would materialize
  *    the whole table per batch;
  *  - **crash safety**: a version without `_SUCCESS` is ignored by the
  *    reader and overwritten by the replay;
  *  - **time travel for free**: every surviving version is a readable
  *    snapshot ([[readVersion]]); [[vacuum]] bounds retention.
  *
  * A `_run_id` marker file pins the state root to one logical query
  * (the heavyHittersBatches lesson, `StreamOps.scala:506-529`): a NEW
  * query restarts batch ids at 0, which version arithmetic alone would
  * misread as replays of the earliest batches — so a marker mismatch
  * fails loudly instead of silently serving stale state.
  *
  * Scale shape: per batch, one `applyChangeLog` (≤3 key-hash shuffles,
  * feed side AQE-broadcast when small) + one table write. The write IS
  * the cost of maintaining a table without a compacting format; at
  * 100 TB the production variants are (a) partition the table and
  * rewrite only partitions the batch touches (`partitionBy` on the
  * write + a feed-derived partition filter on the read), or (b) write
  * delta versions and fold on read — both compose from these same
  * pieces without changing the operator's contract.
  */
object MaintainedTable {

  private val VersionRe = "^v=(\\d{6})$".r

  def versionPath(tableDir: String, version: Long): String =
    f"$tableDir/v=$version%06d"

  /** Committed (has `_SUCCESS`) versions under `tableDir`, ascending. */
  def versions(spark: SparkSession, tableDir: String): Seq[Long] = {
    val root = new Path(tableDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toIndexedSeq
      .filter(_.isDirectory)
      .flatMap(st => st.getPath.getName match {
        case VersionRe(v)
          if fs.exists(new Path(st.getPath, "_SUCCESS")) => Some(v.toLong)
        case _ => None
      }).sorted
  }

  /** Snapshot at `version` — time travel. Fails loudly on an
    * uncommitted or vacuumed version. */
  def readVersion(spark: SparkSession, tableDir: String,
      version: Long): DataFrame = {
    require(versions(spark, tableDir).contains(version),
      s"maintained table $tableDir has no committed version $version " +
        s"(have: ${versions(spark, tableDir).mkString(",")})")
    spark.read.parquet(versionPath(tableDir, version))
  }

  /** Latest committed snapshot, if any version exists. */
  def latest(spark: SparkSession, tableDir: String): Option[(Long, DataFrame)] =
    versions(spark, tableDir).lastOption.map(v =>
      v -> spark.read.parquet(versionPath(tableDir, v)))

  /** Drop all but the newest `keepLast` committed versions (and any
    * uncommitted debris older than the newest). Returns the versions
    * deleted. Never touches the latest version. */
  def vacuum(spark: SparkSession, tableDir: String,
      keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, s"vacuum keepLast must be >= 1, got $keepLast")
    val vs = versions(spark, tableDir)
    val doomed = vs.dropRight(keepLast)
    val fs = new Path(tableDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    doomed.foreach(v => fs.delete(new Path(versionPath(tableDir, v)), true))
    doomed
  }

  private def checkRunId(spark: SparkSession, tableDir: String,
      runId: String): Unit = {
    val root = new Path(tableDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(root, "_run_id")
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val stored = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      if (stored != runId) throw new IllegalStateException(
        s"maintained table at $tableDir belongs to run '$stored', not " +
          s"'$runId': version arithmetic cannot distinguish a fresh " +
          "query's early batches from replays, so refusing to apply — " +
          "wipe the table dir for a new query, or resume with the " +
          "original runId")
    } else {
      fs.mkdirs(root)
      val out = fs.create(marker, true)
      try out.write(runId.getBytes("UTF-8")) finally out.close()
    }
  }

  /** The per-batch apply step, exposed so specs (and non-streaming
    * callers with their own batch loop) can drive it directly:
    * idempotent in `batchId`. Returns the state now current. */
  def applyBatch(initial: DataFrame, batch: DataFrame, keys: Seq[String],
      ord: Seq[Column], tableDir: String, runId: String, batchId: Long,
      opCol: String = "op", deleteOp: String = "delete"): DataFrame = {
    val spark = batch.sparkSession
    checkRunId(spark, tableDir, runId)
    val done = versions(spark, tableDir)
    if (done.contains(batchId)) // at-least-once replay: state unchanged
      readVersion(spark, tableDir, batchId)
    else {
      val prev = done.filter(_ < batchId).lastOption
        .map(v => readVersion(spark, tableDir, v)).getOrElse(initial)
      val next = Incremental.applyChangeLog(prev, batch, keys, ord,
        opCol, deleteOp)
      next.write.mode("overwrite").parquet(versionPath(tableDir, batchId))
      readVersion(spark, tableDir, batchId)
    }
  }

  /** Start the maintained-table query: `stream` carries change rows
    * (payload columns aligned with `initial`, plus `opCol`), `ord`
    * orders ops within a key within a batch (latest wins). `sink`
    * receives each committed snapshot + its version. */
  def maintain(stream: DataFrame, initial: DataFrame, keys: Seq[String],
      ord: Seq[Column], tableDir: String, runId: String,
      opCol: String = "op", deleteOp: String = "delete")(
      sink: (DataFrame, Long) => Unit = (_, _) => ()): StreamingQuery =
    stream.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val state = applyBatch(initial, batch, keys, ord, tableDir,
          runId, batchId, opCol, deleteOp)
        sink(state, batchId)
        ()
    }.start()
}
