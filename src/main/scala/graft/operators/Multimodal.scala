package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads modeled as
  * opaque `binary` columns with typed metadata, processed in batches.
  *
  * The decode kernels themselves are STUBBED (no codec libraries in this
  * environment): `decodeFeaturesStub` computes deterministic fake
  * features from the raw bytes. Everything around them — schema, typed
  * Dataset, mapPartitions batch shape, chunk/frame explode, partition
  * sizing — is the real plumbing a decoder would plug into.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, payload: Array[Byte],
      media_type: String, n_bytes: Long)

  case class MediaFeatures(media_id: Long, n_bytes: Long,
      mean_byte: Double, byte_entropy_bucket: Int)

  /** Build a media table from any (id, text) source by treating the
    * UTF-8 bytes as the payload — the stand-in for reading real blobs
    * (parquet `binary` column or binaryFile source). */
  def asMediaTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit("text/plain").as("media_type"),
      octet_length(col(textCol)).cast("long").as("n_bytes"))

  /** Fixed-size chunking / frame sampling: explode each payload into
    * `chunkBytes`-sized chunks with ordinal + content signature. This is
    * the frame-sampling plan shape for video (per-frame rows) — pure
    * expressions, no driver involvement, parallel per input partition.
    */
  def chunkFrames(media: DataFrame, chunkBytes: Int): DataFrame =
    media
      .withColumn("n_chunks",
        ceil(col("n_bytes").cast("double") / chunkBytes).cast("long"))
      // zero-byte payloads produce NO chunks — without the guard,
      // sequence(0, -1) silently yields [0, -1] (descending default
      // step) and two garbage chunks
      .filter(col("n_chunks") > 0)
      .select(col("media_id"), col("payload"), col("n_bytes"), col("n_chunks"),
        posexplode(sequence(lit(0L), col("n_chunks") - 1)))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumn("chunk_offset", col("col") * chunkBytes).drop("col")
      .withColumn("chunk_sig",
        expr(s"md5(substring(payload, chunk_offset + 1, $chunkBytes))"))
      .drop("payload")

  /** Frame sampling: every `everyN`-th chunk of each payload — the
    * video keyframe-sampling plan shape (decode cost scales with kept
    * frames, not stream length). Pure filter over the chunk explode. */
  def sampleFrames(media: DataFrame, chunkBytes: Int, everyN: Int): DataFrame =
    chunkFrames(media, chunkBytes)
      .filter(col("chunk_idx") % everyN === 0)

  /** OVERLAPPING frame windows: a `frameBytes` window every `hopBytes`
    * — the audio/STFT framing shape (hop < frame ⇒ overlap). Window
    * count per payload is ceil((n_bytes - frame)/hop)+1, so the
    * explode fan-out scales with the overlap factor frame/hop — the
    * same volume×overlap trade documented for slidingCounts. Short
    * payloads yield one whole-payload window.
    */
  def frameWindows(media: DataFrame, frameBytes: Int,
      hopBytes: Int): DataFrame =
    media
      .withColumn("n_windows",
        when(col("n_bytes") <= frameBytes, lit(1L))
          .otherwise(ceil((col("n_bytes") - frameBytes).cast("double")
            / hopBytes).cast("long") + 1))
      .select(col("media_id"), col("payload"), col("n_bytes"),
        col("n_windows"),
        posexplode(sequence(lit(0L), col("n_windows") - 1)))
      .withColumnRenamed("pos", "window_idx")
      .withColumn("window_offset", col("col") * hopBytes).drop("col")
      .withColumn("window_sig",
        expr(s"md5(substring(payload, window_offset + 1, $frameBytes))"))
      .drop("payload")

  /** STUB resize: clamps each payload to `maxBytes` (a real impl decodes
    * and re-encodes at the target resolution — same single-pass typed
    * mapPartitions shape as decodeFeaturesStub). Metadata stays honest:
    * n_bytes reflects the resized payload. */
  def resizeStub(spark: SparkSession, media: DataFrame,
      maxBytes: Int): Dataset[MediaRow] = {
    import spark.implicits._
    media.select("media_id", "payload", "media_type", "n_bytes")
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val p = if (r.payload.length <= maxBytes) r.payload
            else java.util.Arrays.copyOf(r.payload, maxBytes)
          MediaRow(r.media_id, p, r.media_type, p.length.toLong)
        }
      }
  }

  /** Frame-signature near-duplicate pairs across media — the video-
    * dedup shape a multimodal curation pipeline needs: sample every
    * `everyN`-th frame, fingerprint it (chunk_sig — md5 of the raw
    * chunk here, the perceptual-hash stand-in: a real pipeline hashes
    * the DECODED frame via decodeFeaturesStub's slot, the plan shape
    * is identical), and pair media through an equi-join on the
    * fingerprint — bucketed by frame hash, never all-pairs (the
    * LSH-band-join shape). A frame shared by more than
    * `maxMediaPerFrame` media is BOILERPLATE (intros, logos, silence)
    * and drops before pairing — the removeBoilerplate precedent, and
    * the mega-bucket guard bounding the join fan-out per frame.
    * overlap_frac divides exact integer counts (raw double — the
    * textStats bit-identical convention). Output: (a_id, b_id,
    * n_shared, overlap_frac = n_shared / min(distinct sampled
    * frames)), pairs with n_shared ≥ minShared, a_id < b_id. */
  def frameNearDups(media: DataFrame, chunkBytes: Int, everyN: Int,
      minShared: Long, maxMediaPerFrame: Long = 64L): DataFrame = {
    require(minShared >= 1 && maxMediaPerFrame >= 2,
      "minShared >= 1 and maxMediaPerFrame >= 2 required")
    val frames = sampleFrames(media, chunkBytes, everyN)
      .select(col("media_id"), col("chunk_sig")).distinct()
    val eligible = frames.join(
      frames.groupBy(col("chunk_sig"))
        .agg(count(lit(1)).as("__nm"))
        .filter(col("__nm") <= maxMediaPerFrame)
        .select(col("chunk_sig")),
      "chunk_sig")
    val counts = eligible.groupBy(col("media_id"))
      .agg(count(lit(1)).as("__nf"))
    eligible.select(col("media_id").as("a_id"), col("chunk_sig"))
      .join(eligible.select(col("media_id").as("b_id"), col("chunk_sig")),
        "chunk_sig")
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .join(counts.select(col("media_id").as("a_id"),
        col("__nf").as("__na")), "a_id")
      .join(counts.select(col("media_id").as("b_id"),
        col("__nf").as("__nb")), "b_id")
      .select(col("a_id"), col("b_id"), col("n_shared"),
        (col("n_shared").cast("double") /
          least(col("__na"), col("__nb"))).as("overlap_frac"))
  }

  /** STUB decode: deterministic per-row "features" from raw bytes via a
    * typed mapPartitions — the exact batch shape a real decoder (JNI
    * codec, ONNX encoder, ...) would use: one partition = one batch,
    * library handle initialized once per partition, rows streamed.
    */
  def decodeFeaturesStub(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("media_id", "payload", "media_type", "n_bytes")
      .as[MediaRow]
      .mapPartitions { rows =>
        // real impl: val codec = Codec.open() — once per partition/batch
        rows.map { r =>
          val bytes = r.payload
          val mean =
            if (bytes.isEmpty) 0.0
            else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
          MediaFeatures(r.media_id, r.n_bytes, mean, (mean / 32).toInt)
        }
      }
  }
}
