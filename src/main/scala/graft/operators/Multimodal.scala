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
