package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Audio column plumbing: WAV payloads as opaque `binary` columns,
  * decoded by a REAL from-scratch RIFF/PCM parser (no codec library —
  * WAV is a public, trivially specified container: RIFF header + `fmt `
  * chunk + `data` chunk, little-endian PCM).
  *
  * Same design as the image path ([[Multimodal]]): every kernel
  * (features, silence segmentation, decimation) operates on genuinely
  * DECODED samples inside one `mapPartitions` pass — per-row
  * imperative work on one payload at a time, so the operator
  * distributes with the rows and holds one decoded buffer per row, not
  * per partition. A corrupt blob fails LOUDLY (descriptive
  * IllegalArgumentException), never decodes to garbage.
  *
  * Feature determinism: all accumulators are exact integer sums
  * (peak/abs/square/crossing counts on 16-bit samples — a 640-sample
  * clip bounds sum_sq below 2^41, no overflow anywhere near Long); the
  * only floats are raw IEEE divisions and one `sqrt`, both correctly
  * rounded, hence bit-identical across engines (the textStats
  * convention).
  */
object Audio {

  /** A decoded clip: interleaved 16-bit samples. */
  case class DecodedAudio(sampleRate: Int, channels: Int,
      samples: Array[Short])

  case class AudioFeatures(media_id: Long, sample_rate: Long,
      n_samples: Long, duration_ms: Long, peak: Long, n_zero_cross: Long,
      sum_abs: Long, sum_sq: Long, mean_abs: Double, rms: Double)

  /** One detected silence run: [start_idx, start_idx + n). */
  case class AudioSegment(media_id: Long, seg_idx: Long, start_idx: Long,
      n: Long)

  // ------------------------------------------------------------------
  // Codec: canonical 44-byte-header WAV writer + chunk-walking reader.
  // ------------------------------------------------------------------

  private def putIntLE(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
    b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
  }
  private def putShortLE(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
  }
  private def intLE(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def shortLE(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)).toShort.toInt

  /** Serialize PCM16 samples as a canonical WAV blob: `RIFF` size
    * `WAVE`, a 16-byte `fmt ` chunk (format 1 = PCM), then `data`. */
  def encodeWav(sampleRate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0,
      s"encodeWav: bad rate=$sampleRate channels=$channels")
    require(samples.length % channels == 0,
      s"encodeWav: ${samples.length} samples not a multiple of " +
        s"$channels channels")
    val dataBytes = samples.length * 2
    val out = new Array[Byte](44 + dataBytes)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putIntLE(out, 4, 36 + dataBytes)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putIntLE(out, 16, 16)             // fmt chunk size
    putShortLE(out, 20, 1)            // PCM
    putShortLE(out, 22, channels)
    putIntLE(out, 24, sampleRate)
    putIntLE(out, 28, sampleRate * channels * 2) // byte rate
    putShortLE(out, 32, channels * 2) // block align
    putShortLE(out, 34, 16)           // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putIntLE(out, 40, dataBytes)
    var i = 0
    while (i < samples.length) {
      putShortLE(out, 44 + i * 2, samples(i)); i += 1
    }
    out
  }

  /** Parse a WAV blob: validates the RIFF/WAVE magic, WALKS chunks
    * (unknown chunks — `LIST`, `fact`, … — are skipped by their
    * declared size, as the container spec requires; naive fixed-offset
    * readers break on them), requires PCM 16-bit, and reads the `data`
    * block. Truncated or non-PCM payloads fail loudly. */
  def decodeWav(bytes: Array[Byte]): DecodedAudio = {
    def fail(msg: String) = throw new IllegalArgumentException(
      s"decodeWav: $msg (payload ${bytes.length} bytes)")
    if (bytes.length < 44) fail("too short for a WAV header")
    if (bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' ||
      bytes(3) != 'F') fail("missing RIFF magic")
    if (bytes(8) != 'W' || bytes(9) != 'A' || bytes(10) != 'V' ||
      bytes(11) != 'E') fail("missing WAVE form type")
    var pos = 12
    var rate = -1; var channels = -1; var bits = -1
    var data: Array[Short] = null
    while (pos + 8 <= bytes.length && (data == null || rate < 0)) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val size = intLE(bytes, pos + 4)
      if (size < 0 || pos + 8 + size > bytes.length)
        fail(s"chunk '$id' declares $size bytes past payload end")
      id match {
        case "fmt " =>
          if (size < 16) fail(s"fmt chunk too small ($size)")
          val fmt = shortLE(bytes, pos + 8)
          if (fmt != 1) fail(s"not PCM (format tag $fmt)")
          channels = shortLE(bytes, pos + 10)
          rate = intLE(bytes, pos + 12)
          bits = shortLE(bytes, pos + 22)
          if (bits != 16) fail(s"only PCM16 supported, got $bits-bit")
          if (channels <= 0 || rate <= 0)
            fail(s"bad fmt: channels=$channels rate=$rate")
        case "data" =>
          if (size % 2 != 0) fail(s"odd data chunk size $size")
          val n = size / 2
          val s = new Array[Short](n)
          var i = 0
          while (i < n) {
            s(i) = shortLE(bytes, pos + 8 + i * 2).toShort; i += 1
          }
          data = s
        case _ => () // skip unknown chunk (LIST, fact, cue, …)
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      pos += 8 + size + (size & 1)
    }
    if (rate < 0) fail("no fmt chunk")
    if (data == null) fail("no data chunk")
    if (data.length % channels != 0)
      fail(s"${data.length} samples not a multiple of $channels channels")
    DecodedAudio(rate, channels, data)
  }

  // ------------------------------------------------------------------
  // Deterministic fixture synthesizer (the blob-loader stand-in — a
  // production pipeline reads real clips from a parquet binary column).
  // ------------------------------------------------------------------

  /** Samples per clip for id-derived `base`: 400..640. */
  def synthClipLen(base: Long): Int = (400 + (base % 7) * 40).toInt

  /** Sample `i` of clip `base`: every third 50-sample block is EXACT
    * silence (planted segments for the silence detector); the rest is
    * aperiodic integer pseudo-noise in [-2000, 2000]. Pure integer
    * math, replayable verbatim in SQL. */
  def synthSample(base: Long, i: Int): Short = {
    if ((i / 50) % 3 == 2) 0
    else ((base * 37 + i.toLong * 11 + (i.toLong * i) % 193) % 4001
      - 2000).toShort
  }

  /** Deterministic mono-8kHz WAV corpus: one clip per id. With
    * `groupMod = Some(g)`, ids sharing `id % g` get byte-identical
    * clips (planted duplicate groups, same contract as
    * [[Multimodal.synthesizePpm]]). */
  def synthesizeWav(spark: SparkSession, df: DataFrame, idCol: String,
      groupMod: Option[Long] = None): Dataset[Multimodal.MediaRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val base = groupMod.map(id % _).getOrElse(id)
          val n = synthClipLen(base)
          val s = new Array[Short](n)
          var i = 0
          while (i < n) { s(i) = synthSample(base, i); i += 1 }
          val payload = encodeWav(8000, 1, s)
          Multimodal.MediaRow(id, payload, "audio/wav",
            payload.length.toLong)
        }
      }
  }

  // ------------------------------------------------------------------
  // Kernels: features, silence segmentation, decimation.
  // ------------------------------------------------------------------

  /** Decode each payload and reduce it to clip-level features in one
    * pass: duration (integer ms, floor), peak |s|, zero crossings
    * (strict sign flips — a zero sample breaks a crossing, so silence
    * runs never count), exact integer Σ|s| and Σs², and their derived
    * raw-division mean and √-rms. Multichannel clips fold across the
    * interleaved stream (frame-order scan), channel count folded into
    * n_samples. */
  def audioFeatures(spark: SparkSession,
      media: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.select("media_id", "payload", "media_type", "n_bytes")
      .as[Multimodal.MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val a = decodeWav(r.payload)
          val s = a.samples
          var i = 0
          var peak = 0L; var sumAbs = 0L; var sumSq = 0L; var zc = 0L
          var prevSign = 0
          while (i < s.length) {
            val v = s(i).toLong
            val av = math.abs(v)
            if (av > peak) peak = av
            sumAbs += av
            sumSq += v * v
            val sign = java.lang.Long.signum(v)
            if (sign != 0) {
              if (prevSign != 0 && sign != prevSign) zc += 1
              prevSign = sign
            } else prevSign = 0
            i += 1
          }
          val n = s.length.max(1)
          val frames = s.length / a.channels
          AudioFeatures(r.media_id, a.sampleRate.toLong, s.length.toLong,
            frames.toLong * 1000L / a.sampleRate, peak, zc,
            sumAbs, sumSq, sumAbs.toDouble / n,
            math.sqrt(sumSq.toDouble / n))
        }
      }
  }

  /** Silence segmentation: maximal runs of |s| < `threshold` at least
    * `minRun` samples long, emitted as (media_id, seg_idx, start_idx,
    * n) with seg_idx ordinal by start within the clip. The
    * trim/split primitive of every speech-data pipeline (VAD's exact
    * integer baseline). Mono only — segmentation across interleaved
    * channels is ill-defined. */
  def silenceSegments(spark: SparkSession, media: DataFrame,
      threshold: Int, minRun: Int): Dataset[AudioSegment] = {
    import spark.implicits._
    require(threshold > 0 && minRun >= 1,
      s"silenceSegments: bad threshold=$threshold minRun=$minRun")
    media.select("media_id", "payload", "media_type", "n_bytes")
      .as[Multimodal.MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val a = decodeWav(r.payload)
          require(a.channels == 1,
            s"silenceSegments: clip ${r.media_id} has ${a.channels} " +
              "channels; segment mono streams")
          val s = a.samples
          val out = scala.collection.mutable.ArrayBuffer.empty[AudioSegment]
          var i = 0; var runStart = -1
          def close(end: Int): Unit =
            if (runStart >= 0 && end - runStart >= minRun) {
              out += AudioSegment(r.media_id, out.length.toLong,
                runStart.toLong, (end - runStart).toLong)
            }
          while (i < s.length) {
            val quiet = math.abs(s(i).toInt) < threshold
            if (quiet && runStart < 0) runStart = i
            else if (!quiet && runStart >= 0) { close(i); runStart = -1 }
            i += 1
          }
          close(s.length)
          out
        }
      }
  }

  /** Attach a RIFF `LIST`/INFO metadata chunk (the standard WAV
    * tagging mechanism) between `fmt ` and `data` — a REAL container
    * rewrite: payload bytes change, decoded samples don't. Doubles as
    * the planted byte-different/content-equal fixture for content-
    * level dedup (the upscalePpm convention). */
  def withInfoChunk(spark: SparkSession, media: DataFrame,
      info: String): Dataset[Multimodal.MediaRow] = {
    import spark.implicits._
    val tag = info.getBytes("US-ASCII")
    require(tag.length % 2 == 0,
      "withInfoChunk: pad `info` to even length (RIFF word alignment)")
    media.select("media_id", "payload", "media_type", "n_bytes")
      .as[Multimodal.MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val a = decodeWav(r.payload) // validates; we re-encode clean
          val base = encodeWav(a.sampleRate, a.channels, a.samples)
          val chunk = new Array[Byte](8 + 4 + tag.length)
          chunk(0) = 'L'; chunk(1) = 'I'; chunk(2) = 'S'; chunk(3) = 'T'
          putIntLE(chunk, 4, 4 + tag.length)
          chunk(8) = 'I'; chunk(9) = 'N'; chunk(10) = 'F'; chunk(11) = 'O'
          System.arraycopy(tag, 0, chunk, 12, tag.length)
          val out = base.take(36) ++ chunk ++ base.drop(36)
          putIntLE(out, 4, out.length - 8)
          Multimodal.MediaRow(r.media_id, out, r.media_type,
            out.length.toLong)
        }
      }
  }

  /** Per-clip CONTENT signature vs payload signature: md5 over the
    * decoded sample stream (rate+channels prefixed, so a resampled or
    * remixed clip never collides) next to md5 over the raw container
    * bytes. Two encodings of one recording share `content_sig` and
    * differ in `payload_sig` — the content-level dedup key the image
    * path gets from [[Multimodal.decodedPixelPayloads]]. */
  def contentSignatures(spark: SparkSession,
      media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("media_id", "payload", "media_type", "n_bytes")
      .as[Multimodal.MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val a = decodeWav(r.payload)
          val buf = new Array[Byte](8 + a.samples.length * 2)
          putIntLE(buf, 0, a.sampleRate)
          putIntLE(buf, 4, a.channels)
          var i = 0
          while (i < a.samples.length) {
            putShortLE(buf, 8 + i * 2, a.samples(i)); i += 1
          }
          val md = java.security.MessageDigest.getInstance("MD5")
          def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
          (r.media_id, hex(md.digest(buf)), {
            val md2 = java.security.MessageDigest.getInstance("MD5")
            hex(md2.digest(r.payload))
          })
        }
      }.toDF("media_id", "content_sig", "payload_sig")
  }

  /** Content-level exact dedup pairs: clips whose DECODED streams are
    * identical, however the container framed them. One signature
    * projection + one equi-join on the content hash (never all-pairs);
    * signatures shared by more than `maxPerSig` media drop first (the
    * frameNearDups boilerplate/fan-out guard). Output: (a_id, b_id,
    * same_bytes). */
  def contentNearDups(spark: SparkSession, media: DataFrame,
      maxPerSig: Int = 64): DataFrame = {
    // sigs PINNED: consumed by the cap-filter aggregate and the kept
    // join — un-pinned, each reference re-ran the decode+hash pass
    // over the payload corpus; `kept` PINNED: both pair-join sides
    // (r18 final-plan audit: media_audio_near_dups carried 16 corpus
    // scans). Rows are (media_id, 2 hashes) — payload-free, linear.
    val sigs = contentSignatures(spark, media).localCheckpoint(true)
    val kept = sigs.join(
      sigs.groupBy(col("content_sig")).agg(count(lit(1)).as("__n"))
        .filter(col("__n") <= maxPerSig)
        .select(col("content_sig")),
      "content_sig")
      .localCheckpoint(true)
    kept.select(col("content_sig"), col("media_id").as("a_id"),
        col("payload_sig").as("__pa"))
      .join(kept.select(col("content_sig"), col("media_id").as("b_id"),
        col("payload_sig").as("__pb")), "content_sig")
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (col("__pa") === col("__pb")).as("same_bytes"))
  }

  /** Decimate by an integer `factor` (keep every factor-th sample) and
    * re-encode at rate/factor — the naive-but-exact resampler
    * (production would low-pass first; decimation is the deterministic
    * integer core and the shape proof: decode → kernel → encode in one
    * distributed pass). Mono only, as interleaved decimation would
    * de-sync channels. */
  def resampleWav(spark: SparkSession, media: DataFrame,
      factor: Int): Dataset[Multimodal.MediaRow] = {
    import spark.implicits._
    require(factor >= 1, s"resampleWav: factor must be >= 1, got $factor")
    media.select("media_id", "payload", "media_type", "n_bytes")
      .as[Multimodal.MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val a = decodeWav(r.payload)
          require(a.channels == 1,
            s"resampleWav: clip ${r.media_id} has ${a.channels} channels")
          require(a.sampleRate % factor == 0,
            s"resampleWav: rate ${a.sampleRate} not divisible by $factor")
          val n = (a.samples.length + factor - 1) / factor
          val out = new Array[Short](n)
          var j = 0
          while (j < n) { out(j) = a.samples(j * factor); j += 1 }
          val payload = encodeWav(a.sampleRate / factor, 1, out)
          Multimodal.MediaRow(r.media_id, payload, r.media_type,
            payload.length.toLong)
        }
      }
  }
}
