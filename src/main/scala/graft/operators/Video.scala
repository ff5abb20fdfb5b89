package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Video column plumbing: multi-frame clips as opaque `binary` columns
  * in GVID, a from-scratch raw-frame container (ASCII header
  * `GV1\n<W> <H> <F>\n` + F row-major RGB frame blocks — the
  * uncompressed-video analog of PPM's P6: a real header parse and a
  * real frame walk, no codec library). Compressed-video containers
  * don't ship with the JVM; the kernels below are container-agnostic —
  * they see decoded frame rasters, so a future codec only swaps
  * [[decodeGvid]].
  *
  * All kernels run one clip per row inside `mapPartitions` (decode →
  * per-frame integer reductions → emit), so cost distributes with the
  * rows and nothing is ever collected; per-frame outputs explode F
  * rows per clip, the frame-sampling fan-out documented for
  * [[Multimodal.chunkFrames]]. Features are exact integer sums with
  * raw IEEE-division means (the textStats bit-identity convention).
  */
object Video {

  /** A decoded clip: `frames(f)` is the row-major RGB block of frame
    * f, all frames `width`×`height`. */
  case class DecodedVideo(width: Int, height: Int,
      frames: Array[Array[Byte]])

  case class VideoFrameFeatures(media_id: Long, frame_idx: Long,
      width: Long, height: Long, px_sum: Long, mean_luma: Double)

  /** Frame-to-frame change row: `diff_sum` = Σ|Δchannel| between frame
    * `frame_idx` and its predecessor; `is_cut` = mean per-channel
    * change above the threshold. */
  case class SceneChange(media_id: Long, frame_idx: Long, diff_sum: Long,
      n_ch: Long, is_cut: Boolean)

  case class Keyframe(media_id: Long, frame_idx: Long, scene_idx: Long,
      px_sum: Long)

  /** Serialize frames as GVID. All frames must share dimensions. */
  def encodeGvid(video: DecodedVideo): Array[Byte] = {
    val DecodedVideo(w, h, frames) = video
    require(w > 0 && h > 0 && frames.nonEmpty,
      s"encodeGvid: bad dims ${w}x$h / ${frames.length} frames")
    val block = w * h * 3
    require(frames.forall(_.length == block),
      "encodeGvid: frame block size mismatch")
    val header = s"GV1\n$w $h ${frames.length}\n"
      .getBytes("US-ASCII")
    val out = new Array[Byte](header.length + block * frames.length)
    System.arraycopy(header, 0, out, 0, header.length)
    var f = 0
    while (f < frames.length) {
      System.arraycopy(frames(f), 0, out, header.length + f * block, block)
      f += 1
    }
    out
  }

  /** Parse a GVID blob: magic, three ASCII ints, then exactly
    * F·W·H·3 frame bytes. Truncated or malformed payloads fail with a
    * descriptive error — a corrupt blob never decodes to garbage. */
  def decodeGvid(bytes: Array[Byte]): DecodedVideo = {
    def fail(msg: String) = throw new IllegalArgumentException(
      s"decodeGvid: $msg (payload ${bytes.length} bytes)")
    if (bytes.length < 4 || bytes(0) != 'G' || bytes(1) != 'V' ||
      bytes(2) != '1' || bytes(3) != '\n') fail("missing GV1 magic")
    var pos = 4
    def readInt(): Int = {
      while (pos < bytes.length && (bytes(pos) == ' ' || bytes(pos) == '\n'))
        pos += 1
      val start = pos
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9')
        pos += 1
      if (pos == start) fail(s"expected integer at offset $start")
      new String(bytes, start, pos - start, "US-ASCII").toInt
    }
    val w = readInt(); val h = readInt(); val nf = readInt()
    if (pos >= bytes.length || bytes(pos) != '\n')
      fail("header not newline-terminated")
    pos += 1
    if (w <= 0 || h <= 0 || nf <= 0) fail(s"bad dims ${w}x$h x$nf")
    val block = w * h * 3
    if (bytes.length - pos != block * nf)
      fail(s"expected $nf frames of $block bytes, " +
        s"got ${bytes.length - pos} payload bytes")
    val frames = Array.ofDim[Array[Byte]](nf)
    var f = 0
    while (f < nf) {
      frames(f) = java.util.Arrays.copyOfRange(bytes, pos + f * block,
        pos + (f + 1) * block)
      f += 1
    }
    DecodedVideo(w, h, frames)
  }

  // ------------------------------------------------------------------
  // Deterministic fixture synthesizer. Scene structure is planted so
  // the cut detector has ground truth: frames within a scene differ by
  // EXACTLY +1 per channel (slow motion), scene boundaries jump every
  // channel by ≥ 51 gray levels (the mod-251 shift of 53 keeps
  // |Δ| ∈ {51, 52, 199, 200} — provably above any mid-range
  // threshold, so cut detection is exact, never probabilistic).
  // ------------------------------------------------------------------

  def synthDims(base: Long): (Int, Int, Int, Int) =
    ((8 + base % 5).toInt, (6 + base % 4).toInt, (4 + base % 3).toInt,
      (2 + base % 2).toInt) // (W, H, frames, scene length)

  /** Channel value at flat index `i` of frame `f`: scene-keyed
    * aperiodic base in [0, 250] plus the in-scene phase (0..L-1). */
  def synthChannel(base: Long, f: Int, sceneLen: Int, i: Int): Int =
    (((base * 31 + (f / sceneLen).toLong * 53 + i.toLong * 7 +
      (i.toLong * i) % 97) % 251) + f % sceneLen).toInt

  /** Deterministic GVID corpus: one clip per id, id-derived dims and
    * scene structure. With `groupMod = Some(g)`, ids sharing `id % g`
    * get byte-identical clips. */
  def synthesizeGvid(spark: SparkSession, df: DataFrame, idCol: String,
      groupMod: Option[Long] = None): Dataset[Multimodal.MediaRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val base = groupMod.map(id % _).getOrElse(id)
          val (w, h, nf, sceneLen) = synthDims(base)
          val frames = Array.tabulate(nf) { f =>
            val px = new Array[Byte](w * h * 3)
            var i = 0
            while (i < px.length) {
              px(i) = synthChannel(base, f, sceneLen, i).toByte
              i += 1
            }
            px
          }
          val payload = encodeGvid(DecodedVideo(w, h, frames))
          Multimodal.MediaRow(id, payload, "video/x-gvid",
            payload.length.toLong)
        }
      }
  }

  // ------------------------------------------------------------------
  // Kernels.
  // ------------------------------------------------------------------

  /** Per-frame features: exact channel sum + Rec.709 luma mean of each
    * decoded frame — the per-frame row explode (F rows per clip). */
  def videoFrameFeatures(spark: SparkSession,
      media: DataFrame): Dataset[VideoFrameFeatures] = {
    import spark.implicits._
    media.select("media_id", "payload", "media_type", "n_bytes")
      .as[Multimodal.MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val v = decodeGvid(r.payload)
          val nPx = (v.width.toLong * v.height).max(1L)
          v.frames.iterator.zipWithIndex.map { case (px, f) =>
            var i = 0; var sum = 0L; var luma = 0L
            while (i < px.length) {
              luma += 2126L * (px(i) & 0xff) + 7152L * (px(i + 1) & 0xff) +
                722L * (px(i + 2) & 0xff)
              sum += (px(i) & 0xff) + (px(i + 1) & 0xff) + (px(i + 2) & 0xff)
              i += 3
            }
            VideoFrameFeatures(r.media_id, f.toLong, v.width.toLong,
              v.height.toLong, sum, luma / (10000.0 * nPx))
          }
        }
      }
  }

  /** Shot-boundary detection: for every consecutive frame pair, the
    * exact Σ|Δchannel|, flagged a cut when the MEAN per-channel change
    * exceeds `meanDiffThr` (threshold scales with resolution, so one
    * setting serves mixed-dimension corpora). F−1 rows per clip. */
  def sceneChanges(spark: SparkSession, media: DataFrame,
      meanDiffThr: Int): Dataset[SceneChange] = {
    import spark.implicits._
    require(meanDiffThr >= 0, s"sceneChanges: bad threshold $meanDiffThr")
    media.select("media_id", "payload", "media_type", "n_bytes")
      .as[Multimodal.MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val v = decodeGvid(r.payload)
          val nCh = v.width.toLong * v.height * 3
          (1 until v.frames.length).iterator.map { f =>
            val a = v.frames(f - 1); val b = v.frames(f)
            var i = 0; var d = 0L
            while (i < a.length) {
              d += math.abs((b(i) & 0xff) - (a(i) & 0xff)); i += 1
            }
            SceneChange(r.media_id, f.toLong, d, nCh,
              d > meanDiffThr * nCh)
          }
        }
      }
  }

  /** One (media_id, frame_sig) row per DISTINCT decoded-frame content
    * of each clip: md5 over (width, height, RGB block) — the
    * content-level frame fingerprint (two clips sharing footage share
    * signatures however their containers differ). */
  def frameSignatures(spark: SparkSession,
      media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("media_id", "payload", "media_type", "n_bytes")
      .as[Multimodal.MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val v = decodeGvid(r.payload)
          val head = s"${v.width}x${v.height}:".getBytes("US-ASCII")
          v.frames.iterator.map { px =>
            val md = java.security.MessageDigest.getInstance("MD5")
            md.update(head); md.update(px)
            (r.media_id, md.digest().map("%02x".format(_)).mkString)
          }.toSet.iterator // distinct within the clip
        }
      }.toDF("media_id", "frame_sig")
  }

  /** Clip-level near-dup pairing on shared decoded-frame content —
    * [[Multimodal.frameNearDups]] re-keyed from byte chunks to REAL
    * frames: pairs form through the frame-signature equi-join (never
    * all-pairs), frames appearing in more than `maxMediaPerFrame`
    * clips drop first (boilerplate intros/logos AND the fan-out
    * guard), `overlap_frac` = shared / min(frame counts). */
  def videoFrameNearDups(spark: SparkSession, media: DataFrame,
      minShared: Long = 1L, maxMediaPerFrame: Int = 64): DataFrame = {
    // sigs PINNED: consumed by the cap-filter aggregate and the kept
    // join — un-pinned, each reference re-ran the clip decode + per-
    // frame hashing; `kept` PINNED: consumed 3x (per-media counts +
    // both pair-join sides). Rows are (media_id, frame_sig) —
    // payload-free, frame-bounded (r18 final-plan audit:
    // media_video_near_dups carried 16 corpus scans).
    val sigs = frameSignatures(spark, media).localCheckpoint(true)
    val kept = sigs.join(
      sigs.groupBy(col("frame_sig")).agg(count(lit(1)).as("__nm"))
        .filter(col("__nm") <= maxMediaPerFrame)
        .select(col("frame_sig")),
      "frame_sig")
      .localCheckpoint(true)
    val counts = kept.groupBy(col("media_id"))
      .agg(count(lit(1)).as("__nf"))
    val pairs = kept.select(col("frame_sig"), col("media_id").as("a_id"))
      .join(kept.select(col("frame_sig"), col("media_id").as("b_id")),
        "frame_sig")
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    pairs
      .join(counts.select(col("media_id").as("a_id"),
        col("__nf").as("__na")), "a_id")
      .join(counts.select(col("media_id").as("b_id"),
        col("__nf").as("__nb")), "b_id")
      .select(col("a_id"), col("b_id"), col("n_shared"),
        (col("n_shared").cast("double") /
          least(col("__na"), col("__nb")).cast("double"))
          .as("overlap_frac"))
  }

  /** Keyframe sampling: frame 0 plus the first frame of every detected
    * shot, stamped with its shot ordinal — the decode-only-what-you-
    * keep shape (a downstream image kernel runs on keyframes, not on
    * every frame). */
  def keyframes(spark: SparkSession, media: DataFrame,
      meanDiffThr: Int): Dataset[Keyframe] = {
    import spark.implicits._
    media.select("media_id", "payload", "media_type", "n_bytes")
      .as[Multimodal.MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val v = decodeGvid(r.payload)
          val nCh = v.width.toLong * v.height * 3
          val out = scala.collection.mutable.ArrayBuffer.empty[Keyframe]
          var scene = 0L
          var f = 0
          while (f < v.frames.length) {
            val isKey = f == 0 || {
              val a = v.frames(f - 1); val b = v.frames(f)
              var i = 0; var d = 0L
              while (i < a.length) {
                d += math.abs((b(i) & 0xff) - (a(i) & 0xff)); i += 1
              }
              d > meanDiffThr * nCh
            }
            if (isKey) {
              if (f > 0) scene += 1
              val px = v.frames(f)
              var i = 0; var sum = 0L
              while (i < px.length) { sum += px(i) & 0xff; i += 1 }
              out += Keyframe(r.media_id, f.toLong, scene, sum)
            }
            f += 1
          }
          out
        }
      }
  }
}
