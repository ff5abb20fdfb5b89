package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads modeled as
  * opaque `binary` columns with typed metadata, processed in batches.
  *
  * The image path is REAL end to end, compressed formats included:
  * `decodePpm` is a from-scratch byte parser for binary PPM (P6) —
  * comment-tolerant ASCII header + raw RGB block — and [[decodeImage]]
  * sniffs the payload and routes anything else (PNG/JPEG/GIF/BMP/TIFF)
  * through the JDK's own `javax.imageio` codecs (java.desktop module,
  * present in every standard JRE — no external library). All kernels
  * (`resizeNearest`, `dHash64`, `decodeImageFeatures`) operate on
  * genuinely DECODED pixels, so two encodings of one raster converge
  * to the same features/fingerprints.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, payload: Array[Byte],
      media_type: String, n_bytes: Long)

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

  // ------------------------------------------------------------------
  // Real in-JVM image codec: PPM (P6), the canonical uncompressed
  // raster format. No codec library exists in this environment, so the
  // decoder is a from-scratch byte parser — magic, comment-tolerant
  // ASCII header, raw RGB block — and the kernels below (resize,
  // features) operate on genuinely DECODED pixels, not raw payloads.
  // ------------------------------------------------------------------

  /** A decoded raster: `pixels` is row-major RGB, 3 bytes per pixel. */
  case class DecodedImage(width: Int, height: Int, maxval: Int,
      pixels: Array[Byte])

  case class ImageFeatures(media_id: Long, width: Long, height: Long,
      n_px: Long, px_sum: Long, mean_r: Double, mean_g: Double,
      mean_b: Double, mean_luma: Double)

  /** Serialize a decoded raster as binary PPM (P6): ASCII header
    * `P6\n<w> <h>\n<maxval>\n` followed by the raw RGB block. */
  def encodePpm(img: DecodedImage): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n${img.maxval}\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
    out
  }

  /** Parse a binary PPM (P6) payload. Real parser semantics: the three
    * header integers (width, height, maxval) are separated by arbitrary
    * whitespace, `#`-to-end-of-line comments may appear anywhere inside
    * the header whitespace, and exactly ONE whitespace byte separates
    * maxval from the raw pixel block. Throws on malformed input — a
    * corrupt blob must fail loudly, not decode to garbage. */
  def decodePpm(bytes: Array[Byte]): DecodedImage = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      "not a P6 PPM payload")
    var pos = 2
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    def skipWsAndComments(): Unit = {
      var moving = true
      while (moving) {
        moving = false
        while (pos < bytes.length && isWs(bytes(pos))) { pos += 1; moving = true }
        if (pos < bytes.length && bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
          moving = true
        }
      }
    }
    def readInt(): Int = {
      skipWsAndComments()
      require(pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9',
        s"malformed PPM header at byte $pos")
      var v = 0
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1
      }
      v
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    require(w > 0 && h > 0, s"bad PPM dimensions ${w}x$h")
    require(maxval > 0 && maxval < 256,
      s"unsupported PPM maxval $maxval (single-byte samples only)")
    require(pos < bytes.length && isWs(bytes(pos)),
      "missing whitespace after PPM maxval")
    pos += 1 // exactly one whitespace byte, then raw data
    val n = w * h * 3
    require(bytes.length - pos >= n,
      s"truncated PPM pixel block: need $n, have ${bytes.length - pos}")
    DecodedImage(w, h, maxval, java.util.Arrays.copyOfRange(bytes, pos, pos + n))
  }

  // ------------------------------------------------------------------
  // Compressed codecs via the JDK's javax.imageio (java.desktop module
  // — standard JRE content, loads headless; probed in MultimodalSpec).
  // PNG is lossless, so decode(encodePng(img)).pixels == img.pixels
  // bit-for-bit and every pixel-level fingerprint (dHash, features) is
  // INVARIANT under a PNG transcode. JPEG is lossy: decoded pixels
  // land within a few gray levels of the source, so cross-format
  // agreement is a TOLERANCE property (the sketch-query convention).
  // ------------------------------------------------------------------

  /** Force headless AWT once per JVM before any ImageIO touch — done in
    * a lazy val so executor JVMs (where mapPartitions closures run) get
    * it too, not just the driver. */
  private lazy val imageIoReady: Unit = {
    System.setProperty("java.awt.headless", "true")
    ()
  }

  /** Decode ANY supported image payload: P6 PPM through the in-repo
    * parser (fast path, no AWT), everything else through the JDK
    * ImageIO codecs (PNG/JPEG/GIF/BMP/TIFF). Output is the same
    * row-major RGB `DecodedImage` either way; alpha is dropped (RGB
    * extracted per pixel). Throws loudly on payloads no codec accepts —
    * a corrupt blob must never decode to garbage. */
  def decodeImage(bytes: Array[Byte]): DecodedImage = {
    if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6')
      return decodePpm(bytes)
    imageIoReady
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    require(img != null,
      s"payload (${bytes.length} bytes) not decodable by any " +
        "available image codec")
    val w = img.getWidth; val h = img.getHeight
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val o = (y * w + x) * 3
        px(o) = ((rgb >> 16) & 0xff).toByte
        px(o + 1) = ((rgb >> 8) & 0xff).toByte
        px(o + 2) = (rgb & 0xff).toByte
        x += 1
      }
      y += 1
    }
    DecodedImage(w, h, 255, px)
  }

  /** Encode a decoded raster through a JDK ImageIO writer (`"png"` —
    * lossless, or `"jpg"` — lossy, default quality). */
  def encodeImage(img: DecodedImage, format: String): Array[Byte] = {
    imageIoReady
    val buf = new java.awt.image.BufferedImage(img.width, img.height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val o = (y * img.width + x) * 3
        buf.setRGB(x, y, ((img.pixels(o) & 0xff) << 16) |
          ((img.pixels(o + 1) & 0xff) << 8) | (img.pixels(o + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(buf, format, bos),
      s"no ImageIO writer for format '$format'")
    bos.toByteArray
  }

  /** Re-encode every payload into `format` ("png"/"jpg") — the
    * compressed-codec transcode operator: decode (any format) +
    * encode in one typed mapPartitions pass, media_type updated,
    * n_bytes reflecting the compressed blob. */
  def transcode(spark: SparkSession, media: DataFrame,
      format: String): Dataset[MediaRow] = {
    import spark.implicits._
    val mediaType =
      if (format == "jpg" || format == "jpeg") "image/jpeg"
      else s"image/$format"
    media.select("media_id", "payload", "media_type", "n_bytes")
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val p = encodeImage(decodeImage(r.payload), format)
          MediaRow(r.media_id, p, mediaType, p.length.toLong)
        }
      }
  }

  /** Nearest-neighbor resample to `outW`×`outH`: output pixel (x, y)
    * reads source pixel (x·W/outW, y·H/outH), integer floor — the
    * standard decimation kernel, exact integer math end to end. */
  def resizeNearest(img: DecodedImage, outW: Int, outH: Int): DecodedImage = {
    require(outW > 0 && outH > 0, "resize target must be positive")
    val out = new Array[Byte](outW * outH * 3)
    var y = 0
    while (y < outH) {
      val sy = y * img.height / outH
      var x = 0
      while (x < outW) {
        val sx = x * img.width / outW
        val si = (sy * img.width + sx) * 3
        val di = (y * outW + x) * 3
        out(di) = img.pixels(si)
        out(di + 1) = img.pixels(si + 1)
        out(di + 2) = img.pixels(si + 2)
        x += 1
      }
      y += 1
    }
    DecodedImage(outW, outH, img.maxval, out)
  }

  /** Decode each PPM payload and re-encode at `outW`×`outH` — the real
    * image-resize operator: one typed mapPartitions pass, decoder state
    * per partition, metadata (n_bytes) reflecting the re-encoded blob. */
  def resizePpm(spark: SparkSession, media: DataFrame,
      outW: Int, outH: Int): Dataset[MediaRow] = {
    import spark.implicits._
    media.select("media_id", "payload", "media_type", "n_bytes")
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val p = encodePpm(resizeNearest(decodePpm(r.payload), outW, outH))
          MediaRow(r.media_id, p, r.media_type, p.length.toLong)
        }
      }
  }

  /** Decode each PPM payload and re-encode at (`factor`·W)×(`factor`·H)
    * — per-image integer upscaling (resizePpm targets FIXED dims; this
    * keeps each image's own aspect). Nearest-neighbor ×k upscales are
    * the canonical planted near-duplicate: byte-different payloads,
    * pixel-equivalent content — `dHash64` is invariant to them (the
    * nested-floor identity ⌊⌊k·W·x/9⌋/k⌋ = ⌊W·x/9⌋ makes the 9×8
    * downsample of the upscale bit-identical to the original's). */
  def upscalePpm(spark: SparkSession, media: DataFrame,
      factor: Int): Dataset[MediaRow] = {
    import spark.implicits._
    require(factor >= 1, s"upscalePpm factor must be >= 1, got $factor")
    media.select("media_id", "payload", "media_type", "n_bytes")
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val img = decodePpm(r.payload)
          val p = encodePpm(
            resizeNearest(img, img.width * factor, img.height * factor))
          MediaRow(r.media_id, p, r.media_type, p.length.toLong)
        }
      }
  }

  /** TRUE perceptual hash — 64-bit difference hash (dHash), the
    * industry-standard cheap image fingerprint: downsample to 9×8 with
    * [[resizeNearest]], reduce each pixel to integer Rec.709 luma
    * (2126·R + 7152·G + 722·B — exact long arithmetic, the
    * decodeImageFeatures convention), then emit one bit per adjacent
    * horizontal pair: bit (y·8+x) = 1 iff luma(x+1, y) > luma(x, y).
    * Hashes CONTENT STRUCTURE, not bytes: any image and its exact
    * nearest-neighbor integer upscale produce the SAME hash (see
    * [[upscalePpm]]), and mild re-encodings land within a small Hamming
    * distance — exactly what md5-of-payload can never do. Pure integer
    * JVM math, replayable from the pixel formula in a second engine. */
  def dHash64(img: DecodedImage): Long = {
    val g = resizeNearest(img, 9, 8)
    val lum = new Array[Long](72)
    var i = 0
    while (i < 72) {
      val o = i * 3
      lum(i) = 2126L * (g.pixels(o) & 0xff) + 7152L * (g.pixels(o + 1) & 0xff) +
        722L * (g.pixels(o + 2) & 0xff)
      i += 1
    }
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (lum(y * 9 + x + 1) > lum(y * 9 + x)) h |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    h
  }

  /** Per-media perceptual hashes: decode + dHash in one typed
    * mapPartitions pass (the decoder batch shape). Codec-agnostic
    * ([[decodeImage]]): a raster and its PNG transcode hash
    * IDENTICALLY (lossless round-trip), a JPEG transcode lands within
    * a small Hamming distance. (media_id, phash). */
  def perceptualHashes(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("media_id", "payload", "media_type", "n_bytes")
      .as[MediaRow]
      .mapPartitions(rows =>
        rows.map(r => (r.media_id, dHash64(decodeImage(r.payload)))))
      .toDF("media_id", "phash")
  }

  /** Near-duplicate pairs by perceptual-hash Hamming distance ≤
    * `maxHamming`, WITHOUT all-pairs: pigeonhole banding (the SimHash
    * precedent, Dedup.simhashNearDups) — split the 64 bits into
    * `maxHamming`+1 bands, so any pair within distance maxHamming
    * matches exactly on AT LEAST one band; candidates come from a
    * per-band equi-join, a band value shared by more than
    * `maxBandMedia` media is dropped as boilerplate (the mega-bucket
    * cap bounding join fan-out), and every candidate is verified with
    * the exact popcount-of-xor distance. Output (a_id, b_id, hamming),
    * a_id < b_id, distinct. */
  def phashNearDups(hashes: DataFrame, maxHamming: Int,
      maxBandMedia: Long = 64L): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 16,
      s"maxHamming out of range: $maxHamming")
    val nBands = maxHamming + 1
    val width = 64 / nBands
    // bands PINNED: consumed by the cap-filter aggregate and the band
    // join's two sides — un-pinned, each reference re-ran the hashes
    // subtree, i.e. the whole decode+dHash pass (r18 final-plan
    // audit: media_near_dups_phash carried 24 corpus scans). Rows are
    // (maxHamming+1)·n — linear, no payloads. `eligible` likewise
    // (both pair-join sides).
    val bands = hashes.select(col("media_id"), col("phash"),
        posexplode(array((0 until nBands).map { b =>
          val off = b * width
          val w = if (b == nBands - 1) 64 - off else width
          val mask = if (w == 64) -1L else (1L << w) - 1L
          shiftrightunsigned(col("phash"), off).bitwiseAND(lit(mask))
        }: _*)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_val")
      .localCheckpoint(true)
    val eligible = bands.join(
      bands.groupBy(col("band_idx"), col("band_val"))
        .agg(count(lit(1)).as("__nm"))
        .filter(col("__nm") <= maxBandMedia)
        .select(col("band_idx"), col("band_val")),
      Seq("band_idx", "band_val"))
      .localCheckpoint(true)
    eligible.select(col("band_idx"), col("band_val"),
        col("media_id").as("a_id"), col("phash").as("__ha"))
      .join(eligible.select(col("band_idx"), col("band_val"),
        col("media_id").as("b_id"), col("phash").as("__hb")),
        Seq("band_idx", "band_val"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        expr("CAST(bit_count(__ha ^ __hb) AS BIGINT)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Frame-signature near-duplicate pairs across media — the video-
    * dedup shape a multimodal curation pipeline needs: sample every
    * `everyN`-th frame, fingerprint it (chunk_sig — md5 of the raw
    * chunk: the EXACT flavor, catching bit-identical frames only; see
    * [[dHash64]]/[[phashNearDups]] for the perceptual flavor that also
    * catches rescaled/re-encoded rasters), and pair media through an
    * equi-join on the
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
    // frames PINNED: consumed by the cap-filter aggregate and the
    // eligible join — un-pinned, each reference re-ran the frame
    // sampling over the payload corpus; `eligible` PINNED: consumed
    // 3x (per-media counts + both pair-join sides). Both are
    // (media_id, chunk_sig) rows — payload-free, frame-bounded (r18
    // final-plan audit: media_near_dups carried 24 corpus scans).
    val frames = sampleFrames(media, chunkBytes, everyN)
      .select(col("media_id"), col("chunk_sig")).distinct()
      .localCheckpoint(true)
    val eligible = frames.join(
      frames.groupBy(col("chunk_sig"))
        .agg(count(lit(1)).as("__nm"))
        .filter(col("__nm") <= maxMediaPerFrame)
        .select(col("chunk_sig")),
      "chunk_sig")
      .localCheckpoint(true)
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

  /** Decode each image payload (any [[decodeImage]] codec) and extract
    * REAL pixel features: per-
    * channel means and Rec.709 luma (integer-scaled 2126/7152/722, so
    * the sums stay exact longs and the final double division is
    * bit-identical across engines — the textStats convention). The
    * typed mapPartitions is the decoder batch shape: one partition =
    * one batch, rows streamed through the parser. */
  def decodeImageFeatures(spark: SparkSession,
      media: DataFrame): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.select("media_id", "payload", "media_type", "n_bytes")
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val img = decodeImage(r.payload)
          val px = img.pixels
          var i = 0
          var sumR = 0L; var sumG = 0L; var sumB = 0L; var sumL = 0L
          while (i < px.length) {
            val rr = px(i) & 0xff; val gg = px(i + 1) & 0xff
            val bb = px(i + 2) & 0xff
            sumR += rr; sumG += gg; sumB += bb
            sumL += 2126L * rr + 7152L * gg + 722L * bb
            i += 3
          }
          val nPx = (img.width.toLong * img.height).max(1L)
          ImageFeatures(r.media_id, img.width.toLong, img.height.toLong,
            img.width.toLong * img.height, sumR + sumG + sumB,
            sumR.toDouble / nPx, sumG.toDouble / nPx, sumB.toDouble / nPx,
            sumL / (10000.0 * nPx))
        }
      }
  }

  /** Strip each image payload (any [[decodeImage]] codec) down to its
    * DECODED pixel block — the feed
    * for content-level frame fingerprinting (`frameNearDups` over what
    * the image shows, not how the blob is framed: two encodings of the
    * same raster collide here, differing headers and all). */
  def decodedPixelPayloads(spark: SparkSession,
      media: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    media.select("media_id", "payload", "media_type", "n_bytes")
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val px = decodeImage(r.payload).pixels
          MediaRow(r.media_id, px, r.media_type, px.length.toLong)
        }
      }
  }

  /** Deterministic SMOOTH-GRADIENT PPM synthesizer — the JPEG-leg
    * fixture. Noise rasters (the [[synthesizePpm]] shape) are JPEG's
    * worst case: block-transform error can flip dHash bits whose
    * neighboring-luma margins are small. These rasters ramp luma
    * linearly (R=G=B = 16·x + 4·y, clamped) so every adjacent 9×8
    * downsample pair differs by ≥ 4 gray levels × 10000 luma units —
    * far above JPEG's few-level error — making the perceptual hash
    * provably STABLE under a default-quality JPEG round-trip (pinned
    * by tolerance booleans in the codec query, spec-measured exactly).
    * With `groupMod = Some(g)`, ids sharing `id % g` get identical
    * rasters (planted duplicate groups, same contract as
    * [[synthesizePpm]]). */
  def synthesizeGradientPpm(spark: SparkSession, df: DataFrame,
      idCol: String, groupMod: Option[Long] = None): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val base = groupMod.map(id % _).getOrElse(id)
          val w = (8 + base % 5).toInt
          val h = (6 + base % 4).toInt
          val px = new Array[Byte](w * h * 3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = math.min(255, 16 * x + 4 * y + (base % 16).toInt)
              val o = (y * w + x) * 3
              px(o) = v.toByte; px(o + 1) = v.toByte; px(o + 2) = v.toByte
              x += 1
            }
            y += 1
          }
          val payload = encodePpm(DecodedImage(w, h, 255, px))
          MediaRow(id, payload, "image/x-portable-pixmap",
            payload.length.toLong)
        }
      }
  }

  /** Deterministic PPM corpus synthesizer — the blob-loader stand-in
    * (a production pipeline reads real image blobs from a parquet
    * `binary` column or the binaryFile source; this environment ships
    * no image files). Each id gets a REAL P6 payload with id-derived
    * dimensions (so the header parse is actually exercised) and pixel
    * bytes `(base·31 + i·7 + i²%97) % 256` (aperiodic, so frame
    * signatures never collide — verified in MultimodalSpec). With
    * `groupMod = Some(g)`, ids sharing `id % g` get byte-identical
    * rasters: planted duplicate groups for content-dedup tests. */
  def synthesizePpm(spark: SparkSession, df: DataFrame, idCol: String,
      groupMod: Option[Long] = None): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val base = groupMod.map(id % _).getOrElse(id)
          val w = (8 + base % 5).toInt
          val h = (6 + base % 4).toInt
          val px = new Array[Byte](w * h * 3)
          var i = 0
          while (i < px.length) {
            px(i) = ((base * 31 + i * 7 + (i.toLong * i) % 97) % 256).toByte
            i += 1
          }
          val payload = encodePpm(DecodedImage(w, h, 255, px))
          MediaRow(id, payload, "image/x-portable-pixmap",
            payload.length.toLong)
        }
      }
  }
}
