package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val media = Multimodal.asMediaTable(
    Seq((1L, "a" * 600), (2L, "xy")).toDF("doc_id", "text"), "doc_id", "text")

  test("asMediaTable carries byte length and opaque payload") {
    val r = media.filter(col("media_id") === 1).head()
    assert(r.getAs[Long]("n_bytes") === 600L)
    assert(r.getAs[Array[Byte]]("payload").length === 600)
  }

  test("chunkFrames: ceil(n/chunk) chunks with correct offsets") {
    val chunks = Multimodal.chunkFrames(media, 256)
      .select("media_id", "chunk_idx", "chunk_offset", "n_chunks")
      .as[(Long, Int, Long, Long)].collect()
    val doc1 = chunks.filter(_._1 == 1L).sortBy(_._2)
    assert(doc1.map(c => (c._2, c._3)).toSeq ===
      Seq((0, 0L), (1, 256L), (2, 512L)))
    assert(doc1.head._4 === 3L)
    assert(chunks.filter(_._1 == 2L).map(c => (c._2, c._3)).toSeq ===
      Seq((0, 0L)))
  }

  test("sampleFrames keeps every n-th chunk") {
    val kept = Multimodal.sampleFrames(media, 100, 2)
      .filter(col("media_id") === 1)
      .select("chunk_idx").as[Int].collect().sorted
    assert(kept.toSeq === Seq(0, 2, 4)) // 600 bytes -> chunks 0..5
  }

  test("decodePpm: parses the header (whitespace + comments) to the " +
      "exact pixel offset, and rejects malformed payloads") {
    val px = Array.tabulate[Byte](2 * 2 * 3)(i => (i * 10).toByte)
    val plain = Multimodal.encodePpm(Multimodal.DecodedImage(2, 2, 255, px))
    val d = Multimodal.decodePpm(plain)
    assert(d.width === 2 && d.height === 2 && d.maxval === 255)
    assert(d.pixels.toSeq === px.toSeq)
    // a gnarlier-but-legal header: comments and mixed whitespace
    val hairy = ("P6 # comment after magic\n# full-line comment\n 2\t2 # dims\n255\n")
      .getBytes("US-ASCII") ++ px
    assert(Multimodal.decodePpm(hairy).pixels.toSeq === px.toSeq)
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm("P5\n2 2\n255\n".getBytes("US-ASCII") ++ px)
    }
    intercept[IllegalArgumentException] { // truncated pixel block
      Multimodal.decodePpm(plain.dropRight(1))
    }
    intercept[IllegalArgumentException] { // 16-bit samples unsupported
      Multimodal.decodePpm("P6\n1 1\n65535\n".getBytes("US-ASCII") ++
        Array.fill[Byte](6)(0))
    }
  }

  test("resizeNearest: hand-computed 4x2 -> 2x1 decimation") {
    // source row-major RGB, pixel (x,y) has r = 100 + 10y + x
    val px = new Array[Byte](4 * 2 * 3)
    for (y <- 0 until 2; x <- 0 until 4) {
      val i = (y * 4 + x) * 3
      px(i) = (100 + 10 * y + x).toByte; px(i + 1) = 7; px(i + 2) = 9
    }
    val out = Multimodal.resizeNearest(
      Multimodal.DecodedImage(4, 2, 255, px), 2, 1)
    // out (0,0) <- src (0,0); out (1,0) <- src (2,0)
    assert(out.pixels.toSeq ===
      Seq[Byte](100, 7, 9, 102, 7, 9))
  }

  test("resizePpm round trip: decode -> resample -> re-encode -> " +
      "decode yields the sampled pixels") {
    val src = Multimodal.synthesizePpm(spark,
      Seq(3L, 7L).toDF("id"), "id").toDF
    val resized = Multimodal.resizePpm(spark, src, 5, 4)
      .collect().map(m => m.media_id -> m).toMap
    val srcImgs = src.as[Multimodal.MediaRow].collect()
      .map(m => m.media_id -> Multimodal.decodePpm(m.payload)).toMap
    for (id <- Seq(3L, 7L)) {
      val out = Multimodal.decodePpm(resized(id).payload)
      assert(out.width === 5 && out.height === 4)
      val in = srcImgs(id)
      for (y <- 0 until 4; x <- 0 until 5; c <- 0 until 3) {
        val sx = x * in.width / 5; val sy = y * in.height / 4
        assert(out.pixels((y * 5 + x) * 3 + c) ===
          in.pixels((sy * in.width + sx) * 3 + c))
      }
    }
  }

  test("synthesizePpm frame signatures never collide: distinct within " +
      "each raster and across bases (the media_near_dups_px oracle's " +
      "combinatorial premise)") {
    val media = Multimodal.synthesizePpm(spark,
      spark.range(25).toDF("id"), "id").toDF
    val frames = Multimodal.sampleFrames(
        Multimodal.decodedPixelPayloads(spark, media).toDF, 64, 2)
      .select("media_id", "chunk_sig").as[(Long, String)].collect()
    // every sampled frame signature is globally unique across all 25
    // bases => no within-image repeats AND no cross-base collisions
    assert(frames.map(_._2).distinct.length === frames.length)
  }

  test("frameNearDups: shared frames pair media; boilerplate frames " +
      "excluded by the guard") {
    // 4-byte frames, every frame sampled. A/B identical (overlap 1);
    // C shares A's first half; D unique; every payload opens with the
    // same 4-byte "intro" to exercise the boilerplate guard
    val intro = "LOGO"
    val docs = Seq(
      (1L, intro + "aaaabbbbccccdddd"),
      (2L, intro + "aaaabbbbccccdddd"),
      (3L, intro + "aaaabbbbxxxxyyyy"),
      (4L, intro + "qqqqrrrrssssuuuu")).toDF("doc_id", "text")
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    val out = Multimodal.frameNearDups(media, chunkBytes = 4,
        everyN = 1, minShared = 1L, maxMediaPerFrame = 3L)
      .select("a_id", "b_id", "n_shared", "overlap_frac")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // the intro frame is shared by ALL FOUR media > guard 3 — it
    // pairs nothing (D appears in no pair at all)
    assert(!out.keySet.exists(p => p._1 == 4L || p._2 == 4L))
    // A-B: 4 non-intro frames shared of 4 eligible each → overlap 1
    assert(out((1L, 2L)) === ((4L, 1.0)))
    // A-C and B-C: the 2-frame shared prefix of 4 eligible
    assert(out((1L, 3L)) === ((2L, 0.5)))
    assert(out((2L, 3L)) === ((2L, 0.5)))
    assert(out.size === 3)
  }

  test("media dedup composes end-to-end: frame pairs -> connected " +
      "clusters -> one canonical per duplicate group") {
    import graft.operators.Dedup
    // A≡B≡C share all frames (one cluster); D unique
    val docs = Seq(
      (1L, "aaaabbbbccccdddd"), (2L, "aaaabbbbccccdddd"),
      (3L, "aaaabbbbccccdddd"), (4L, "qqqqrrrrssssuuuu"))
      .toDF("doc_id", "text")
    val pairs = Multimodal.frameNearDups(
        Multimodal.asMediaTable(docs, "doc_id", "text"),
        chunkBytes = 4, everyN = 1, minShared = 4L)
      .select(col("a_id"), col("b_id"))
    val clusters = Dedup.duplicateClusters(pairs)
    val byMember = clusters.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster_id"))
      .toMap
    // the triplet forms ONE cluster rooted at its minimum id; the
    // unique media never enters the pair graph
    assert(byMember === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("decodeImageFeatures: channel means + luma over decoded pixels " +
      "match a hand-computed raster") {
    // 1x2 image: pixel0 = (10, 20, 30), pixel1 = (50, 60, 70)
    val px = Array[Byte](10, 20, 30, 50, 60, 70)
    val payload = Multimodal.encodePpm(Multimodal.DecodedImage(1, 2, 255, px))
    val mediaDf = Seq((9L, payload, "image/x-portable-pixmap", payload.length.toLong))
      .toDF("media_id", "payload", "media_type", "n_bytes")
    val f = Multimodal.decodeImageFeatures(spark, mediaDf).collect().head
    assert(f.width === 1L && f.height === 2L && f.n_px === 2L)
    assert(f.px_sum === (10 + 20 + 30 + 50 + 60 + 70).toLong)
    assert(f.mean_r === 30.0 && f.mean_g === 40.0 && f.mean_b === 50.0)
    val luma = (2126L * (10 + 50) + 7152L * (20 + 60) + 722L * (30 + 70)) /
      (10000.0 * 2)
    assert(f.mean_luma === luma)
  }

  test("dHash64: invariant under exact nearest-neighbor integer " +
      "upscale, and the 25 fixture bases sit far apart in Hamming " +
      "space (the media_near_dups_phash oracle's premises)") {
    val imgs = Multimodal.synthesizePpm(spark,
        spark.range(25).toDF("id"), "id").collect()
      .map(m => m.media_id -> Multimodal.decodePpm(m.payload)).toMap
    // upscale invariance: the nested-floor identity makes the 9x8
    // downsample of a 2x (and 3x) upscale bit-identical to the original
    for ((_, img) <- imgs; k <- Seq(2, 3)) {
      val up = Multimodal.resizeNearest(img, img.width * k, img.height * k)
      assert(Multimodal.dHash64(up) === Multimodal.dHash64(img))
    }
    // cross-base separation: every pair of bases > maxHamming=2 bits
    // apart, so the banded join admits no cross-group pair
    val hs = imgs.toSeq.sortBy(_._1).map(p => Multimodal.dHash64(p._2))
    val minD = (for (i <- hs.indices; j <- i + 1 until hs.length)
      yield java.lang.Long.bitCount(hs(i) ^ hs(j))).min
    assert(minD > 2, s"min cross-base hamming $minD <= 2")
  }

  test("phashNearDups: pigeonhole banding finds pairs at distance <= " +
      "maxHamming, excludes beyond, and the band mega-bucket guard " +
      "drops boilerplate hashes") {
    val hashes = Seq(
      1L -> 0L,                    // anchor
      2L -> 0L,                    // exact dup of 1 (hamming 0)
      3L -> 3L,                    // bits 0,1 -> hamming 2 from 1/2
      4L -> ((1L << 0) | (1L << 21) | (1L << 42)), // one bit per band:
      //   hamming 3 from anchor — never even a candidate (no equal band)
      5L -> 0x0f0f0f0f0f0f0f0fL   // far from everything
    ).toDF("media_id", "phash")
    val out = Multimodal.phashNearDups(hashes, maxHamming = 2)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out === Map((1L, 2L) -> 0L, (1L, 3L) -> 2L, (2L, 3L) -> 2L))
    // guard: a hash shared by more media than the cap pairs nothing
    val boiler = (1L to 5L).map(_ -> 0L).toDF("media_id", "phash")
    assert(Multimodal.phashNearDups(boiler, maxHamming = 0,
      maxBandMedia = 4L).count() === 0L)
  }

  test("phashNearDups end-to-end: planted 2x-upscaled duplicates " +
      "collide perceptually where payload md5 cannot") {
    val corpus = Multimodal.synthesizePpm(spark,
      spark.range(20).toDF("id"), "id", Some(5L)).toDF
    val media = corpus.filter(col("media_id") % 2 === 0).unionByName(
      Multimodal.upscalePpm(spark,
        corpus.filter(col("media_id") % 2 === 1), 2).toDF)
    val pairs = Multimodal.phashNearDups(
        Multimodal.perceptualHashes(spark, media), maxHamming = 2)
      .as[(Long, Long, Long)].collect()
    // groups {g, g+5, g+10, g+15}: all C(4,2)=6 pairs per group at
    // hamming 0, scale-mixed parities included; nothing cross-group
    assert(pairs.forall(_._3 == 0L))
    assert(pairs.map(p => (p._1, p._2)).toSet ===
      (for (g <- 0L until 5L; ms = Seq(g, g + 5, g + 10, g + 15);
            i <- ms.indices; j <- i + 1 until ms.length)
        yield (ms(i), ms(j))).toSet)
    // the md5-exact flavor misses every cross-parity pair
    val md5Collide = media.select(col("media_id"), md5(col("payload")).as("s"))
      .as[(Long, String)].collect().groupBy(_._2).values
      .flatMap(g => for (i <- g.indices; j <- i + 1 until g.length)
        yield (g(i)._1 min g(j)._1, g(i)._1 max g(j)._1)).toSet
    assert(md5Collide.forall { case (a, b) => (a - b) % 2 == 0 })
    assert(md5Collide.size < pairs.length)
  }

  test("decodedPixelPayloads strips framing: two different encodings " +
      "of the same raster collide on content") {
    val px = Array.tabulate[Byte](3 * 2 * 3)(i => (i * 5).toByte)
    val a = Multimodal.encodePpm(Multimodal.DecodedImage(3, 2, 255, px))
    val b = ("P6 # same raster, noisier header\n3 2\n255\n")
      .getBytes("US-ASCII") ++ px
    val mediaDf = Seq((1L, a), (2L, b)).map { case (id, p) =>
      (id, p, "image/x-portable-pixmap", p.length.toLong)
    }.toDF("media_id", "payload", "media_type", "n_bytes")
    val out = Multimodal.decodedPixelPayloads(spark, mediaDf)
      .collect().map(m => m.media_id -> m.payload.toSeq).toMap
    assert(out(1L) === out(2L) && out(1L) === px.toSeq)
  }

  test("JDK codecs: PNG encode/decode is the exact pixel identity, " +
      "decodeImage routes P6 through the in-repo parser, and garbage " +
      "payloads fail loudly") {
    val rasters = Multimodal.synthesizePpm(spark,
      spark.range(8).toDF("id"), "id").collect()
    for (m <- rasters) {
      val img = Multimodal.decodePpm(m.payload)
      // lossless round trip: pixels AND dims survive bit-for-bit
      val png = Multimodal.encodeImage(img, "png")
      val back = Multimodal.decodeImage(png)
      assert(back.width === img.width && back.height === img.height)
      assert(back.pixels.toSeq === img.pixels.toSeq)
      // P6 fast path: decodeImage == decodePpm on PPM payloads
      val viaSniff = Multimodal.decodeImage(m.payload)
      assert(viaSniff.pixels.toSeq === img.pixels.toSeq)
      // PNG is a real compression: different bytes, usually fewer
      assert(png.toSeq !== m.payload.toSeq)
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodeImage(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    }
  }

  test("transcode to PNG preserves content exactly: perceptual hash " +
      "and pixel features are invariant, payload bytes are not") {
    val orig = Multimodal.synthesizePpm(spark,
      spark.range(6).toDF("id"), "id").toDF
    val png = Multimodal.transcode(spark, orig, "png").toDF
    assert(png.select("media_type").distinct().as[String].collect()
      .toSeq === Seq("image/png"))
    val ho = Multimodal.perceptualHashes(spark, orig)
      .as[(Long, Long)].collect().toMap
    val hp = Multimodal.perceptualHashes(spark, png)
      .as[(Long, Long)].collect().toMap
    assert(ho === hp)
    val fo = Multimodal.decodeImageFeatures(spark, orig).collect()
      .map(f => f.media_id -> f).toMap
    val fp = Multimodal.decodeImageFeatures(spark, png).collect()
      .map(f => f.media_id -> f).toMap
    for (id <- fo.keys) {
      assert(fo(id) === fp(id))
    }
    // and the blobs themselves differ (it IS a re-encode)
    val po = orig.select("media_id", "payload").as[(Long, Array[Byte])]
      .collect().toMap
    val pp = png.select("media_id", "payload").as[(Long, Array[Byte])]
      .collect().toMap
    assert(po.keys.forall(id => po(id).toSeq != pp(id).toSeq))
  }

  test("JPEG transcode on the gradient fixture: dims exact, mean luma " +
      "within 1 gray level, perceptual hash within hamming 2 (the " +
      "media_codec_jpeg tolerance premises)") {
    val orig = Multimodal.synthesizeGradientPpm(spark,
      spark.range(100).toDF("id"), "id").toDF
    val jpeg = Multimodal.transcode(spark, orig, "jpg").toDF
    assert(jpeg.select("media_type").distinct().as[String].collect()
      .toSeq === Seq("image/jpeg"))
    val fo = Multimodal.decodeImageFeatures(spark, orig).collect()
      .map(f => f.media_id -> f).toMap
    val fj = Multimodal.decodeImageFeatures(spark, jpeg).collect()
      .map(f => f.media_id -> f).toMap
    val ho = Multimodal.perceptualHashes(spark, orig)
      .as[(Long, Long)].collect().toMap
    val hj = Multimodal.perceptualHashes(spark, jpeg)
      .as[(Long, Long)].collect().toMap
    var maxHam = 0
    var maxLuma = 0.0
    for (id <- fo.keys) {
      assert(fo(id).width === fj(id).width &&
        fo(id).height === fj(id).height)
      maxLuma = maxLuma max math.abs(fo(id).mean_luma - fj(id).mean_luma)
      maxHam = maxHam max java.lang.Long.bitCount(ho(id) ^ hj(id))
    }
    assert(maxLuma <= 1.0, s"JPEG mean-luma drift $maxLuma > 1.0")
    assert(maxHam <= 2, s"JPEG phash drift $maxHam bits > 2")
  }
}
