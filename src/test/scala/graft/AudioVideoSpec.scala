package graft

import graft.operators.{Audio, Video, Multimodal}
import org.apache.spark.sql.functions._

class AudioVideoSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int) =
    (0L until n.toLong).toDF("doc_id")

  // ------------------------------------------------------------------
  // WAV codec
  // ------------------------------------------------------------------

  test("encodeWav/decodeWav round-trips rate, channels, samples") {
    val s = Array[Short](0, 100, -100, 32767, -32768, 7)
    val a = Audio.decodeWav(Audio.encodeWav(8000, 1, s))
    assert(a.sampleRate === 8000)
    assert(a.channels === 1)
    assert(a.samples.toSeq === s.toSeq)
    val st = Audio.decodeWav(Audio.encodeWav(44100, 2, s))
    assert(st.channels === 2)
    assert(st.samples.toSeq === s.toSeq)
  }

  test("decodeWav walks unknown chunks (LIST before data) by size") {
    val s = Array[Short](5, -5, 9)
    val wav = Audio.encodeWav(8000, 1, s)
    // splice a LIST chunk between fmt and data: bytes 0..35 are
    // RIFF header + fmt; 36.. is the data chunk
    val list = Array[Byte]('L', 'I', 'S', 'T', 4, 0, 0, 0, 'I', 'N', 'F',
      'O')
    val spliced = wav.take(36) ++ list ++ wav.drop(36)
    // fix the RIFF size field (bytes 4..7, little-endian)
    val total = spliced.length - 8
    spliced(4) = (total & 0xff).toByte
    spliced(5) = ((total >> 8) & 0xff).toByte
    spliced(6) = ((total >> 16) & 0xff).toByte
    spliced(7) = ((total >> 24) & 0xff).toByte
    val a = Audio.decodeWav(spliced)
    assert(a.samples.toSeq === s.toSeq)
  }

  test("decodeWav fails loudly on corrupt payloads") {
    val good = Audio.encodeWav(8000, 1, Array[Short](1, 2, 3))
    def expectFail(b: Array[Byte], hint: String): Unit = {
      val e = intercept[IllegalArgumentException](Audio.decodeWav(b))
      assert(e.getMessage.contains("decodeWav"), s"$hint: ${e.getMessage}")
    }
    expectFail(Array[Byte](1, 2, 3), "too short")
    expectFail("JUNK".getBytes ++ good.drop(4), "bad magic")
    expectFail(good.take(good.length - 1), "truncated data")
    val nonPcm = good.clone; nonPcm(20) = 3 // format tag 3 = float
    expectFail(nonPcm, "non-PCM")
    val eightBit = good.clone; eightBit(34) = 8
    expectFail(eightBit, "8-bit")
  }

  // ------------------------------------------------------------------
  // Audio kernels
  // ------------------------------------------------------------------

  test("audioFeatures: hand-checkable reductions on a tiny clip") {
    val s = Array[Short](0, 100, -50, 0, 3)
    val media = Seq((1L, Audio.encodeWav(1000, 1, s), "audio/wav",
      0L)).toDF("media_id", "payload", "media_type", "n_bytes")
    val f = Audio.audioFeatures(spark, media).collect().head
    assert(f.n_samples === 5L)
    assert(f.sample_rate === 1000L)
    assert(f.duration_ms === 5L)     // 5 * 1000 / 1000
    assert(f.peak === 100L)
    // adjacent sign flips only: (100,-50) flips; zeros break runs
    assert(f.n_zero_cross === 1L)
    assert(f.sum_abs === 153L)
    assert(f.sum_sq === (100L * 100 + 50L * 50 + 3L * 3))
    assert(f.mean_abs === 153.0 / 5)
    assert(f.rms === math.sqrt(12509.0 / 5))
  }

  test("audioFeatures folds interleaved stereo; duration uses frames") {
    // 2 channels x 3 frames at 3 Hz -> exactly 1000 ms
    val s = Array[Short](10, -10, 20, -20, 30, -30)
    val media = Seq((1L, Audio.encodeWav(3, 2, s), "audio/wav", 0L))
      .toDF("media_id", "payload", "media_type", "n_bytes")
    val f = Audio.audioFeatures(spark, media).collect().head
    assert(f.n_samples === 6L)
    assert(f.duration_ms === 1000L)
    assert(f.sum_abs === 120L)
  }

  test("silenceSegments finds maximal quiet runs with ordinals") {
    val s = Array[Short](0, 0, 0, 50, 1, 2, 3, 4, 60)
    val media = Seq((1L, Audio.encodeWav(8000, 1, s), "audio/wav", 0L))
      .toDF("media_id", "payload", "media_type", "n_bytes")
    val segs = Audio.silenceSegments(spark, media, threshold = 10,
      minRun = 3).collect().sortBy(_.seg_idx)
    assert(segs.map(g => (g.seg_idx, g.start_idx, g.n)).toSeq ===
      Seq((0L, 0L, 3L), (1L, 4L, 4L)))
    // runs shorter than minRun are dropped (and ordinals re-densify)
    val only = Audio.silenceSegments(spark, media, threshold = 10,
      minRun = 4).collect()
    assert(only.map(g => (g.seg_idx, g.start_idx, g.n)).toSeq ===
      Seq((0L, 4L, 4L)))
    assert(Audio.silenceSegments(spark, media, threshold = 10,
      minRun = 5).collect().isEmpty)
  }

  test("resampleWav decimates and halves metadata consistently") {
    val s = Array.tabulate[Short](10)(i => (i * 100).toShort)
    val media = Seq((1L, Audio.encodeWav(8000, 1, s), "audio/wav", 0L))
      .toDF("media_id", "payload", "media_type", "n_bytes")
    val out = Audio.resampleWav(spark, media, 4).collect().head
    val a = Audio.decodeWav(out.payload)
    assert(a.sampleRate === 2000)
    assert(a.samples.toSeq === Seq[Short](0, 400, 800))
    // mono-only and divisibility guards fail loudly
    val stereo = Seq((2L, Audio.encodeWav(8000, 2, s), "audio/wav", 0L))
      .toDF("media_id", "payload", "media_type", "n_bytes")
    intercept[org.apache.spark.SparkException] {
      Audio.resampleWav(spark, stereo, 4).collect()
    }
  }

  test("synthesizeWav: groupMod plants byte-identical duplicate clips") {
    val wavs = Audio.synthesizeWav(spark, ids(6), "doc_id", Some(3L))
      .collect().sortBy(_.media_id)
    assert(wavs(0).payload.toSeq === wavs(3).payload.toSeq)
    assert(wavs(1).payload.toSeq === wavs(4).payload.toSeq)
    assert(wavs(0).payload.toSeq !== wavs(1).payload.toSeq)
  }

  test("audio pipeline stays exchange-free (per-row kernels)") {
    val plan = Audio.audioFeatures(spark,
      Audio.synthesizeWav(spark, ids(8), "doc_id").toDF)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(600))
  }

  // ------------------------------------------------------------------
  // GVID codec
  // ------------------------------------------------------------------

  test("encodeGvid/decodeGvid round-trips dims and frame blocks") {
    val f0 = Array.tabulate[Byte](2 * 2 * 3)(i => i.toByte)
    val f1 = Array.tabulate[Byte](2 * 2 * 3)(i => (100 + i).toByte)
    val v = Video.decodeGvid(Video.encodeGvid(
      Video.DecodedVideo(2, 2, Array(f0, f1))))
    assert(v.width === 2 && v.height === 2)
    assert(v.frames.length === 2)
    assert(v.frames(0).toSeq === f0.toSeq)
    assert(v.frames(1).toSeq === f1.toSeq)
  }

  test("decodeGvid fails loudly on corrupt payloads") {
    val good = Video.encodeGvid(Video.DecodedVideo(2, 2,
      Array(new Array[Byte](12))))
    def expectFail(b: Array[Byte], hint: String): Unit = {
      val e = intercept[IllegalArgumentException](Video.decodeGvid(b))
      assert(e.getMessage.contains("decodeGvid"), s"$hint: ${e.getMessage}")
    }
    expectFail("XXXX".getBytes ++ good.drop(4), "bad magic")
    expectFail(good.take(good.length - 1), "truncated frames")
    expectFail(good ++ Array[Byte](0), "trailing bytes")
  }

  // ------------------------------------------------------------------
  // Video kernels: the planted scene structure is recovered EXACTLY.
  // ------------------------------------------------------------------

  test("videoFrameFeatures: hand-checkable sums on a 1x1 clip") {
    val f0 = Array[Byte](10, 20, 30)
    val f1 = Array[Byte](40, 50, 60)
    val payload = Video.encodeGvid(Video.DecodedVideo(1, 1, Array(f0, f1)))
    val media = Seq((1L, payload, "video/x-gvid", 0L))
      .toDF("media_id", "payload", "media_type", "n_bytes")
    val rows = Video.videoFrameFeatures(spark, media).collect()
      .sortBy(_.frame_idx)
    assert(rows.map(_.px_sum).toSeq === Seq(60L, 150L))
    assert(rows(0).mean_luma ===
      (2126L * 10 + 7152L * 20 + 722L * 30) / 10000.0)
  }

  test("sceneChanges/keyframes recover the planted shot structure " +
      "exactly across the synthesized corpus") {
    val media = Video.synthesizeGvid(spark, ids(60), "doc_id").toDF
    val cuts = Video.sceneChanges(spark, media, meanDiffThr = 8)
      .collect()
    assert(cuts.nonEmpty)
    cuts.foreach { c =>
      val (_, _, _, sl) = Video.synthDims(c.media_id)
      assert(c.is_cut === (c.frame_idx % sl == 0),
        s"clip ${c.media_id} frame ${c.frame_idx}")
      // in-scene frames differ by exactly +1 per channel
      if (!c.is_cut) assert(c.diff_sum === c.n_ch)
      else assert(c.diff_sum >= 51L * c.n_ch)
    }
    val keys = Video.keyframes(spark, media, meanDiffThr = 8).collect()
    keys.foreach { k =>
      val (_, _, _, sl) = Video.synthDims(k.media_id)
      assert(k.frame_idx % sl === 0)
      assert(k.scene_idx === k.frame_idx / sl)
    }
    // every planted scene start is found: count matches ground truth
    val expected = (0L until 60L).map { id =>
      val (_, _, nf, sl) = Video.synthDims(id)
      (nf + sl - 1) / sl
    }.sum
    assert(keys.length.toLong === expected)
  }

  test("keyframe px_sum matches the frame-features row for that frame") {
    val media = Video.synthesizeGvid(spark, ids(12), "doc_id").toDF
    val feats = Video.videoFrameFeatures(spark, media).collect()
      .map(f => (f.media_id, f.frame_idx) -> f.px_sum).toMap
    Video.keyframes(spark, media, meanDiffThr = 8).collect().foreach { k =>
      assert(k.px_sum === feats((k.media_id, k.frame_idx)))
    }
  }

  test("synthesizeGvid: groupMod plants byte-identical duplicate clips") {
    val vids = Video.synthesizeGvid(spark, ids(4), "doc_id", Some(2L))
      .collect().sortBy(_.media_id)
    assert(vids(0).payload.toSeq === vids(2).payload.toSeq)
    assert(vids(0).payload.toSeq !== vids(1).payload.toSeq)
  }

  test("video pipeline stays exchange-free (per-row kernels)") {
    val plan = Video.sceneChanges(spark,
      Video.synthesizeGvid(spark, ids(8), "doc_id").toDF, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(600))
  }

  test("withInfoChunk rewrites the container without touching content: " +
      "payload_sig changes, content_sig doesn't, and contentNearDups " +
      "pairs the tagged copy with its original as same_bytes=false") {
    val plain = Audio.synthesizeWav(spark, ids(4), "doc_id").toDF
    val tagged = Audio.withInfoChunk(spark,
      plain.filter(col("media_id") === 0), "unit-test-tag!!!").toDF
      .withColumn("media_id", lit(100L))
    val sigs = Audio.contentSignatures(spark, plain.unionByName(tagged))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2))).toMap
    assert(sigs(100L)._1 === sigs(0L)._1)   // content preserved
    assert(sigs(100L)._2 !== sigs(0L)._2)   // bytes differ
    val pairs = Audio.contentNearDups(spark, plain.unionByName(tagged))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(pairs.toSeq === Seq((0L, 100L, false)))
  }

  test("contentSignatures keys on (rate, channels, samples): a " +
      "decimated clip never collides with its source") {
    val media = Audio.synthesizeWav(spark, ids(3), "doc_id").toDF
    val down = Audio.resampleWav(spark, media, 4).toDF
      .withColumn("media_id", col("media_id") + 100)
    val all = Audio.contentSignatures(spark, media.unionByName(down))
      .select("content_sig").as[String].collect()
    assert(all.distinct.length === all.length)
  }

  test("videoFrameNearDups: hand-built partial overlap scores " +
      "shared/min(nf), and a boilerplate frame drops before pairing") {
    def frame(seed: Int) = Array.tabulate[Byte](12)(i => (seed + i).toByte)
    def clip(id: Long, seeds: Int*) = (id, Video.encodeGvid(
      Video.DecodedVideo(2, 2, seeds.map(frame).toArray)),
      "video/x-gvid", 0L)
    // clips 1 & 2 share frames 10, 11 (2 of 4); clip 3 is disjoint
    val media = Seq(
      clip(1L, 10, 11, 12, 13), clip(2L, 10, 11, 20, 21),
      clip(3L, 30, 31, 32, 33))
      .toDF("media_id", "payload", "media_type", "n_bytes")
    val pairs = Video.videoFrameNearDups(spark, media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(pairs.toSeq === Seq((1L, 2L, 2L, 0.5)))
    // an intro frame present in EVERY clip pairs nothing once the
    // boilerplate cap trips
    val intro = Seq(clip(1L, 99, 1, 2, 3), clip(2L, 99, 4, 5, 6),
      clip(3L, 99, 7, 8, 9))
      .toDF("media_id", "payload", "media_type", "n_bytes")
    assert(Video.videoFrameNearDups(spark, intro,
      maxMediaPerFrame = 2).collect().isEmpty)
  }

  test("audio/video kernels run UNCHANGED on a live streaming frame " +
      "(stateless mapPartitions — the arrival path needs no new code) " +
      "and match the batch result exactly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val batchMedia = Audio.synthesizeWav(spark, ids(10), "doc_id").collect()
    val in = MemoryStream[Multimodal.MediaRow]
    val q = Audio.audioFeatures(spark, in.toDF())
      .writeStream.format("memory").queryName("graft_av_stream")
      .outputMode("append").start()
    in.addData(batchMedia.take(6))
    in.addData(batchMedia.drop(6))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("graft_av_stream")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("sum_abs"), r.getAs[Double]("rms"))).toMap
    val batch = Audio.audioFeatures(spark,
      Audio.synthesizeWav(spark, ids(10), "doc_id").toDF).collect()
      .map(f => f.media_id -> ((f.sum_abs, f.rms))).toMap
    assert(streamed === batch)
  }

  test("audio/video payloads interop with the generic media operators " +
      "(chunking and exact payload dedup see them as opaque binaries)") {
    val wav = Audio.synthesizeWav(spark, ids(8), "doc_id", Some(4L)).toDF
    val sigs = wav.select(col("media_id"), md5(col("payload")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sigs(0L) === sigs(4L))
    assert(sigs(1L) !== sigs(2L))
    val chunks = Multimodal.chunkFrames(wav, 256)
    assert(chunks.count() > 0)
  }
}
