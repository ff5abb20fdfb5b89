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

  test("resizeStub clamps payload and updates n_bytes") {
    val r = Multimodal.resizeStub(spark, media, 256)
      .collect().map(m => m.media_id -> m).toMap
    assert(r(1L).payload.length === 256 && r(1L).n_bytes === 256L)
    assert(r(2L).payload.length === 2) // under limit: untouched
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

  test("decodeFeaturesStub: deterministic mean over payload bytes") {
    val f = Multimodal.decodeFeaturesStub(spark, media)
      .collect().map(r => r.media_id -> r).toMap
    assert(f(1L).mean_byte === 'a'.toDouble) // uniform payload
    assert(f(1L).byte_entropy_bucket === ('a'.toInt / 32))
    assert(f(2L).n_bytes === 2L)
  }
}
