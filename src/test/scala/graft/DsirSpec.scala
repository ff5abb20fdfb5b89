package graft

import graft.operators.Dsir
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64

  // target distribution: "alpha beta" prose; raw pool: mixed, with a
  // "zzz"-heavy off-target slab
  private val target = Seq(
    (1L, "alpha beta alpha beta gamma"),
    (2L, "alpha beta beta alpha"),
    (3L, "gamma alpha beta alpha")).toDF("doc_id", "text")
  private val raw = Seq(
    (10L, "alpha beta alpha beta"),
    (11L, "alpha beta gamma alpha"),
    (12L, "zzz yyy zzz yyy zzz"),
    (13L, "zzz zzz yyy xxx"),
    (14L, "alpha zzz beta yyy")).toDF("doc_id", "text")

  test("bucketCol is deterministic and lands in [0, buckets)") {
    val bs = raw.select(Dsir.bucketCol(col("text"), B).as("b"))
      .as[Long].collect()
    assert(bs.forall(b => b >= 0 && b < B))
    val again = raw.select(Dsir.bucketCol(col("text"), B).as("b"))
      .as[Long].collect()
    assert(bs.toSeq === again.toSeq)
  }

  test("dsirCounts: exact feature counts, full-outer bucket union") {
    val counts = Dsir.dsirCounts(target, raw, "text", B)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // total features = unigrams + bigrams = Σ (2·n_tok − 1)
    val tTotal = counts.map(_._2).sum
    val rTotal = counts.map(_._3).sum
    assert(tTotal === (9 + 7 + 7))  // 5,4,4 tokens
    assert(rTotal === (7 + 7 + 9 + 7 + 7))
    // target-only buckets exist with n_raw = 0 and vice versa
    assert(counts.forall { case (b, t, r) => b >= 0 && b < B && t + r > 0 })
    assert(counts.exists(c => c._2 === 0L && c._3 > 0L))
  }

  test("dsirModel: target-favored features get higher λ than " +
      "off-target ones; OOV constant matches the add-1 algebra") {
    val model = Dsir.dsirModel(target, raw, "text", B)
    val counts = Dsir.dsirCounts(target, raw, "text", B)
    val tTot = counts.agg(sum("n_target")).head().getLong(0)
    val rTot = counts.agg(sum("n_raw")).head().getLong(0)
    val lamOf = (feat: String) => {
      val b = raw.sparkSession.range(1)
        .select(Dsir.bucketCol(lit(feat), B)).head().getLong(0)
      model.filter(col("__dbucket") === b).head().getAs[Double]("__lam")
    }
    assert(lamOf("alpha") > 0.0)        // common in target, diluted in raw
    assert(lamOf("zzz") < 0.0)          // raw-only
    assert(lamOf("alpha") > lamOf("zzz"))
    val oov = model.select("__lam_oov").head().getDouble(0)
    assert(oov === math.log((rTot + B).toDouble) -
      math.log((tTot + B).toDouble))
  }

  test("scoring separates on-target from off-target docs; zero-token " +
      "docs drop; algebraic and portable flavors agree to 1e-9") {
    val model = Dsir.dsirModel(target, raw, "text", B)
    val probes = Seq(
      (100L, "alpha beta alpha beta alpha beta"),
      (101L, "zzz yyy zzz yyy zzz yyy"),
      (102L, "")).toDF("doc_id", "text")
    val scored = Dsir.dsirScorePortable(probes, model, "doc_id", "text", B)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("log_w")).toMap
    assert(scored.keySet === Set(100L, 101L)) // empty doc emits nothing
    assert(scored(100L) > scored(101L))
    assert(scored(100L) > 0.0 && scored(101L) < 0.0)
    val alg = Dsir.dsirScore(probes, model, "doc_id", "text", B)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("__lw")).toMap
    val port = Dsir.dsirScorePortable(probes, model, "doc_id", "text", B)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("__lw")).toMap
    port.foreach { case (id, v) => assert(math.abs(alg(id) - v) < 1e-9) }
  }

  test("scoring an unseen feature uses the OOV ratio (left-join miss)") {
    val model = Dsir.dsirModel(target, raw, "text", B)
    val oov = model.select("__lam_oov").head().getDouble(0)
    // one single-token doc whose unigram (and no bigram) is novel —
    // chance of a bucket collision with the 10-feature fit corpus is
    // real at B=64, so pick a token whose bucket is provably absent
    val used = Dsir.dsirCounts(target, raw, "text", B)
      .select("bucket").as[Long].collect().toSet
    // letters-only so the bpeish tokenizer keeps it ONE token
    val novel = (0 until 676).map(i =>
      s"q${('a' + i % 26).toChar}${('a' + i / 26).toChar}").find { tok =>
      val b = spark.range(1).select(Dsir.bucketCol(lit(tok), B))
        .head().getLong(0)
      !used.contains(b)
    }.get
    val one = Seq((200L, novel)).toDF("doc_id", "text")
    val r = Dsir.dsirScorePortable(one, model, "doc_id", "text", B)
      .head()
    assert(r.getAs[Long]("n_features") === 1L)
    assert(r.getAs[Double]("__lw") === oov)
  }

  test("dsirResample: k without replacement, deterministic, rank " +
      "ordered by key, and a planted heavy doc always sampled") {
    val model = Dsir.dsirModel(target, raw, "text", B)
    // 30 off-target docs + 1 overwhelmingly on-target doc
    val pool = ((0 until 30).map(i =>
      (i.toLong, "zzz yyy " * 3 + s"xx$i")) :+
      (999L, "alpha beta " * 20)).toDF("doc_id", "text")
    val sample = Dsir.dsirResample(pool, model, "doc_id", "text", B,
      k = 8).collect()
    assert(sample.length === 8)
    assert(sample.map(_.getLong(0)).distinct.length === 8)
    assert(sample.exists(_.getLong(0) === 999L))
    val byRank = sample.sortBy(_.getAs[Long]("rank"))
    assert(byRank.map(_.getAs[Long]("rank")).toSeq === (1L to 8L))
    val keys = byRank.map(_.getAs[Double]("sample_key"))
    assert(keys.zip(keys.tail).forall { case (a, b) => a >= b })
    // deterministic under repartitioning
    val again = Dsir.dsirResample(pool.repartition(7), model, "doc_id",
      "text", B, k = 8).collect().map(_.getLong(0)).toSet
    assert(again === sample.map(_.getLong(0)).toSet)
    // salt changes the draw (different Gumbel noise), weights persist
    val other = Dsir.dsirResample(pool, model, "doc_id", "text", B,
      k = 8, salt = "|other").collect().map(_.getLong(0)).toSet
    assert(other.contains(999L))
  }
}
