package graft

import graft.functions.VectorFns
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1f, 0f, 0f, 0f), "a"),
    (1L, Array(0.9f, 0.1f, 0f, 0f), "a"),
    (2L, Array(0f, 1f, 0f, 0f), "a"),
    (3L, Array(0f, 0f, 1f, 0f), "b"),
    (4L, Array(0f, 0f, 0.95f, 0.05f), "b")
  ).toDF("vec_id", "embedding", "label")

  test("VectorFns: dot / norm / cosine match hand math") {
    val df = Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
    val (d, c) = df.select(
      VectorFns.dot(col("a"), col("b")),
      VectorFns.cosine(col("a"), col("b"))).as[(Double, Double)].head()
    assert(d === 32.0)
    assert(math.abs(c - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-12)
  }

  test("bruteForceTopK ranks the nearest neighbor first") {
    val out = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0), 2)
      .select("rank", "n_id").as[(Long, Long)].collect().toMap
    assert(out(1L) === 1L) // closest to e1 is the 0.9/0.1 vector
    assert(out.size === 2)
  }

  test("nearestInBlock only pairs within the blocking key") {
    val out = Similarity.nearestInBlock(vecs, "vec_id", "embedding", "label")
      .select("vec_id", "nn_id").as[(Long, Long)].collect().toMap
    assert(out(0L) === 1L && out(1L) === 0L)
    assert(out(3L) === 4L && out(4L) === 3L)
    assert(out(2L) === 0L || out(2L) === 1L) // same block 'a' only
  }

  test("annTopK finds identical vectors (same bucket by construction)") {
    val dup = Seq(
      (10L, Array(1f, 1f, 0f, 0f), "x"),
      (11L, Array(1f, 1f, 0f, 0f), "x")).toDF("vec_id", "embedding", "label")
    val corpus = vecs.unionByName(dup)
    val out = Similarity.annTopK(corpus, dup.filter(col("vec_id") === 10), 3,
      dims = 4, planes = 2)
      .select("rank", "n_id", "cosine_sim").as[(Long, Long, Double)].collect()
    assert(out.head._2 === 11L && out.head._3 === 1.0)
  }

  test("srpBucket is deterministic and splits opposite vectors") {
    val df = Seq((Array(1f, 0f, 0f, 0f), Array(-1f, 0f, 0f, 0f)))
      .toDF("a", "b")
    val (ba, bb) = df.select(
      Similarity.srpBucket(col("a"), 4, 8),
      Similarity.srpBucket(col("b"), 4, 8)).as[(String, String)].head()
    assert(ba.length === 8 && bb.length === 8)
    assert(ba !== bb) // antipodal vectors differ on every non-boundary plane
  }
}
