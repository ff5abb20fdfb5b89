package graft

import graft.operators.Unigram
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  // --- viterbi (the shared segmentation core) ---

  test("viterbi: maximum-likelihood path beats greedy, hand-scored") {
    val lp = Map("ab" -> -1.0, "a" -> -2.0, "b" -> -2.0, "c" -> -3.0,
      "bc" -> -1.5)
    // [ab, c] = -4.0 beats [a, bc] = -3.5? no: -3.5 > -4.0 -> [a, bc]
    assert(Unigram.viterbi("abc", lp, 2) == Seq("a", "bc"))
    // without bc, [ab, c] = -4 beats [a, b, c] = -7
    assert(Unigram.viterbi("abc", lp - "bc", 2) == Seq("ab", "c"))
  }

  test("viterbi: exact tie keeps the longer piece; unknown chars " +
      "fall back; empty word segments empty") {
    val lp = Map("aa" -> -4.0, "a" -> -2.0, "b" -> -1.0)
    // [aa] = -4 exactly ties [a, a] = -4 -> longer piece wins
    assert(Unigram.viterbi("aa", lp, 2) == Seq("aa"))
    // x is unknown: segments as a singleton at UnkLogp
    assert(Unigram.viterbi("axb", lp, 2) == Seq("a", "x", "b"))
    assert(Unigram.viterbi("", lp, 2).isEmpty)
    // a multi-char piece absent from the table can never be chosen
    assert(Unigram.viterbi("bb", Map("b" -> -1.0), 3) == Seq("b", "b"))
  }

  // --- seed counts ---

  test("seedCounts: every substring up to the cap, weighted by word " +
      "frequency") {
    val words = Seq(("ab", 3L), ("b", 2L)).toDF("word", "freq")
    val out = Unigram.seedCounts(words, maxPieceLen = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out == Map("a" -> 3L, "b" -> 5L, "ab" -> 3L))
    val capped = Unigram.seedCounts(words, maxPieceLen = 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(capped == Map("a" -> 3L, "b" -> 5L))
  }

  // --- fit + tokenize ---

  private val corpus = Seq(
    (1L, "low low low lower lower newest"),
    (2L, "low lower newest newest widest"),
    (3L, "low newest widest widest")).toDF("doc_id", "text")

  test("pieces parquet round-trip: persist -> reload -> tokenize is " +
      "bit-equal to fit -> tokenize") {
    val pieces = Unigram.fitUnigram(corpus, "text", vocabSize = 30,
      maxPieceLen = 4, rounds = 2, seedSize = 60)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_uni_pieces").toString
    Unigram.piecesToDf(spark, pieces).write.mode("overwrite")
      .parquet(dir)
    val back = Unigram.piecesFromDf(spark.read.parquet(dir))
    assert(back === pieces)
    val a = Unigram.tokenize(corpus, "doc_id", "text", pieces, 4)
      .select("doc_id", "pieces_sig").collect().map(r =>
        (r.getLong(0), r.getString(1))).toSet
    val b = Unigram.tokenize(corpus, "doc_id", "text", back, 4)
      .select("doc_id", "pieces_sig").collect().map(r =>
        (r.getLong(0), r.getString(1))).toSet
    assert(a === b)
  }

  test("fitUnigram: deterministic, single-char coverage, frequent " +
      "substrings survive pruning") {
    val a = Unigram.fitUnigram(corpus, "text", vocabSize = 30,
      maxPieceLen = 4, rounds = 3, seedSize = 60)
    val b = Unigram.fitUnigram(corpus.repartition(7), "text",
      vocabSize = 30, maxPieceLen = 4, rounds = 3, seedSize = 60)
    assert(a == b) // bit-identical across partitionings
    val pieces = a.map(_.piece).toSet
    val chars = "lowernstid".toSet.map((c: Char) => c.toString)
    assert(chars.subsetOf(pieces)) // coverage: every corpus char
    // the dominant stem survives as a piece
    assert(pieces.exists(p => p.length >= 3 && "low".startsWith(p.take(3))
      || pieces.contains("low")))
    assert(a.map(_.logp).forall(l => l < 0 && !l.isNaN))
  }

  test("tokenize: lossless per word (pieces concatenate back), " +
      "unknown chars segment as singletons, sig consistent") {
    val pieces = Unigram.fitUnigram(corpus, "text", vocabSize = 30,
      maxPieceLen = 4, rounds = 3, seedSize = 60)
    val out = Unigram.tokenize(corpus, "doc_id", "text", pieces, 4)
      .collect().map(r => (r.getLong(0), r.getSeq[String](1),
        r.getLong(2), r.getString(3))).toList
    assert(out.nonEmpty)
    out.foreach { case (id, ps, n, sig) =>
      assert(n == ps.size.toLong)
      // lossless: concatenating pieces rebuilds the normalized text
      // with spaces removed
      val doc = corpus.filter(col("doc_id") === id)
        .select(col("text")).head().getString(0)
      assert(ps.mkString("") == doc.toLowerCase.trim
        .replaceAll("\\s+", ""))
      assert(sig.length == 32)
    }
    // unknown characters at tokenize time: 'z' never seen
    val arrivals = Seq((9L, "lowz")).toDF("doc_id", "text")
    val zs = Unigram.tokenize(arrivals, "doc_id", "text", pieces, 4)
      .head().getSeq[String](1)
    assert(zs.contains("z") && zs.mkString("") == "lowz")
  }

  test("encodeIds: alphabetical stable ids, corpus-fit vocab has zero " +
      "oov, unknown chars encode -1 and count") {
    val pieces = Unigram.fitUnigram(corpus, "text", vocabSize = 30,
      maxPieceLen = 4, rounds = 3, seedSize = 60)
    val vocab = Unigram.vocabulary(pieces)
    assert(vocab.toSeq.sortBy(_._2).map(_._1) == vocab.keys.toSeq.sorted)
    val onCorpus = Unigram.encodeIds(corpus, "doc_id", "text", pieces, 4)
      .collect()
    assert(onCorpus.forall(_.getLong(3) == 0L)) // fit-on-self: no oov
    onCorpus.foreach(r =>
      assert(r.getSeq[Int](1).size.toLong == r.getLong(2)))
    val z = Unigram.encodeIds(Seq((9L, "lowz")).toDF("doc_id", "text"),
      "doc_id", "text", pieces, 4).head()
    assert(z.getLong(3) == 1L)
    assert(z.getSeq[Int](1).contains(-1))
  }
}
