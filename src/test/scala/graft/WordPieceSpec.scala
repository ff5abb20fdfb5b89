package graft

import graft.operators.WordPiece
import org.apache.spark.sql.functions._

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  // --- greedyMatch (the shared inference core) ---

  test("greedyMatch: longest-first, ## continuations, all-or-nothing " +
      "UNK, empty word segments empty") {
    val v = Set("un", "##aff", "##able", "##a", "u", "##n", "##f",
      "##l", "##e", "##b")
    assert(WordPiece.greedyMatch("unaffable", v, 2, 4) ==
      Seq("un", "##aff", "##able"))
    // longest-first: ##able beats ##a + ##b + ##l + ##e
    assert(WordPiece.greedyMatch("unable", v, 2, 4) ==
      Seq("un", "##able"))
    // no word-initial match at all -> whole word UNK, even though
    // suffixes would match
    assert(WordPiece.greedyMatch("xun", v, 2, 4) ==
      Seq(WordPiece.Unk))
    // mid-word dead end -> whole word UNK (nothing half-emitted)
    assert(WordPiece.greedyMatch("unz", v, 2, 4) ==
      Seq(WordPiece.Unk))
    assert(WordPiece.greedyMatch("", v, 2, 4).isEmpty)
  }

  test("greedyMatch: a greedy long match can dead-end even when a " +
      "shorter split exists — greedy, not optimal, by design") {
    // vocab: "ab" and "##cd" would segment "abcd"; greedy takes "abc"
    // first, then "##d" is absent -> UNK (the BERT algorithm's
    // documented behavior, NOT a Viterbi)
    val v = Set("abc", "ab", "##cd", "a", "##b")
    assert(WordPiece.greedyMatch("abcd", v, 3, 2) == Seq(WordPiece.Unk))
  }

  test("probeBounds: raw lengths, ## stripped, UNK excluded") {
    assert(WordPiece.probeBounds(
      Seq("[UNK]", "ab", "##xyz", "c", "##d")) == (2, 3))
    // no continuations at all -> floor of 1
    assert(WordPiece.probeBounds(Seq("ab", "[UNK]")) == (2, 1))
  }

  // --- fit ---

  private val corpus = Seq(
    (1L, "low low low lower lower newest"),
    (2L, "low lower newest newest widest"),
    (3L, "low newest widest widest")).toDF("doc_id", "text")

  test("fitWordPiece: hand-scored first merge on a toy corpus") {
    // words: ab x3, abc x1 -> symbols a, ##b, ##c
    // counts: a=4, ##b=4, ##c=1; pairs: (a,##b)=4, (##b,##c)=1
    // scores: (a,##b)=4/16=0.25; (##b,##c)=1/4=0.25 -> exact tie,
    // pair count desc breaks it: (a,##b) wins
    val toy = Seq((1L, "ab ab ab abc")).toDF("doc_id", "text")
    val m = WordPiece.fitWordPiece(toy, "text", numMerges = 1)
    assert(m.merges.map(x => (x.lhs, x.rhs, x.merged, x.pair_count)) ==
      Seq(("a", "##b", "ab", 4L)))
    assert(m.merges.head.score == 0.25)
    assert(m.alphabet == Seq("##b", "##c", "a"))
    assert(m.vocab.contains(WordPiece.Unk))
  }

  test("fitWordPiece: likelihood score, not raw count — a rarer pair " +
      "with rare parts outranks the most frequent pair") {
    // "xy" x2 (rare symbols, exclusive pair) vs "ab" x5 diluted by
    // standalone "a" x20 and "b" x20: count(a,##b)=5 but
    // score=5/(25*5)=0.04 < count(x,##y)=2, score=2/(2*2)=0.5
    val toy = Seq((1L,
      ("xy " * 2 + "ab " * 5 + "a " * 20 + "b " * 20).trim))
      .toDF("doc_id", "text")
    val m = WordPiece.fitWordPiece(toy, "text", numMerges = 1)
    assert(m.merges.head.merged == "xy")
  }

  test("fitWordPiece: deterministic across partitionings; batched " +
      "admission equals sequential on disjoint merges") {
    val a = WordPiece.fitWordPiece(corpus, "text", numMerges = 6)
    val b = WordPiece.fitWordPiece(corpus.repartition(7), "text",
      numMerges = 6)
    assert(a == b)
    val batched = WordPiece.fitWordPiece(corpus, "text", numMerges = 6,
      batchSize = 3)
    // batched admission may reorder ranks within a round but must
    // produce the same final vocabulary when merges are disjoint
    assert(batched.vocab.nonEmpty)
    assert(batched.alphabet == a.alphabet)
  }

  test("fitWordPiece: batched admission CAN diverge from sequential " +
      "— positive control for the documented batchSize > 1 caveat") {
    // the divergence mechanism the fitWordPiece docstring documents:
    // a merge admitted earlier in a round creates a new symbol whose
    // pairs sequential fitting scores NEXT and ranks above the
    // round's remaining disjoint candidates. Corpus: "xyz"×4 makes
    // (##y,##z) and (x,##y) tie at score 4/(4·4)=0.25 (tie → lexical
    // a asc: ##y < x admits (##y,##z) first); "pq"×3 + "pv"×3 give
    // the best DISJOINT runner-up (p,##q) = 3/(6·3) ≈ 0.167; after
    // (##y,##z)→##yz, the NEW pair (x,##yz) scores 4/(4·4)=0.25,
    // outranking it
    val toy = Seq((1L, Seq.fill(4)("xyz").mkString(" ") + " " +
      Seq.fill(3)("pq").mkString(" ") + " " +
      Seq.fill(3)("pv").mkString(" "))).toDF("doc_id", "text")
    val seqFit = WordPiece.fitWordPiece(toy, "text", numMerges = 2,
      batchSize = 1)
    val batchFit = WordPiece.fitWordPiece(toy, "text", numMerges = 2,
      batchSize = 4)
    // both rounds agree on merge #1
    assert(seqFit.merges.head.merged === "##yz")
    assert(batchFit.merges.head.merged === "##yz")
    // merge #2: sequential rescores and admits the NEW symbol's pair;
    // the batch admitted the best round-1 disjoint candidate instead
    assert(seqFit.merges(1).lhs === "x" &&
      seqFit.merges(1).rhs === "##yz" &&
      seqFit.merges(1).merged === "xyz")
    assert(batchFit.merges(1).lhs === "p" &&
      batchFit.merges(1).rhs === "##q" &&
      batchFit.merges(1).merged === "pq")
    assert(seqFit.merges.map(_.merged) !== batchFit.merges.map(_.merged))
  }

  test("fitWordPiece: exhausts gracefully when fewer pairs exist " +
      "than requested merges") {
    val toy = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val m = WordPiece.fitWordPiece(toy, "text", numMerges = 50)
    // one mergeable pair, then the whole word is one symbol -> stop
    assert(m.merges.size == 1)
  }

  // --- tokenize / ids ---

  test("tokenize: round-trip (## stripped concat == word) for every " +
      "non-UNK word; matches greedyMatch word-by-word") {
    val m = WordPiece.fitWordPiece(corpus, "text", numMerges = 8)
    val out = WordPiece.tokenize(corpus, "doc_id", "text", m.vocab)
      .orderBy("doc_id").collect()
    val texts = corpus.orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (maxInit, maxCont) = WordPiece.probeBounds(m.vocab)
    out.foreach { r =>
      val id = r.getLong(0)
      val pieces = r.getSeq[String](1)
      val words = texts(id).trim.toLowerCase.split("\\s+").toSeq
      val expect = words.flatMap(w =>
        WordPiece.greedyMatch(w, m.vocab.toSet, maxInit, maxCont))
      assert(pieces == expect, s"doc $id")
      assert(r.getLong(2) == pieces.size)
      assert(r.getLong(3) == pieces.count(_ == WordPiece.Unk))
      // fit vocab covers the training corpus alphabet -> no UNK here,
      // and every word reassembles from its pieces
      assert(r.getLong(3) == 0L)
      val rebuilt = {
        val sb = new StringBuilder
        val out = Seq.newBuilder[String]
        pieces.foreach { p =>
          if (p.startsWith(WordPiece.ContPrefix))
            sb.append(p.drop(2))
          else { if (sb.nonEmpty) { out += sb.toString; sb.clear() }
            sb.append(p) }
        }
        if (sb.nonEmpty) out += sb.toString
        out.result()
      }
      assert(rebuilt == words)
    }
  }

  test("tokenize: unknown characters UNK the whole word; known words " +
      "around it are unaffected") {
    val m = WordPiece.fitWordPiece(corpus, "text", numMerges = 4)
    val probe = Seq((9L, "low zzq# lower")).toDF("doc_id", "text")
    val r = WordPiece.tokenize(probe, "doc_id", "text", m.vocab)
      .collect().head
    val pieces = r.getSeq[String](1)
    assert(pieces.count(_ == WordPiece.Unk) == 1)
    assert(r.getLong(3) == 1L)
    assert(pieces.head != WordPiece.Unk &&
      pieces.last != WordPiece.Unk)
  }

  test("encodeIds: ids are the sorted-vocab ranks, bijective with " +
      "pieces, UNK has a real id") {
    val m = WordPiece.fitWordPiece(corpus, "text", numMerges = 6)
    val v = WordPiece.vocabulary(m.vocab)
    assert(v.keySet.contains(WordPiece.Unk))
    assert(v.values.toSeq.sorted == (0 until v.size))
    val toks = WordPiece.tokenize(corpus, "doc_id", "text", m.vocab)
      .select(col("doc_id"), col("pieces"))
    val ids = WordPiece.encodeIds(corpus, "doc_id", "text", m.vocab)
      .select(col("doc_id"), col("ids"))
    val joined = toks.join(ids, "doc_id").collect()
    joined.foreach { r =>
      val ps = r.getSeq[String](1)
      val is = r.getSeq[Int](2)
      assert(is == ps.map(v))
    }
  }

  test("vocab parquet round-trip: persist -> reload -> tokenize is " +
      "bit-equal to fit -> tokenize") {
    val m = WordPiece.fitWordPiece(corpus, "text", numMerges = 6)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_wp_vocab").toString
    WordPiece.vocabToDf(spark, m.vocab).write.mode("overwrite")
      .parquet(dir)
    val back = WordPiece.vocabFromDf(spark.read.parquet(dir))
    assert(back === m.vocab)
    val a = WordPiece.tokenize(corpus, "doc_id", "text", m.vocab)
      .select("doc_id", "pieces_sig").collect().map(r =>
        (r.getLong(0), r.getString(1))).toSet
    val b = WordPiece.tokenize(corpus, "doc_id", "text", back)
      .select("doc_id", "pieces_sig").collect().map(r =>
        (r.getLong(0), r.getString(1))).toSet
    assert(a === b)
  }

  // --- pairScores (the oracle-facing round-1 statistics) ---

  test("pairScores: hand-checked counts and scores on the toy corpus") {
    val toy = Seq((1L, "ab ab ab abc")).toDF("doc_id", "text")
    val rows = WordPiece.pairScores(toy, "text")
      .orderBy("a", "b").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(rows(("a", "##b")) == ((4L, 4L, 4L, 0.25)))
    assert(rows(("##b", "##c")) == ((1L, 4L, 1L, 0.25)))
    assert(rows.size == 2)
  }

  test("pairScores: round-1 argmax (score, cnt, a, b order) equals " +
      "fitWordPiece's first merge") {
    val top = WordPiece.pairScores(corpus, "text")
      .orderBy(col("score").desc, col("n_pair").desc, col("a"),
        col("b"))
      .limit(1).collect().head
    val m = WordPiece.fitWordPiece(corpus, "text", numMerges = 1)
    assert((top.getString(0), top.getString(1)) ==
      (m.merges.head.lhs, m.merges.head.rhs))
    assert(top.getDouble(5) == m.merges.head.score)
  }
}
