package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece subword tokenizer (Schuster & Nakajima ICASSP'12; the
  * BERT-family tokenizer, Devlin et al. 2018) — the THIRD production
  * tokenizer family, completing the trilogy with [[TextAnalysis]]'s
  * BPE (merge-rule composition) and [[Unigram]]'s unigram-LM
  * (likelihood pruning). WordPiece sits between them: the FIT is a
  * BPE-shaped greedy merge loop, but ranked by the likelihood-gain
  * score `count(a,b) / (count(a) · count(b))` instead of raw pair
  * count (merging a pair whose parts are themselves rare gains more
  * corpus log-likelihood than merging two ubiquitous symbols); the
  * APPLY needs only the final vocabulary — greedy longest-match-first
  * per word, continuations carrying the `##` prefix, whole word →
  * `[UNK]` when any position has no vocabulary match (the BERT
  * inference algorithm, which never replays merges).
  *
  * Determinism contract (the repo-wide oracle gate): scores are IEEE
  * doubles built from exact integer counts (< 2^53 — single divides
  * and multiplies of exactly-representable ints are exactly rounded,
  * so every engine computes identical bits); ties break on pair count
  * desc then lexicographic (a, b); greedy matching has no ties at all
  * (the FIRST — longest — match wins by construction). Driver state
  * per fit round is `4·batch+8` candidate rows plus the
  * (alphabet+merges)-bounded symbol-count table, never corpus-sized.
  *
  * Scale shape (the fitBpeMerges conventions): the fit iterates over
  * the DISTINCT-WORD frame (one corpus-sized aggregate total, then
  * vocabulary-bounded rounds: one pair aggregate + one symbol
  * aggregate + a broadcast-sized join per recount, ≤16 lazy merge
  * applies between localCheckpoints); tokenize is one broadcast
  * vocab set + a typed mapPartitions doing O(len · maxPieceLen) hash
  * probes per word — scan-speed, shuffle-free, merge-count-free. */
object WordPiece {

  /** The out-of-vocabulary sentinel (the BERT convention). */
  val Unk = "[UNK]"

  /** Continuation-piece marker (the BERT convention): a piece that
    * matches at word offset > 0 is stored and matched WITH this
    * prefix, so "bed" the word-start and "##bed" the suffix are
    * distinct vocabulary entries with independent statistics. */
  val ContPrefix = "##"

  /** One learned merge: `lhs`+`rhs` → `merged` (the rhs's `##`
    * dropped — the merged symbol inherits the lhs's word-position),
    * with the score and pair count that made it this round's argmax. */
  final case class WpMerge(rank: Long, lhs: String, rhs: String,
      merged: String, score: Double, pair_count: Long)

  /** A fitted model: the corpus alphabet (word-initial chars and
    * `##`-prefixed continuation chars actually observed) plus the
    * merge sequence. Inference needs only [[vocab]]. */
  final case class WpModel(alphabet: Seq[String], merges: Seq[WpMerge]) {
    /** The inference vocabulary: alphabet ∪ merged symbols ∪ [UNK],
      * sorted (piece asc) — the deterministic id order of
      * [[encodeIds]]. */
    def vocab: Seq[String] =
      (alphabet ++ merges.map(_.merged) :+ Unk).distinct.sorted
  }

  /** The double-space symbol encoding shared with the BPE fit
    * (TextAnalysis.bpeSeq — see there for why double spaces make one
    * literal replace equal greedy leftmost application): word →
    * `"  c0  ##c1  ##c2  "`. */
  private def wpSeq(word: Column): Column = {
    val first = concat(lit("  "), substring(word, 1, 1), lit("  "))
    val rest = regexp_replace(substring(word, 2, Int.MaxValue),
      "(.)", s"$ContPrefix$$1  ")
    concat(first, rest)
  }

  private def applyMerge(seq: Column, a: String, b: String,
      merged: String): Column =
    call_function("replace", seq, lit(s" $a  $b "), lit(s" $merged "))

  /** Fit `numMerges` WordPiece merges over the corpus. Per recount:
    * adjacent-pair counts AND symbol counts (both weighted by word
    * frequency, both vocabulary-bounded aggregates over the
    * distinct-word frame), score each pair `cnt/(cnt_a·cnt_b)`, admit
    * the top `batchSize` symbol-disjoint candidates in (score desc,
    * cnt desc, a, b) order. Every ADMITTED score is exact — a merge of
    * (a,b) changes neither the pair count nor the symbol counts of any
    * pair sharing no symbol with it (the merged symbol is brand-new; c
    * and d occurrences are untouched) — but the admission SET can
    * diverge from sequential WordPiece at batchSize > 1: a merge
    * admitted earlier in the round creates a new symbol whose pairs
    * (e.g. (x, ab)) sequential fitting would score next and might rank
    * above the remaining disjoint candidates of this round. Same
    * caveat as batched BPE; batchSize = 1 replays sequential exactly. */
  def fitWordPiece(df: DataFrame, textCol: String, numMerges: Int,
      batchSize: Int = 1): WpModel = {
    require(numMerges >= 0, "fitWordPiece: numMerges >= 0")
    require(batchSize >= 1, "fitWordPiece: batchSize >= 1")
    var words = df
      .select(explode(TextFns.words(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(wpSeq(col("w")).as("seq"), col("freq"))
      .localCheckpoint(true)
    try {
      val alphabet = words
        .select(explode(split(trim(col("seq")), "  ")).as("s"))
        .distinct().collect().map(_.getString(0)).toSeq.sorted
      val merges = Seq.newBuilder[WpMerge]
      var rank = 1
      var sinceCheckpoint = 0
      var exhausted = false
      while (rank <= numMerges && !exhausted) {
        val want = math.min(batchSize, numMerges - rank + 1)
        val l = split(trim(col("seq")), "  ")
        val syms = words.select(l.as("__l"), col("freq"))
          .select(explode(col("__l")).as("s"), col("freq"))
          .groupBy(col("s")).agg(sum(col("freq")).as("ns"))
        val pairs = when(size(col("__l")) >= 2,
          transform(sequence(lit(0), size(col("__l")) - 2),
            i => struct(element_at(col("__l"), i + 1).as("a"),
              element_at(col("__l"), i + 2).as("b"))))
          .otherwise(array_repeat(
            struct(lit("").as("a"), lit("").as("b")), 0))
        val top = words.select(l.as("__l"), col("freq"))
          .select(explode(pairs).as("p"), col("freq"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("freq")).as("cnt"))
          // symbol-count table is (alphabet+merges)-bounded → broadcast
          .join(broadcast(syms.select(col("s").as("a"),
            col("ns").as("na"))), Seq("a"))
          .join(broadcast(syms.select(col("s").as("b"),
            col("ns").as("nb"))), Seq("b"))
          .withColumn("score", col("cnt").cast("double") /
            (col("na").cast("double") * col("nb").cast("double")))
          .orderBy(col("score").desc, col("cnt").desc, col("a"), col("b"))
          .limit(4 * want + 8)
          .collect()
        if (top.isEmpty) exhausted = true
        else {
          val used = scala.collection.mutable.HashSet.empty[String]
          val picked = top.iterator
            .map(r => (r.getAs[String]("a"), r.getAs[String]("b"),
              r.getAs[Long]("cnt"), r.getAs[Double]("score")))
            .filter { case (a, b, _, _) =>
              !used(a) && !used(b) && { used += a; used += b; true } }
            .take(want).toVector
          for ((a, b, cnt, score) <- picked) {
            val merged = a + b.stripPrefix(ContPrefix)
            merges += WpMerge(rank.toLong, a, b, merged, score, cnt)
            words = words.withColumn("seq",
              applyMerge(col("seq"), a, b, merged))
            rank += 1
            sinceCheckpoint += 1
            if (sinceCheckpoint >= 16) {
              val next = words.localCheckpoint(true)
              Checkpoints.releaseIntermediate(words)
              words = next
              sinceCheckpoint = 0
            }
          }
        }
      }
      WpModel(alphabet, merges.result())
    } finally Checkpoints.releaseIntermediate(words)
  }

  /** The fitted vocabulary as its persistable artifact (the
    * bpeMergesToDf convention) — inference is merge-free, so the
    * vocab IS the whole deployable tokenizer: one (id, piece) row per
    * entry, ids the [[vocabulary]] ranks. */
  def vocabToDf(spark: org.apache.spark.sql.SparkSession,
      vocab: Seq[String]): DataFrame = {
    import spark.implicits._
    vocabulary(vocab).toSeq.sortBy(_._2)
      .map { case (p, i) => (i, p) }.toDF("id", "piece")
  }

  /** Rehydrate a [[vocabToDf]] table (e.g. off parquet) into the
    * sorted piece list [[tokenize]]/[[encodeIds]] take — persist →
    * reload → tokenize is bit-equal to fit → tokenize. */
  def vocabFromDf(df: DataFrame): Seq[String] =
    df.select(col("piece")).collect().map(_.getString(0))
      .toSeq.sorted

  /** Greedy longest-match segmentation of one word under a vocabulary
    * set — the BERT WordPiece inference algorithm, shared by
    * [[tokenize]] and the specs so they can never disagree. At each
    * offset try the LONGEST candidate first (continuations probe with
    * the `##` prefix); no match at any offset → the WHOLE word is
    * `[UNK]` (the all-or-nothing BERT contract — a half-segmented
    * word would corrupt downstream statistics). */
  def greedyMatch(word: String, vocab: collection.Set[String],
      maxInit: Int, maxCont: Int): Seq[String] = {
    val n = word.length
    if (n == 0) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var off = 0
    while (off < n) {
      val cap = math.min(if (off == 0) maxInit else maxCont, n - off)
      var len = cap
      var hit: String = null
      while (len >= 1 && hit == null) {
        val sub = word.substring(off, off + len)
        val cand = if (off == 0) sub else ContPrefix + sub
        if (vocab.contains(cand)) hit = cand else len -= 1
      }
      if (hit == null) return Seq(Unk)
      out += hit
      off += len
    }
    out.toSeq
  }

  /** Longest RAW length an initial / continuation probe can need under
    * `vocab` — bounds the greedy inner loop (and the oracle CTE's
    * candidate range) by the vocabulary, not the word. */
  def probeBounds(vocab: Seq[String]): (Int, Int) = {
    val init = vocab.filterNot(_.startsWith(ContPrefix))
      .filterNot(_ == Unk).map(_.length)
    val cont = vocab.filter(_.startsWith(ContPrefix))
      .map(_.length - ContPrefix.length)
    (if (init.isEmpty) 1 else init.max,
      if (cont.isEmpty) 1 else cont.max)
  }

  /** Tokenize under a FROZEN vocabulary (fit once, tokenize forever —
    * and unlike BPE, inference is merge-free: ONLY the vocab ships).
    * One broadcast set + a typed mapPartitions; per word
    * O(len · maxPieceLen) hash probes. Output: (id, pieces, n_pieces,
    * n_unk, pieces_sig) — pieces carry `##`, never spaces, so the
    * space-join signature is unambiguous. */
  def tokenize(df: DataFrame, idCol: String, textCol: String,
      vocab: Seq[String]): DataFrame = {
    require(vocab.nonEmpty, "tokenize: empty vocabulary")
    // greedyMatch emits the Unk sentinel for unmatchable words; a vocab
    // without it would make that sentinel invisible downstream (and in
    // encodeIds, element_at on the piece->id map would yield null ids
    // that array_join silently DROPS from ids_sig). WpModel.vocab
    // always carries it; the raw Seq[String] API must too.
    require(vocab.contains(Unk),
      s"tokenize: vocabulary must contain the $Unk sentinel")
    val spark = df.sparkSession
    import spark.implicits._
    val (maxInit, maxCont) = probeBounds(vocab)
    val bc = spark.sparkContext.broadcast(vocab.toSet)
    val toks = df
      .select(col(idCol).cast("long").as("id"),
        TextFns.words(col(textCol)).as("__w"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val v = bc.value
        it.map { case (id, ws) =>
          (id, ws.flatMap(w => greedyMatch(w, v, maxInit, maxCont)))
        }
      }.toDF("id", "pieces")
    toks.select(col("id").as(idCol), col("pieces"),
      size(col("pieces")).cast("long").as("n_pieces"),
      size(filter(col("pieces"), p => p === Unk)).cast("long")
        .as("n_unk"),
      md5(array_join(col("pieces"), " ")).as("pieces_sig"))
  }

  /** Deterministic piece→id vocabulary: 0-based rank in (piece asc)
    * order — the [[Unigram.vocabulary]] convention. `[UNK]` is a real
    * vocabulary entry, so every piece has an id (no −1 channel). */
  def vocabulary(vocab: Seq[String]): Map[String, Int] =
    vocab.distinct.sorted.zipWithIndex.toMap

  /** [[tokenize]] → TOKEN IDS under the frozen vocabulary. Output:
    * (id, ids, n_pieces, n_unk, ids_sig). */
  def encodeIds(df: DataFrame, idCol: String, textCol: String,
      vocab: Seq[String]): DataFrame = {
    require(vocab.contains(Unk),
      s"encodeIds: vocabulary must contain the $Unk sentinel")
    val v = vocabulary(vocab)
    val ids = transform(col("pieces"),
      p => element_at(typedLit(v), p))
    tokenize(df, idCol, textCol, vocab)
      .select(col(idCol), ids.as("ids"), col("n_pieces"), col("n_unk"))
      .select(col(idCol), col("ids"), col("n_pieces"), col("n_unk"),
        md5(array_join(transform(col("ids"), _.cast("string")), ","))
          .as("ids_sig"))
  }

  /** First-round pair-score table — the fit's round-1 statistics as a
    * standalone (fully SQL-expressible) relation, the
    * [[Unigram.seedCounts]] analog: every adjacent symbol pair of the
    * symbol-encoded corpus with its weighted count, the two symbol
    * counts, and the WordPiece score. Output: (a, b, n_pair, n_a,
    * n_b, score). */
  def pairScores(df: DataFrame, textCol: String): DataFrame = {
    val words = df
      .select(explode(TextFns.words(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    val l = split(trim(wpSeq(col("w"))), "  ")
    val withSyms = words.select(l.as("__l"), col("freq"))
    val syms = withSyms
      .select(explode(col("__l")).as("s"), col("freq"))
      .groupBy(col("s")).agg(sum(col("freq")).as("ns"))
    val pairs = when(size(col("__l")) >= 2,
      transform(sequence(lit(0), size(col("__l")) - 2),
        i => struct(element_at(col("__l"), i + 1).as("a"),
          element_at(col("__l"), i + 2).as("b"))))
      .otherwise(array_repeat(
        struct(lit("").as("a"), lit("").as("b")), 0))
    withSyms.select(explode(pairs).as("p"), col("freq"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("n_pair"))
      .join(broadcast(syms.select(col("s").as("a"), col("ns").as("n_a"))),
        Seq("a"))
      .join(broadcast(syms.select(col("s").as("b"), col("ns").as("n_b"))),
        Seq("b"))
      .select(col("a"), col("b"), col("n_pair"), col("n_a"), col("n_b"),
        (col("n_pair").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")))
          .as("score"))
  }
}
