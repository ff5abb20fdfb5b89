package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (the SentencePiece unigram model,
  * Kudo ACL'18) — the OTHER production tokenizer family, completing
  * the [[TextAnalysis]] BPE loop: BPE composes tokens bottom-up from
  * merge rules; unigram starts from an over-complete piece inventory
  * and PRUNES, segmenting by maximum likelihood under per-piece
  * probabilities. The practical differences a corpus engine cares
  * about: unigram vocabularies shrink monotonically (no merge-order
  * coupling), segmentation is globally optimal per word (Viterbi, not
  * greedy), and piece probabilities double as subword sampling
  * weights.
  *
  * Determinism contract (the repo-wide oracle gate): hard-EM with
  * Viterbi counts (no forward-backward float soup), a TOTAL
  * tie-break at every DP cell (higher score; then the LONGER piece;
  * exact float ties on distinct paths break on piece length, never on
  * hash order), piece probabilities as ln of exact integer-count
  * ratios (both engines feed ln identical inputs), and a fixed
  * pruning order (usage asc, piece desc — drop the least-used,
  * lexicographically-last first). Fit state collected driver-side is
  * ALWAYS vocabulary-bounded (the fitBpeMerges convention), never
  * corpus-sized.
  *
  * Scale shape: the fit iterates over the DISTINCT-WORD frame
  * (vocabulary-bounded after one corpus aggregate — word frequency is
  * the only corpus-sized pass); tokenize is one broadcast piece map +
  * a typed mapPartitions doing O(len·maxPieceLen) hash lookups per
  * word (the bpeTokenizeFast convention — no giant literal expression
  * trees at production vocab sizes).
  */
object Unigram {

  /** One vocabulary entry: the piece and its ln-probability. */
  final case class Piece(piece: String, logp: Double)

  /** Unknown-character fallback: a character absent from the piece
    * inventory segments as itself at this penalty (ln-prob floor), so
    * tokenization is total — no word is unsegmentable. */
  val UnkLogp: Double = -100.0

  /** Distinct normalized words with corpus frequencies — the ONLY
    * corpus-sized pass of the fit; everything after runs on this
    * (vocabulary-bounded) frame. Output: (word, freq). */
  def wordFrequencies(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFns.words(col(textCol))).as("word"))
      .where(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Substring seed counts — the over-complete candidate inventory
    * the unigram fit prunes from: every substring of length
    * 1..maxPieceLen of every distinct word, weighted by the word's
    * corpus frequency. Pure expression tree (sequence/transform/
    * flatten + explode) over the distinct-word frame; one (piece)
    * aggregate. Output: (piece, n) — n is the total weighted
    * occurrence count. */
  def seedCounts(words: DataFrame, maxPieceLen: Int): DataFrame = {
    require(maxPieceLen >= 1, s"seedCounts: maxPieceLen >= 1")
    val subsExpr = flatten(transform(
      sequence(lit(1), length(col("word"))),
      i => transform(
        sequence(lit(1),
          least(lit(maxPieceLen), length(col("word")) - i + 1)),
        l => col("word").substr(i, l))))
    words.select(explode(subsExpr).as("piece"), col("freq"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("n"))
  }

  /** Viterbi segmentation of one word under a piece→logp map: returns
    * the maximum-likelihood piece sequence. Tie-break at each DP cell:
    * higher score wins; an EXACT score tie keeps the LONGER final
    * piece (smaller start index). Characters absent from the map
    * segment as single-char pieces at [[UnkLogp]]. Shared by the fit
    * (E-step) and [[tokenize]] so the two can never disagree. */
  def viterbi(word: String, logp: collection.Map[String, Double],
      maxPieceLen: Int): Seq[String] = {
    val n = word.length
    if (n == 0) return Seq.empty
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val backStart = Array.fill(n + 1)(-1)
    best(0) = 0.0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxPieceLen)
      // iterate i ascending: longer pieces first; strict > keeps the
      // FIRST (longest) piece on exact ties
      while (i < j) {
        val piece = word.substring(i, j)
        val lp =
          if (j - i == 1) logp.getOrElse(piece, UnkLogp)
          else logp.getOrElse(piece, Double.NegativeInfinity)
        if (lp > Double.NegativeInfinity && best(i) + lp > best(j)) {
          best(j) = best(i) + lp
          backStart(j) = i
        }
        i += 1
      }
      j += 1
    }
    // backtrack
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var k = n
    while (k > 0) {
      val i = backStart(k)
      out.prepend(word.substring(i, k))
      k = i
    }
    out.toSeq
  }

  /** Fit the unigram vocabulary by hard-EM with pruning: seed with the
    * top `seedSize` substring candidates (single characters always
    * kept — coverage), then per round (1) Viterbi-segment every
    * distinct word under current probabilities, (2) re-estimate each
    * piece's probability from its weighted usage counts, (3) drop the
    * least-used multi-char pieces until at most
    * `max(vocabSize, current·keepRatio)` remain. Rounds and shrink
    * rate are caller-fixed; the fit is deterministic end to end.
    *
    * Driver state: the piece table (≤ seedSize rows) — collected per
    * round, the fitBpeMerges convention. Executor work per round: one
    * mapPartitions over the distinct-word frame + one piece aggregate.
    * Returns pieces sorted (piece asc) with final ln-probabilities. */
  def fitUnigram(df: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int, rounds: Int, seedSize: Int,
      keepRatio: Double = 0.75): Seq[Piece] = {
    require(vocabSize >= 2, "fitUnigram: vocabSize >= 2")
    require(rounds >= 1, "fitUnigram: rounds >= 1")
    require(seedSize >= vocabSize, "fitUnigram: seedSize >= vocabSize")
    require(keepRatio > 0 && keepRatio < 1, "fitUnigram: keepRatio in (0,1)")
    val spark = df.sparkSession
    import spark.implicits._
    val words = wordFrequencies(df, textCol).persist()
    try {
      val seeds = seedCounts(words, maxPieceLen)
      // deterministic seed pick: count desc, piece asc; single chars
      // ALWAYS survive (total segmentation needs them)
      val chars = seeds.where(length(col("piece")) === 1)
      val multi = seeds.where(length(col("piece")) > 1)
        .orderBy(col("n").desc, col("piece"))
        .limit(seedSize)
      val seeded = chars.unionByName(multi)
        .select(col("piece"), col("n")).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      var total = seeds.agg(sum(col("n"))).head().getLong(0).toDouble
      var pieces: Map[String, Double] =
        seeded.map { case (p, c) => p -> math.log(c / total) }.toMap
      val wordRows: DataFrame = words
      var round = 0
      while (round < rounds) {
        val bc = spark.sparkContext.broadcast(pieces)
        val mpl = maxPieceLen
        val usage = wordRows.as[(String, Long)].mapPartitions { it =>
          val lp = bc.value
          it.flatMap { case (w, f) =>
            viterbi(w, lp, mpl).map(p => (p, f))
          }
        }.toDF("piece", "f")
          .groupBy(col("piece")).agg(sum(col("f")).as("used"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toMap
        // M-step on Viterbi counts; unused pieces die unless 1-char
        val singleChars = pieces.keySet.filter(_.length == 1)
        val usedTotal = usage.values.sum.toDouble
        val survivors: Seq[(String, Long)] = pieces.keysIterator.map { p =>
          p -> usage.getOrElse(p, 0L)
        }.toSeq
        val multiSurvivors = survivors.filter(_._1.length > 1)
        val keepN = math.max(vocabSize - singleChars.size,
          (multiSurvivors.size * keepRatio).toInt)
        val kept = multiSurvivors
          .sortBy { case (p, u) => (-u, p) }
          .take(keepN)
          .filter(_._2 > 0L)
        val newTable = (survivors.filter(_._1.length == 1) ++ kept)
        // add-1 smoothing keeps never-used single chars finite
        val denom = usedTotal + newTable.size
        pieces = newTable.map { case (p, u) =>
          p -> math.log((u + 1.0) / denom)
        }.toMap
        bc.destroy()
        round += 1
      }
      pieces.toSeq.sortBy(_._1).map { case (p, l) => Piece(p, l) }
    } finally words.unpersist()
  }

  /** The fitted piece table as its persistable artifact (the
    * bpeMergesToDf convention): write once after [[fitUnigram]], read
    * back with [[piecesFromDf]] wherever arrivals tokenize. */
  def piecesToDf(spark: org.apache.spark.sql.SparkSession,
      pieces: Seq[Piece]): DataFrame =
    spark.createDataFrame(pieces)

  /** Rehydrate a [[piecesToDf]] table (e.g. off parquet) into the
    * (piece asc)-sorted table every scorer takes — the sort
    * re-canonicalizes whatever row order parquet round-tripping
    * produced, so fit → persist → reload → tokenize is bit-equal to
    * fit → tokenize. */
  def piecesFromDf(df: DataFrame): Seq[Piece] =
    df.select(col("piece"), col("logp")).collect()
      .map(r => Piece(r.getString(0), r.getDouble(1)))
      .sortBy(_.piece).toSeq

  /** Deterministic piece→id vocabulary of a piece table: ids are the
    * 0-based rank in (piece asc) order — stable under refits that keep
    * the same piece set, engine-replayable (no hash order anywhere). */
  def vocabulary(pieces: Seq[Piece]): Map[String, Int] =
    pieces.map(_.piece).sorted.zipWithIndex.toMap

  /** [[tokenize]] → TOKEN IDS (what packs ship) under the frozen
    * vocabulary: unknown-character fallback singletons — the only
    * pieces outside the table — encode as −1 and count in `n_oov`.
    * Output: (id, ids, n_pieces, n_oov, ids_sig). */
  def encodeIds(df: DataFrame, idCol: String, textCol: String,
      pieces: Seq[Piece], maxPieceLen: Int): DataFrame = {
    val vocab = vocabulary(pieces)
    val ids = transform(col("pieces"),
      p => coalesce(element_at(typedLit(vocab), p), lit(-1)))
    tokenize(df, idCol, textCol, pieces, maxPieceLen)
      .select(col(idCol), ids.as("ids"), col("n_pieces"))
      .select(col(idCol), col("ids"), col("n_pieces"),
        size(filter(col("ids"), i => i === -1)).cast("long").as("n_oov"),
        md5(array_join(transform(col("ids"), _.cast("string")), ","))
          .as("ids_sig"))
  }

  /** Tokenize under a FROZEN piece table (the artifact loop: fit once,
    * tokenize forever) — per word one Viterbi pass over the broadcast
    * map; unknown characters fall back to [[UnkLogp]] singletons, so
    * every text tokenizes. Output: (id, pieces, n_pieces, pieces_sig)
    * — the bpeTokenize output convention (md5 of the space-join;
    * pieces never contain spaces — words are whitespace-split). */
  def tokenize(df: DataFrame, idCol: String, textCol: String,
      pieces: Seq[Piece], maxPieceLen: Int): DataFrame = {
    require(pieces.nonEmpty, "tokenize: empty piece table")
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      pieces.map(p => p.piece -> p.logp).toMap)
    val mpl = maxPieceLen
    val toks = df
      .select(col(idCol).cast("long").as("id"),
        TextFns.words(col(textCol)).as("__w"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val lp = bc.value
        it.map { case (id, ws) =>
          (id, ws.flatMap(w => viterbi(w, lp, mpl)))
        }
      }.toDF("id", "pieces")
    toks.select(col("id").as(idCol), col("pieces"),
      size(col("pieces")).cast("long").as("n_pieces"),
      md5(array_join(col("pieces"), " ")).as("pieces_sig"))
  }
}
