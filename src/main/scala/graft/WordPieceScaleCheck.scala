package graft

import graft.operators.WordPiece

/** Cost-law diagnostic for the WordPiece fit and encode (the
  * UnigramScaleCheck convention).
  *
  * Fit claim (SCALE.md row): one corpus-sized word-frequency pass,
  * then every recount runs on the DISTINCT-WORD frame — fit time
  * should be nearly flat in corpus size when the vocabulary is
  * SF-invariant (the synthetic documents reuse a small word list).
  * Batch claim: batched symbol-disjoint admission cuts recounts from
  * numMerges to ~numMerges/M, so fitB should undercut fit1 clearly.
  *
  * Encode claim: tokenize is merge-free scan-speed mapPartitions over
  * a broadcast vocab set — encode time tracks corpus size linearly at
  * worst.
  *
  * Usage: runMain graft.WordPieceScaleCheck <sfDir> (default sf0.01)
  */
object WordPieceScaleCheck {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.build("16")
    val docs = Tables(spark, dir, "documents").cache()
    val nDocs = docs.count()

    val (m1, t1) = time(WordPiece.fitWordPiece(docs, "text",
      numMerges = 24))
    val (mB, tB) = time(WordPiece.fitWordPiece(docs, "text",
      numMerges = 24, batchSize = 8))
    val (n, tEnc) = time(
      WordPiece.tokenize(docs, "doc_id", "text", m1.vocab).count())

    println(s"WORDPIECE_SCALE dir=$dir docs=$nDocs " +
      f"fit1=$t1%.2f fitB8=$tB%.2f encode=$tEnc%.2f encoded=$n " +
      s"vocab=${m1.vocab.size} vocabB=${mB.vocab.size}")
    spark.stop()
  }
}
