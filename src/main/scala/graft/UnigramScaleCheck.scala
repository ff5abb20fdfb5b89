package graft

import graft.operators.Unigram

/** Cost-law diagnostic for the unigram-LM fit and encode.
  *
  * Fit claim (SCALE.md row): the fit touches the CORPUS once (word
  * frequencies); every EM round after that runs on the DISTINCT-WORD
  * frame, so fit time should be nearly flat in corpus size when the
  * vocabulary is SF-invariant (the synthetic documents reuse a small
  * word list) — FIT at sf0.1 should sit well under 10× FIT at sf0.01.
  * Round count is the other axis: rounds scale the distinct-word work
  * only, so 6 rounds should cost roughly 2× of 3 rounds' EM portion,
  * never 2× of the whole (the corpus pass amortizes).
  *
  * Encode claim: tokenize is scan-speed mapPartitions — encode time
  * tracks corpus size linearly at worst.
  *
  * Usage: runMain graft.UnigramScaleCheck <sfDir> (default sf0.01)
  */
object UnigramScaleCheck {
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

    val (p3, t3) = time(Unigram.fitUnigram(docs, "text", vocabSize = 40,
      maxPieceLen = 4, rounds = 3, seedSize = 120))
    val (_, t6) = time(Unigram.fitUnigram(docs, "text", vocabSize = 40,
      maxPieceLen = 4, rounds = 6, seedSize = 120))
    val (n, tEnc) = time(
      Unigram.tokenize(docs, "doc_id", "text", p3, 4).count())

    println(s"UNIGRAM_SCALE dir=$dir docs=$nDocs " +
      f"fit3=$t3%.2f fit6=$t6%.2f encode=$tEnc%.2f encoded=$n " +
      s"vocab=${p3.size}")
    spark.stop()
  }
}
