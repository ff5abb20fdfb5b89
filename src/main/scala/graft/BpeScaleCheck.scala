package graft

import graft.operators.TextAnalysis
import graft.operators.TextAnalysis.BpeMerge

/** Merge-count scaling diagnostic for the two BPE apply flavors: times
  * bpeTokenize (literal replace chain — one expression node per rule)
  * against bpeTokenizeFast (broadcast rank-map mapPartitions) at 12 and
  * 512 merge rules over the same corpus. The claim under test (SCALE.md
  * row): the fast flavor is FLAT in merge count, the literal chain is
  * not — its analysis/codegen cost grows with the expression tree (the
  * giant-literal-tree micro-finding), long before any execution-cost
  * difference. Rules past what the corpus can fit are padded with
  * never-firing pairs: exactly how a production tokenizer behaves per
  * word (most of a 32k-rule table fires on no given word), and the pad
  * costs the literal chain one expression node each regardless.
  *
  * Usage: runMain graft.BpeScaleCheck <sfDir>  (defaults to sf0.01)
  */
object BpeScaleCheck {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.build("16")
    val docs = Tables(spark, dir, "documents").cache()
    docs.count()

    val fitted = TextAnalysis.fitBpeMerges(docs, "text", 512)
    println(s"FITTED_MERGES=${fitted.size}")
    val padded: Seq[BpeMerge] = fitted ++
      ((fitted.size + 1) to 512).map(i =>
        BpeMerge(i.toLong, s"¤$i", s"¤${i}b", s"¤$i¤${i}b", 0L))

    def run(name: String, merges: Seq[BpeMerge],
        flavor: (org.apache.spark.sql.DataFrame, String, String,
          Seq[BpeMerge]) => org.apache.spark.sql.DataFrame): Unit = {
      // warm once, then min of two timed passes (the Bench convention)
      val go = () => flavor(docs, "doc_id", "text", merges)
        .write.format("noop").mode("overwrite").save()
      try {
        go()
        val t = math.min(time(go())._2, time(go())._2)
        println(f"$name%s=$t%.3f")
      } catch {
        // StackOverflowError (an Error, not Exception) is the expected
        // literal-chain failure at depth: catching it here IS the
        // measurement — the plan cannot even be analyzed
        case t: Throwable =>
          println(s"$name=FAILED(${t.getClass.getSimpleName})")
      }
    }

    run("LITERAL_12", fitted.take(12), TextAnalysis.bpeTokenize)
    run("FAST_12", fitted.take(12), TextAnalysis.bpeTokenizeFast)
    run("LITERAL_128", padded.take(128), TextAnalysis.bpeTokenize)
    run("FAST_128", padded.take(128), TextAnalysis.bpeTokenizeFast)
    run("LITERAL_512", padded, TextAnalysis.bpeTokenize)
    run("FAST_512", padded, TextAnalysis.bpeTokenizeFast)
    spark.stop()
  }
}
