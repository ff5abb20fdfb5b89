package graft

import graft.operators.TextAnalysis
import graft.operators.TextAnalysis.BpeMerge

/** Merge-count scaling diagnostic for the BPE FIT and the two apply
  * flavors.
  *
  * Fit claim (SCALE.md row): batched merge admission makes fit time
  * scale with RECOUNT ROUNDS (numMerges / batch), not with numMerges —
  * FIT_BATCHED_512 (8 recounts at batch 64) should land well under
  * FIT_EXACT_64 (64 recounts) despite fitting 8× the rules, and
  * FIT_BATCHED_512 / FIT_BATCHED_128 should track the 8:2 job ratio,
  * not the 4× rule ratio.
  *
  * Apply claim: bpeTokenizeFast (broadcast rank-map mapPartitions) is
  * FLAT in merge count; the literal replace chain is not — its
  * analysis/codegen cost grows with the expression tree (the
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

    val (fitExact64, tExact64) =
      time(TextAnalysis.fitBpeMerges(docs, "text", 64))
    val (_, tExact128) =
      time(TextAnalysis.fitBpeMerges(docs, "text", 128))
    val (_, tBatched128) =
      time(TextAnalysis.fitBpeMerges(docs, "text", 128, batchSize = 64))
    val (fitted, tBatched512) =
      time(TextAnalysis.fitBpeMerges(docs, "text", 512, batchSize = 64))
    // the production-vocabulary point: >= 4096 merges requested at
    // batch 512 — EIGHT recount rounds, same as FIT_BATCHED_512's
    // eight at batch 64. Near-equal times here + a ~2x
    // FIT_EXACT_128/FIT_EXACT_64 ratio are the closure proof that fit
    // cost tracks recounts, not merge count (the old per-rank loop
    // would need 4096 recount jobs — linearly extrapolable from the
    // two EXACT points, far past any usable wall clock).
    val (fitted4k, tBatched4k) =
      time(TextAnalysis.fitBpeMerges(docs, "text", 4096, batchSize = 512))
    println(f"FIT_EXACT_64=$tExact64%.3f")       // 64 recount jobs
    println(f"FIT_EXACT_128=$tExact128%.3f")     // 128 recounts: slope witness
    println(f"FIT_BATCHED_128=$tBatched128%.3f") // 2 recount jobs
    println(f"FIT_BATCHED_512=$tBatched512%.3f") // 8 recount jobs
    println(f"FIT_BATCHED_4096=$tBatched4k%.3f") // 8 recount jobs, batch 512
    // batched and exact agree on their symbol-disjoint prefix; the
    // spec pins semantic agreement, this pins the fit actually ran
    println(s"FIT_EXACT_64_RULES=${fitExact64.size}")
    println(s"FITTED_MERGES=${fitted.size}")
    // how many of the 4096 the corpus could actually fit before the
    // candidate stream dried up (vocabulary richness bound, not a cap)
    println(s"FITTED_MERGES_4096=${fitted4k.size}")
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
        // measurement — the plan cannot even be analyzed. Other fatal
        // VM states (OOM, InternalError) must propagate: timings taken
        // after one are meaningless
        case t: StackOverflowError =>
          println(s"$name=FAILED(${t.getClass.getSimpleName})")
        case scala.util.control.NonFatal(t) =>
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
