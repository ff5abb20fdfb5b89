package graft

import graft.operators.{Dedup, Relational, TextAnalysis}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation pipeline over the documents table —
  * the batch composition the operator library exists for:
  *
  *   1. decontamination: drop training docs sharing shingles with the
  *      held-out eval set (Dedup.contamination);
  *   2. canonical selection: one surviving doc per exact-content group,
  *      best quality copy kept (Dedup.keepBest);
  *   3. rule gate (TextAnalysis.gopherRules: word-count / word-length /
  *      symbol / stopword bounds), then quality + language + repetition
  *      scoring gates (TextAnalysis);
  *   4. leakage-safe train/val/test assignment
  *      (Dedup.clusterSafeSplit — near-dup LSH clusters assign as a
  *      unit, so a reformatted copy of a train doc can never land in
  *      test; singletons keep the content-hash-bucket assignment,
  *      stable across reprocessing);
  *   5. split-partitioned parquet layout (downstream readers scan only
  *      their split: partition pruning, no full-table filter).
  *
  * Every stage is a declarative DataFrame transform — the whole pipeline
  * is ONE Spark job graph when written (no intermediate actions), and
  * every stage scales by partitioning, not driver memory.
  *
  * Run: runMain graft.CurateDemo <sfDir> <outDir>
  */
object CurateDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_curated"
    val spark = GraftSession.build("8")

    val docs = Tables(spark, sfDir, "documents")
    val quality = TextAnalysis.qualityScore(docs, "doc_id", "text")
    val lang = TextAnalysis.langId(docs, "doc_id", "text")
    val repetition = TextAnalysis.repetitionScore(docs, "doc_id", "text")
    // decontamination: treat doc_id < 25 as the held-out eval set;
    // training docs sharing any shingle with it are excluded
    val evalSet = docs.filter(col("doc_id") < 25)
    val train = docs.filter(col("doc_id") >= 25)
    // minShared = 10: single shared shingles are natural phrase overlap
    // (at 1, most of this synthetic corpus gets flagged); ten distinct
    // shared shingles means a genuinely copied span
    val contaminated = Dedup.contamination(train, evalSet, "doc_id", "text",
        minShared = 10L)
      .select(col("doc_id"))

    val kept = Dedup.keepBest(train, quality, "doc_id", "text")
      .select(col("keep_id").as("doc_id"), col("best_quality"),
        col("n_copies"))
    // rule gate first: every signal is a per-row expression, so this
    // is the cheapest cut (thresholds sized to this corpus's 10-99
    // word docs — see the text_gopher query)
    val rules = TextAnalysis.gopherRules(train, "doc_id", "text",
        minWords = 15, maxWords = 100000, minMeanWordLen = 3.0,
        maxMeanWordLen = 10.0, maxSymbolRatio = 0.1, minStopwords = 1)
      .filter(col("keep")).select(col("doc_id"))
    val curated = train
      .join(kept, "doc_id") // survivors only
      .join(rules, "doc_id")
      .join(lang.select(col("doc_id"), col("lang_guess")), "doc_id")
      .join(repetition.select(col("doc_id"), col("repetition")), "doc_id")
      .join(contaminated, Seq("doc_id"), "left_anti")
      .filter(col("best_quality") >= 0.3 && col("lang_guess") === "en" &&
        col("repetition") < 0.5)
    // leakage-safe assignment: near-dup clusters split as a unit.
    // curated is consumed by MULTIPLE actions from here (the pair
    // pipeline inside duplicateClusters, its iteration jobs, and the
    // final write) — persist it so the 5-join pyramid above evaluates
    // once, not per action
    curated.persist()
    try {
      val split = Dedup.clusterSafeSplit(curated, "doc_id",
          Dedup.lshCandidatePairs(curated, "doc_id", "text", 16, 4))
        .drop("split_key")
      split.write.partitionBy("split").mode("overwrite").parquet(outDir)
    } finally { curated.unpersist(); () }

    val total = docs.count()
    val out = spark.read.parquet(outDir)
    val bySplit = out.groupBy(col("split")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    println(s"CURATE_SOURCE=$total")
    println(s"CURATE_KEPT=${out.count()}")
    println(s"CURATE_TRAIN=${bySplit.getOrElse("train", 0L)}")
    println(s"CURATE_VAL=${bySplit.getOrElse("val", 0L)}")
    println(s"CURATE_TEST=${bySplit.getOrElse("test", 0L)}")
    spark.stop()
  }
}
