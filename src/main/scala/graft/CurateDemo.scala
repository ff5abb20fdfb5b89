package graft

import graft.operators.{Dedup, Relational, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end training-data curation pipeline over the documents table —
  * the batch composition the operator library exists for:
  *
  *   1. canonical selection: one surviving doc per exact-content group,
  *      best quality copy kept (Dedup.keepBest);
  *   2. quality + language gating (TextAnalysis);
  *   3. reproducible train/val/test assignment (deterministicSplit —
  *      content-hash buckets, stable across reprocessing);
  *   4. split-partitioned parquet layout (downstream readers scan only
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
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables(spark, sfDir, "documents")
    val quality = TextAnalysis.qualityScore(docs, "doc_id", "text")
    val lang = TextAnalysis.langId(docs, "doc_id", "text")

    val kept = Dedup.keepBest(docs, quality, "doc_id", "text")
      .select(col("keep_id").as("doc_id"), col("best_quality"),
        col("n_copies"))
    val curated = docs
      .join(kept, "doc_id") // survivors only
      .join(lang.select(col("doc_id"), col("lang_guess")), "doc_id")
      .filter(col("best_quality") >= 0.3 && col("lang_guess") === "en")
    val split = Relational.deterministicSplit(curated, "doc_id")

    split.write.partitionBy("split").mode("overwrite").parquet(outDir)

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
