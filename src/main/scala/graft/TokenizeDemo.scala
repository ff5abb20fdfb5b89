package graft

import graft.operators.{Packing, WordPiece}
import org.apache.spark.sql.functions._

/** End-to-end tokenizer production pipeline (the CurateDemo of the
  * tokenizer family): FIT a WordPiece vocabulary on the corpus
  * (batched recounts — the production knob), PERSIST the artifact to
  * parquet, REHYDRATE it as a separate process would, ENCODE every
  * document to token ids under the frozen vocab, PACK the ids into
  * dataloader-ready training sequences, and WRITE the packs
  * partitioned — printing one summary line per stage for the smoke
  * check.
  *
  * Usage: runMain graft.TokenizeDemo [sfDir] [outDir]
  */
object TokenizeDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft_tok").toString
    val spark = GraftSession.build("8")
    val docs = Tables(spark, sfDir, "documents")
    val nDocs = docs.count()
    println(s"TOKENIZE_DOCS=$nDocs")

    // 1. fit (batched symbol-disjoint admission: recounts / 8)
    val model = WordPiece.fitWordPiece(docs, "text", numMerges = 48,
      batchSize = 8)
    println(s"TOKENIZE_VOCAB=${model.vocab.size}")

    // 2. persist the deployable artifact (the vocab IS the tokenizer)
    WordPiece.vocabToDf(spark, model.vocab)
      .write.mode("overwrite").parquet(s"$outDir/vocab")

    // 3. rehydrate — the arrival process never sees the fit
    val vocab = WordPiece.vocabFromDf(
      spark.read.parquet(s"$outDir/vocab"))
    require(vocab == model.vocab, "artifact round-trip drifted")

    // 4. encode under the frozen vocabulary
    val ids = WordPiece.encodeIds(docs, "doc_id", "text", vocab)
      .select(col("doc_id"), col("ids").as("token_ids"),
        col("n_pieces"), col("n_unk"))
    val totalTokens = ids.agg(sum("n_pieces")).head.getLong(0)
    val totalUnk = ids.agg(sum("n_unk")).head.getLong(0)
    println(s"TOKENIZE_TOKENS=$totalTokens")
    println(s"TOKENIZE_UNK=$totalUnk")

    // 5. pack into training sequences and write
    val packs = Packing.materializePackedIds(
      Packing.packSequences(docs, "doc_id", "text", budget = 512L,
        numGroups = 32),
      ids, "doc_id")
    packs.select(col("pack_id"), col("n_docs"), col("n_ids"),
        col("input_ids"))
      .write.mode("overwrite").parquet(s"$outDir/packs")
    val written = spark.read.parquet(s"$outDir/packs")
    val nPacks = written.count()
    val packedIds = written.agg(sum("n_ids")).head.getLong(0)
    val missing = packs.agg(sum("n_missing")).head.getLong(0)
    println(s"TOKENIZE_PACKS=$nPacks")
    println(s"TOKENIZE_PACKED_IDS=$packedIds")
    println(s"TOKENIZE_MISSING=$missing")
    require(packedIds == totalTokens && missing == 0L,
      s"pack accounting drifted: packed=$packedIds tokens=$totalTokens " +
        s"missing=$missing")
    println("TOKENIZE_OK")
    spark.stop()
  }
}
