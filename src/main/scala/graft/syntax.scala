package graft

import graft.operators._
import org.apache.spark.sql.{Column, DataFrame}

/** Fluent entry points for the operator library:
  *
  * {{{
  * import graft.syntax._
  * docs.dedupExactGroups("doc_id", "text")
  * events.capPerKey("user_id", Seq(col("ts")), 5)
  * left.asofJoinTo(right, "id", "k", "ts", "rk", "rts", "rid")
  * }}}
  *
  * Thin forwarders only — every method delegates to the operator
  * objects (Relational / Dedup / Similarity / TextAnalysis), which
  * remain the canonical, documented surface.
  */
object syntax {

  implicit class GraftDataFrameOps(private val df: DataFrame)
      extends AnyVal {

    // relational
    def taggedKeyCounts(keyA: String, tagA: String, keyB: String,
        tagB: String): DataFrame =
      Relational.taggedKeyCounts(df, keyA, tagA, keyB, tagB)
    def topKByCount(key: String, k: Int): DataFrame =
      Relational.topKByCount(df, key, k)
    def heavyHitters(keyCol: String, minCount: Long,
        nBuckets: Int): DataFrame =
      Relational.heavyHitters(df, keyCol, minCount, nBuckets)
    def heavyHittersSketch(keyCol: String, capacity: Int): DataFrame =
      Relational.heavyHittersSketch(df, keyCol, capacity)
    def withScalableOrdinal(orderCols: Seq[Column]): DataFrame =
      Relational.withScalableOrdinal(df, orderCols)
    def sessionize(userCol: String, tsCol: String, idCol: String,
        gapSeconds: Long): DataFrame =
      Relational.sessionize(df, userCol, tsCol, idCol, gapSeconds)
    def deterministicSplit(idCol: String): DataFrame =
      Relational.deterministicSplit(df, idCol)
    def groupedQuantiles(grp: String,
        measures: Seq[(String, Double, String)]): DataFrame =
      Relational.groupedQuantiles(df, grp, measures)
    def capPerKey(keyCol: String, orderCols: Seq[Column],
        n: Int): DataFrame =
      Relational.capPerKey(df, keyCol, orderCols, n)
    def resampleFfill(keyCol: String, tsCol: String, valueCol: String,
        stepSeconds: Long): DataFrame =
      Relational.resampleFfill(df, keyCol, tsCol, valueCol, stepSeconds)
    def asofJoinTo(right: DataFrame, leftId: String, leftKey: String,
        leftTs: String, rightKey: String, rightTs: String,
        rightTie: String): DataFrame =
      Relational.asofJoin(df, right, leftId, leftKey, leftTs,
        rightKey, rightTs, rightTie)
    def bloomSemiJoinTo(right: DataFrame, leftKey: String,
        rightKey: String, expectedItems: Long, numBits: Long): DataFrame =
      Relational.bloomSemiJoin(df, right, leftKey, rightKey,
        expectedItems, numBits)
    def zscoreAgainstStats(stats: DataFrame, grp: String,
        valueCol: String, threshold: Double): DataFrame =
      Relational.zscoreAgainstStats(df, stats, grp, valueCol, threshold)

    // dedup
    def dedupExactGroups(idCol: String, textCol: String): DataFrame =
      Dedup.exactDupGroups(df, idCol, textCol)
    def minhashSignatures(idCol: String, textCol: String,
        k: Int): DataFrame =
      Dedup.minhashSignatures(df, idCol, textCol, k)
    def lshCandidatePairs(idCol: String, textCol: String, k: Int,
        bands: Int): DataFrame =
      Dedup.lshCandidatePairs(df, idCol, textCol, k, bands)
    def jaccardPairs(idCol: String, textCol: String,
        minJaccard: Double, maxDocFreq: Long = 0L): DataFrame =
      Dedup.jaccardPairs(df, idCol, textCol, minJaccard, maxDocFreq)
    def simhash(idCol: String, textCol: String): DataFrame =
      Dedup.simhash(df, idCol, textCol)
    def contaminationAgainst(evalDocs: DataFrame, idCol: String,
        textCol: String): DataFrame =
      Dedup.contamination(df, evalDocs, idCol, textCol)
    def clusterSafeSplit(idCol: String, pairs: DataFrame): DataFrame =
      Dedup.clusterSafeSplit(df, idCol, pairs)
    def incrementalNearDups(index: DataFrame, idCol: String,
        textCol: String): DataFrame =
      Dedup.incrementalNearDups(df, index, idCol, textCol)
    def simhashBandIndex(idCol: String, textCol: String): DataFrame =
      Dedup.simhashBandIndex(df, idCol, textCol)
    def advanceSimhashIndex(newDocs: DataFrame, idCol: String,
        textCol: String): DataFrame =
      Dedup.advanceSimhashIndex(df, newDocs, idCol, textCol)

    // text
    def textStats(idCol: String, textCol: String): DataFrame =
      TextAnalysis.textStats(df, idCol, textCol)
    def qualityScore(idCol: String, textCol: String): DataFrame =
      TextAnalysis.qualityScore(df, idCol, textCol)
    def langId(idCol: String, textCol: String): DataFrame =
      TextAnalysis.langId(df, idCol, textCol)
    def repetitionScore(idCol: String, textCol: String): DataFrame =
      TextAnalysis.repetitionScore(df, idCol, textCol)
    def gopherRules(idCol: String, textCol: String): DataFrame =
      TextAnalysis.gopherRules(df, idCol, textCol)
    def selfInfoScore(idCol: String, textCol: String): DataFrame =
      TextAnalysis.selfInfoScore(df, idCol, textCol)
    def selfInfoBigram(idCol: String, textCol: String): DataFrame =
      TextAnalysis.selfInfoBigram(df, idCol, textCol)
    def selfInfoNgramBackoff(idCol: String, textCol: String,
        n: Int): DataFrame =
      TextAnalysis.selfInfoNgramBackoff(df, idCol, textCol, n)
    def bpeTokenize(idCol: String, textCol: String,
        merges: Seq[TextAnalysis.BpeMerge]): DataFrame =
      TextAnalysis.bpeTokenize(df, idCol, textCol, merges)
    def sourceReport(sourceCol: String, idCol: String,
        textCol: String): DataFrame =
      TextAnalysis.sourceReport(df, sourceCol, idCol, textCol)
    def chunkWords(idCol: String, textCol: String, chunkSize: Int,
        overlap: Int): DataFrame =
      TextAnalysis.chunkWords(df, idCol, textCol, chunkSize, overlap)
    def packSequences(idCol: String, textCol: String,
        budget: Long): DataFrame =
      Packing.packSequences(df, idCol, textCol, budget)
    def packChunks(idCol: String, textCol: String, chunkSize: Int,
        overlap: Int, budget: Long): DataFrame =
      Packing.packChunks(df, idCol, textCol, chunkSize, overlap, budget)
    def mixtureSample(keyCol: String, idCol: String,
        weights: Map[String, Double]): DataFrame =
      Packing.mixtureSample(df, keyCol, idCol, weights)
    def curateAndPack(idCol: String, sourceCol: String, textCol: String,
        budgets: Map[String, Long], packBudget: Long): DataFrame =
      Packing.curateAndPack(df, idCol, sourceCol, textCol, budgets,
        packBudget)
    def withKeepQuality(textCol: String): DataFrame =
      TextAnalysis.withKeepQuality(df, textCol)
    def dedupParagraphs(idCol: String, textCol: String,
        delim: String = "\n"): DataFrame =
      TextAnalysis.dedupParagraphs(df, idCol, textCol, delim)

    // similarity
    def knnTopK(queries: DataFrame, k: Int): DataFrame =
      Similarity.bruteForceTopK(df, queries, k)
    def labelCentroids(labelCol: String, vecCol: String): DataFrame =
      Similarity.labelCentroids(df, labelCol, vecCol)
    def buildIvfPqIndex(coarse: Array[Array[Float]],
        codebooks: Array[Array[Array[Float]]]): DataFrame =
      Similarity.buildIvfPqIndex(df, coarse, codebooks)
    def ivfPqProbeIndex(queries: DataFrame, k: Int, nprobe: Int,
        coarse: Array[Array[Float]],
        codebooks: Array[Array[Array[Float]]]): DataFrame =
      Similarity.ivfPqProbeIndex(df, queries, k, nprobe, coarse,
        codebooks)
    def ivfPqIndexReport(corpus: DataFrame,
        codebooks: Array[Array[Array[Float]]], nlist: Int): DataFrame =
      Similarity.ivfPqIndexReport(df, corpus, codebooks, nlist)

    // sampling
    def prioritySample(idCol: String, weightCol: String,
        k: Int): DataFrame =
      Packing.prioritySample(df, idCol, weightCol, k)
    def prioritySampleByGroup(groupCol: String, idCol: String,
        weightCol: String, k: Int): DataFrame =
      Packing.prioritySampleByGroup(df, groupCol, idCol, weightCol, k)

    // data-quality gate
    def qualityCheck(suite: Seq[Quality.Constraint]): DataFrame =
      Quality.check(df, suite)
    def qualityProfile(cols: Seq[String]): DataFrame =
      Quality.profile(df, cols)
    def qualityEnforce(suite: Seq[Quality.Constraint]): DataFrame =
      Quality.enforce(df, suite)
    def psiAgainst(newDf: DataFrame, c: String,
        edges: Seq[Double]): DataFrame =
      Quality.psi(df, newDf, c, edges)
    def psiByGroupAgainst(newDf: DataFrame, c: String, groupCol: String,
        edges: Seq[Double]): DataFrame =
      Quality.psiByGroup(df, newDf, c, groupCol, edges)
    def qualityProfileShard(cols: Seq[String]): DataFrame =
      Quality.profileShard(df, cols)
    def qualityApproxProfile(cols: Seq[String]): DataFrame =
      Quality.approxProfile(df, cols)
    def kAnonymity(levels: Seq[(String, Seq[Column])], k: Int): DataFrame =
      Quality.kAnonymity(df, levels, k)
    def lDiversity(levels: Seq[(String, Seq[Column])], sensitive: Column,
        l: Int): DataFrame =
      Quality.lDiversity(df, levels, sensitive, l)
    def tCloseness(levels: Seq[(String, Seq[Column])], sensitive: Column,
        t: Double): DataFrame =
      Quality.tCloseness(df, levels, sensitive, t)

    // inverted-index retrieval
    def invertedIndex(idCol: String, textCol: String,
        maxDf: Option[Long] = None): DataFrame =
      Retrieval.invertedIndex(df, idCol, textCol, maxDf)
    def docLengths(idCol: String, textCol: String): DataFrame =
      Retrieval.docLengths(df, idCol, textCol)
    def conjunctiveProbe(terms: Seq[String]): DataFrame =
      Retrieval.conjunctiveProbe(df, terms)
    def phraseProbe(phrase: Seq[String]): DataFrame =
      Retrieval.phraseProbe(df, phrase)
    def bm25ProbeWith(docLens: DataFrame, terms: Seq[String],
        k: Int): DataFrame =
      Retrieval.bm25Probe(df, docLens, terms, k)

    // event analytics
    def attribution(userCol: String, tsCol: String, idCol: String,
        typeCol: String, valueCol: String, touchTypes: Seq[String],
        convType: String, lookbackSeconds: Long): DataFrame =
      Events.attribution(df, userCol, tsCol, idCol, typeCol, valueCol,
        touchTypes, convType, lookbackSeconds)
    def ewmaByKey(keyCol: String, tsCol: String, idCol: String,
        valueCol: String, alpha: Double, horizon: Int): DataFrame =
      Events.ewmaByKey(df, keyCol, tsCol, idCol, valueCol, alpha, horizon)

    // vectorizers
    def featureHash(idCol: String, textCol: String, dims: Int): DataFrame =
      TextAnalysis.featureHash(df, idCol, textCol, dims)

    // witnesses / splits / truncated retrieval
    def lshRecallReport(idCol: String, textCol: String,
        minJaccard: Double, k: Int, bands: Int,
        floorPct: Int = 90): DataFrame =
      Dedup.lshRecallReport(df, idCol, textCol, minJaccard, k, bands,
        floorPct)
    def entityTemporalSplit(keyCol: String, tsCol: String,
        trainEnd: String, testStart: String): DataFrame =
      Relational.entityTemporalSplit(df, keyCol, tsCol, trainEnd,
        testStart)
    def matryoshkaTopK(queries: DataFrame, k: Int, dims: Int): DataFrame =
      Similarity.matryoshkaTopK(df, queries, k, dims)

    // eval harness
    def binaryEval(pred: Column, truth: Column): DataFrame =
      Quality.binaryEval(df, pred, truth)
    def confidentMislabels(score: Column, label: Column,
        margin: Double): DataFrame =
      Quality.confidentMislabels(df, score, label, margin)
    def benfordReport(c: String): DataFrame =
      Quality.benfordReport(df, c)
    def concentrationReport(cols: Seq[String]): DataFrame =
      Quality.concentrationReport(df, cols)
    def madOutliers(grp: String, idCol: String, valueCol: String,
        k: Double): DataFrame =
      Relational.madOutliers(df, grp, idCol, valueCol, k)
    def calibrationBins(scoreCol: String, truth: Column,
        edges: Seq[Double]): DataFrame =
      Quality.calibrationBins(df, scoreCol, truth, edges)
    def ndcgBinary(nRel: DataFrame, k: Int): DataFrame =
      Similarity.ndcgBinary(df, nRel, k)
    def rboAgainst(other: DataFrame, k: Int, p: Double): DataFrame =
      Similarity.rboOverlap(df, other, k, p)
    def sourceOverlap(sourceCol: String, textCol: String): DataFrame =
      TextAnalysis.sourceOverlap(df, sourceCol, textCol)

    // unigram tokenizer
    def unigramTokenize(idCol: String, textCol: String,
        pieces: Seq[Unigram.Piece], maxPieceLen: Int): DataFrame =
      Unigram.tokenize(df, idCol, textCol, pieces, maxPieceLen)
  }

  /** Fusion entry point mirroring the operator object (not a DataFrame
    * method — it combines several ranked frames, none privileged). */
  def rrfFuse(legs: Seq[(String, DataFrame)], idCol: String,
      rankCol: String, topN: Int, k0: Int = 60): DataFrame =
    Similarity.rrfFuse(legs, idCol, rankCol, topN, k0)
}
