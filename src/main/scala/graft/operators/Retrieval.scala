package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inverted-index retrieval — the lexical mirror of the ANN stack's
  * persisted-index loop (`Similarity.buildIvfPqIndex` → probe). The
  * existing [[TextAnalysis.bm25Scores]] rescans the whole corpus per
  * query batch; a retrieval workload pays that once at INDEX BUILD and
  * then answers every query from the postings of its own terms only.
  * At 100 TB the index is written partitioned/bucketed by term, so a
  * probe is a partition-pruned scan of |query terms| postings lists —
  * the corpus itself is never touched again.
  *
  * Index layout (one row per (term, document) pair):
  * `(term, df, doc_id, tf, positions)` — `df` is denormalized onto
  * every posting so a probe needs no side lookup for idf, `positions`
  * (ascending 0-based token offsets) serve phrase queries. Postings
  * count = Σ per-doc distinct terms ≤ corpus token count; per-row
  * state is bounded by document length, never corpus size.
  *
  * Determinism: tf/df/positions are exact integers from exact
  * grouping; the only float surface is the BM25 probe, which reuses
  * the [[TextAnalysis.bm25Scores]] expression shape verbatim (fixed
  * per-term expression tree over pivoted integer tfs, round(·, 4) at
  * the output edge), so probe and full-scan scores are bit-identical
  * (spec-asserted).
  */
object Retrieval {

  /** Build the inverted index: one row per (term, doc) with term
    * frequency, ascending positions, and the term's document
    * frequency. `maxDf` (if set) drops terms whose df exceeds it —
    * the classic stop-term cap that bounds the longest postings list
    * (at web scale the df histogram is zipfian; the cap turns the
    * worst list from O(corpus) into O(maxDf)).
    *
    * Scale shape: posexplode → two hash aggregates ((term, doc) then
    * term) + one term-keyed equi-join — all shuffles on term-prefixed
    * keys, partial-aggregated map-side. Write the result
    * `.repartition(col("term")).write.bucketBy(term)` and probes
    * become partition-pruned point reads. */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
      maxDf: Option[Long] = None): DataFrame = {
    val post = postings(df, idCol, textCol)
    val dfs = termDfs(post)
    val capped = maxDf.fold(dfs)(cap => dfs.where(col("df") <= cap))
    post.join(capped, "term")
      .select(col("term"), col("df"), col("doc_id"), col("tf"),
        col("positions"))
  }

  /** The df-free postings half of the index artifact — what the
    * INCREMENTAL loop persists (df denormalization would go stale the
    * moment arrivals add documents; the split artifact keeps postings
    * append-only and the df table merge-updatable). Output:
    * (term, doc_id, tf, positions). */
  def postings(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), TextFns.words(col(textCol)).as("__w"))
      .select(col("doc_id"), posexplode(col("__w")).as(Seq("pos", "term")))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos").cast("long"))).as("positions"))

  /** Document frequencies of a [[postings]] table. (term, doc_id) is
    * unique there, so df is a plain count — no countDistinct Expand. */
  def termDfs(post: DataFrame): DataFrame =
    post.groupBy(col("term")).agg(count(lit(1)).as("df"))

  /** Advance a persisted postings index with newly-admitted documents
    * — the maintenance half of the incremental retrieval loop (the
    * advanceIvfPqIndex / advanceWindowHashIndex shape). Unlike the
    * hash indexes, postings have no canonical-slot competition: a new
    * document only APPENDS (term, doc) rows, and — because arrival doc
    * ids are disjoint from indexed ones — df is ADDITIVE, so the df
    * table updates by a vocabulary-bounded outer merge summing the two
    * sides. Nothing over the existing postings recomputes, the corpus
    * is never rescanned.
    *
    * Idempotent at document granularity: an arrival whose doc_id the
    * postings already contain is dropped whole (anti-join on doc_id),
    * so a replayed batch contributes nothing and df never
    * double-counts. Ids are immutable-content handles (the reserved-id
    * contract): re-submitting different text under an indexed id is
    * ignored, not merged. Equals a rebuild over corpus ∪ arrivals
    * row-for-row (spec-pinned).
    *
    * Returns (postings ∪ new postings, merged dfs). */
  def advancePostingsIndex(post: DataFrame, dfs: DataFrame,
      newDocs: DataFrame, idCol: String,
      textCol: String): (DataFrame, DataFrame) = {
    val admitted = postings(newDocs, idCol, textCol)
      .join(post.select(col("doc_id")).distinct(), Seq("doc_id"),
        "left_anti")
    val newDfs = dfs
      .select(col("term"), col("df").as("__df_old"))
      .join(termDfs(admitted).select(col("term"), col("df").as("__df_new")),
        Seq("term"), "full")
      .select(col("term"),
        (coalesce(col("__df_old"), lit(0L)) +
          coalesce(col("__df_new"), lit(0L))).as("df"))
    (post.unionByName(admitted), newDfs)
  }

  /** Per-document token counts — the doc-length side table of the
    * index artifact (BM25 needs dl and avgdl). One scan, one
    * doc-keyed aggregate-free projection. */
  def docLengths(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
      size(TextFns.words(col(textCol))).cast("long").as("dl"))

  /** Per-term index statistics — the vocabulary-bounded health report
    * of a postings build: document frequency, total and max term
    * frequency. What a capacity planner reads to pick `maxDf` and to
    * size the term buckets (the df histogram IS the skew profile). */
  def indexStats(index: DataFrame): DataFrame =
    index.groupBy(col("term"))
      .agg(max(col("df")).as("df"), sum(col("tf")).as("total_tf"),
        max(col("tf")).as("max_tf"))

  /** Conjunctive (AND-of-terms) probe: documents containing EVERY
    * query term, with the per-doc total tf as a crude rank signal.
    * Cost: |terms| postings lists (partition-pruned on a term-bucketed
    * index), one doc-keyed aggregate over their union — bounded by the
    * SHORTEST postings list's df in output and by Σ df in input;
    * the corpus is never scanned. */
  def conjunctiveProbe(index: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "conjunctiveProbe: no terms")
    val distinctTerms = terms.distinct
    index.where(col("term").isin(distinctTerms: _*))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("tf")).as("total_tf"))
      .where(col("n_terms") === distinctTerms.size)
  }

  /** Exact phrase probe: documents containing `phrase` as consecutive
    * tokens, with the occurrence count. Anchors on the FIRST word's
    * positions and intersects each later word's positions array at
    * offset i via `array_contains` — every join is a doc-keyed
    * equi-join between postings lists (never doc×doc), and per-row
    * work is bounded by document length. */
  def phraseProbe(index: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, "phraseProbe: phrase needs >= 2 words")
    val anchors = index.where(col("term") === phrase.head)
      .select(col("doc_id"), explode(col("positions")).as("__p"))
    phrase.zipWithIndex.drop(1).foldLeft(anchors) {
      case (cand, (w, i)) =>
        cand.join(
          index.where(col("term") === w)
            .select(col("doc_id"), col("positions").as(s"__pos_$i")),
          "doc_id")
          .where(array_contains(col(s"__pos_$i"), col("__p") + lit(i.toLong)))
          .select(col("doc_id"), col("__p"))
    }.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_occurrences"))
  }

  /** BM25 top-k FROM THE INDEX — the production retrieval shape: reads
    * only the query terms' postings plus the two bounded artifacts
    * (doc-length table keyed by doc, one corpus-stats row), scores the
    * candidate union, and take-ordered-projects the top `k`. Emits
    * exactly [[TextAnalysis.bm25Scores]]`.filter(bm25 > 0)` (a matching
    * term always has idf > 0, so match ⇒ score > 0) ranked by
    * (bm25 desc, doc_id) — the full-scan and index paths cannot drift
    * (spec-asserted equal).
    *
    * Per-term tfs pivot to integer columns in ONE doc-keyed aggregate,
    * then the score is the same fixed expression tree as the scan
    * flavor — summation order across terms is pinned by the plan, not
    * by row arrival, so scores are bit-identical across engines and
    * partitionings. */
  def bm25Probe(index: DataFrame, docLens: DataFrame, terms: Seq[String],
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25Probe: no terms")
    // corpus stats: N + Σdl (exact integer sums) — one broadcast row
    val stats = docLens.agg(
      count(lit(1)).cast("double").as("__N"),
      sum(col("dl")).cast("double").as("__sumdl"))
    // per-term df off the candidates' own denormalized df column —
    // no second index pass; absent terms coalesce to df = 0
    val cand = index.where(col("term").isin(terms.distinct: _*))
    val dfCols = terms.zipWithIndex.map { case (t, i) =>
      coalesce(max(when(col("term") === t, col("df"))), lit(0L))
        .cast("double").as(s"__df_$i")
    }
    val dfRow = cand.agg(dfCols.head, dfCols.tail: _*)
    // one doc-keyed aggregate pivots tf per term to integer columns
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      coalesce(sum(when(col("term") === t, col("tf"))), lit(0L))
        .cast("double").as(s"__tf_$i")
    }
    val perDoc = cand.groupBy(col("doc_id"))
      .agg(tfCols.head, tfCols.tail: _*)
      .join(docLens, "doc_id")
      .join(broadcast(stats))
      .join(broadcast(dfRow))
    val score = terms.zipWithIndex.map { case (_, i) =>
      val tf = col(s"__tf_$i")
      val dfT = col(s"__df_$i")
      val idf = log((col("__N") - dfT + 0.5) / (dfT + 0.5) + 1.0)
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) +
          lit(b) * col("dl").cast("double") / (col("__sumdl") / col("__N"))))
    }.reduce(_ + _)
    val scored = perDoc.select(col("doc_id"), round(score, 4).as("bm25"))
      // filter on the ROUNDED score, exactly like the scan flavor's
      // .filter(bm25 > 0) and the oracle's WHERE bm25 > 0: a raw score
      // can be positive yet round to 0.0000 (near-ubiquitous term at
      // large N), and the two paths must agree at that edge
      .where(col("bm25") > 0)
    Relational.withScalableOrdinal(scored,
        Seq(col("bm25").desc, col("doc_id")), "rank")
      .where(col("rank") <= k)
      .select(col("doc_id"), col("bm25"), col("rank"))
  }
}
