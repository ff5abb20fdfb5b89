package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-economy operators for training-data assembly: sequence packing
  * (fill fixed token-budget rows from variable-length documents) and
  * per-source token-budget sampling (apply mixture weights by token
  * count, not row count). Both are hash-deterministic — the same input
  * produces the same packs / kept set on every run, engine, and
  * partitioning — so results are reproducible and oracle-checkable.
  */
object Packing {

  /** BPE-ish token count of a text column (the same tokenizer as
    * TextAnalysis.textStats' n_tokens — one corpus-wide token
    * definition keeps budgets comparable across operators). */
  def tokenCount(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    size(TextFns.bpeishTokens(text)).cast("long")

  /** Sequence packing: assign every document to a pack so that no
    * pack's token total exceeds `budget` — the batch-assembly step
    * before LLM training (padding waste = 1 − fill_ratio). Greedy
    * sequential next-fit over a deterministic order: documents are
    * hash-assigned to `numGroups` independent groups, ordered within
    * each group by (hash, id), and packed by a single forward walk —
    * a doc that would overflow the open pack closes it and starts the
    * next. Docs longer than the budget are truncated to exactly
    * `budget` tokens (they fill a pack alone).
    *
    * Scale shape: the only sequential step is the per-group walk, run
    * as mapPartitions over a repartition(group)+sortWithinPartitions
    * exchange — O(1) state per task (no per-group buffers, unlike an
    * ordered-fold formulation which would hold a group's docs in one
    * aggregate value). `numGroups` is the parallelism knob: size it so
    * a group's docs fit a task's input split (groups ≈ corpus/10k docs
    * at 100 TB); packing quality is unaffected since packs never span
    * groups. The final per-pack rollup is one hash aggregate.
    *
    * Output: one row per pack — (pack_id, n_docs, total_tokens,
    * fill_ratio, doc_ids) with doc_ids comma-joined in pack order.
    * Requires a numeric id column (the deterministic order ties on id
    * cross-engine; string ids would collate differently per engine).
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      budget: Long, numGroups: Int = 256): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(numGroups > 0, "numGroups must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val h = TextFns.shingleHash(
      concat(col(idCol).cast("string"), lit("|pack")))
    val base = df.select(
      pmod(h, lit(numGroups.toLong)).as("g"),
      h.as("h"),
      col(idCol).cast("long").as("id"),
      lit(0L).as("cid"), // whole docs: a degenerate single-chunk grid
      least(tokenCount(col(textCol)), lit(budget)).as("t"))
    packWalk(base, budget).groupBy(col("g"), col("pack"))
      .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("total_tokens"),
        sort_array(collect_list(struct(col("pos"), col("id")))).as("__ps"))
      .select(
        concat(col("g").cast("string"), lit("-"),
          col("pack").cast("string")).as("pack_id"),
        col("n_docs"), col("total_tokens"),
        (col("total_tokens").cast("double") / budget).as("fill_ratio"),
        array_join(transform(col("__ps"),
          p => p.getField("id").cast("string")), ",").as("doc_ids"))
  }

  /** THE next-fit walk — the one sequential state machine both packing
    * flavors share (a boundary-rule change here changes both, and must
    * be mirrored in their recursive-CTE oracles). Items arrive as
    * (g, h, id, cid, t) and leave as (g, pack, pos, id, cid, t):
    * groups are contiguous sorted runs within a partition — order
    * (g, h, id, cid) — and the walk resets its (fill, pack) state on
    * every group change. t <= budget by construction upstream, so
    * "fill + t > budget" can only trip on a non-empty open pack —
    * every item lands in exactly one pack. */
  private def packWalk(base: DataFrame, budget: Long): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    base
      .repartition(col("g"))
      .sortWithinPartitions(col("g"), col("h"), col("id"), col("cid"))
      .as[(Long, Long, Long, Long, Long)]
      .mapPartitions { it =>
        var curG = 0L; var fill = 0L; var pack = 0L; var pos = 0L
        var started = false
        it.map { case (g, _, id, cid, t) =>
          if (!started || g != curG) {
            started = true; curG = g; pack = 0L; fill = t; pos = 0L
          } else if (fill + t > budget) { pack += 1; fill = t }
          else fill += t
          pos += 1
          (g, pack, pos, id, cid, t)
        }
      }
      .toDF("g", "pack", "pos", "id", "cid", "t")
  }

  /** RAG-splitter → batch-assembler compose: chunk every document into
    * overlapping word windows ([[TextAnalysis.chunkWords]]) and pack
    * the CHUNKS into token-budget rows ([[packSequences]]' greedy
    * next-fit walk) such that a document's chunks stay ADJACENT in
    * walk order — the group hash is the DOC's (so all of a doc's
    * chunks land in one group) and the within-group order is
    * (doc hash, doc id, chunk id). A doc may still straddle a pack
    * boundary (next-fit closes a full pack mid-doc — padding waste,
    * not adjacency, is the packing objective) but its chunks are never
    * interleaved with another doc's. Chunks longer than `budget`
    * tokens truncate to exactly `budget` (same rule as
    * packSequences). Scale shape identical to packSequences: one
    * repartition+sort exchange, O(1)-state walk, one rollup agg;
    * chunking adds no shuffle (pure expression + one posexplode).
    * Output: (pack_id, n_chunks, n_docs, total_tokens, fill_ratio,
    * chunk_ids) with chunk_ids "docId:chunkId" comma-joined in pack
    * order.
    */
  def packChunks(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int, budget: Long,
      numGroups: Int = 256): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(numGroups > 0, "numGroups must be positive")
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      "need 0 <= overlap < chunkSize (the chunkWords contract)")
    val takenCols = Seq("__ws", "__wtc").filter(df.columns.contains)
    require(takenCols.isEmpty,
      s"input already has ${takenCols.mkString("/")} column(s) — rename " +
        "them; these names are reserved scratch space of packChunks " +
        "(the chunkWords convention)")
    val spark = df.sparkSession
    import spark.implicits._
    val stride = chunkSize - overlap
    val h = TextFns.shingleHash(
      concat(col(idCol).cast("string"), lit("|pack")))
    // a chunk's token count is the SUM of its words' counts (the
    // BPE-ish tokenizer never matches across whitespace), so tokenize
    // each word ONCE per doc and fold slices — the chunk-text route
    // would re-run the regex over every overlapping chunk (~1.5× the
    // text at 12/4) and materialize the chunk strings just to count
    // them. Same chunk grid as TextAnalysis.chunkWords (spec-pinned).
    val wordCounts = transform(col("__ws"),
      w => size(TextFns.bpeishTokens(w)).cast("long"))
    val base = df
      .withColumn("__ws", split(col(textCol),
        java.util.regex.Pattern.quote(" ")))
      .withColumn("__wtc", wordCounts)
      .select(
        pmod(h, lit(numGroups.toLong)).as("g"),
        h.as("h"),
        col(idCol).cast("long").as("id"),
        posexplode(transform(
          sequence(lit(0),
            floor((size(col("__ws")) - 1).cast("double") / stride)
              .cast("int")),
          k => least(
            aggregate(slice(col("__wtc"), k * stride + 1, lit(chunkSize)),
              lit(0L), _ + _),
            lit(budget)))).as(Seq("cid", "t")))
      .select(col("g"), col("h"), col("id"),
        col("cid").cast("long").as("cid"), col("t"))
    packWalk(base, budget).groupBy(col("g"), col("pack"))
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct(col("id")).as("n_docs"),
        sum(col("t")).as("total_tokens"),
        sort_array(collect_list(
          struct(col("pos"), col("id"), col("cid")))).as("__ps"))
      .select(
        concat(col("g").cast("string"), lit("-"),
          col("pack").cast("string")).as("pack_id"),
        col("n_chunks"), col("n_docs"), col("total_tokens"),
        (col("total_tokens").cast("double") / budget).as("fill_ratio"),
        array_join(transform(col("__ps"),
          p => concat(p.getField("id").cast("string"), lit(":"),
            p.getField("cid").cast("string"))), ",").as("chunk_ids"))
  }

  /** Token-budget sampling per key: keep each key's rows — in a
    * deterministic hash order — until the key's TOKEN budget is met,
    * then drop the rest. This is how mixture weights are actually
    * applied to a training corpus (a source's contribution is its
    * token count, not its row count; deterministicSampleByKey scales
    * rows by rate, this caps tokens absolutely). The row that crosses
    * the budget is kept (it completes the budget); keys absent from
    * `budgets` keep `defaultBudget`, and a negative budget means
    * unlimited. The order hash is DOMAIN-SEPARATED ("|budget" salt)
    * from both deterministicSplit's and deterministicSampleByKey's,
    * so budget cuts never correlate with split assignment or row
    * sampling.
    *
    * Scale shape: a key's rows must see a running token prefix — but a
    * single window partitioned by key would sort each key on ONE
    * reducer, and the overrepresented sources this operator exists to
    * cap are exactly the hot keys. Instead the prefix splits in two:
    * per-(key, bucket) token sums (one partial-agg shuffle; `buckets`
    * = high bits of the order hash, so bucket order IS hash order),
    * a bucket-level running sum (a window over ≤`buckets` rows per
    * key), joined back and completed by a row-level window partitioned
    * by (key, bucket) — per-reducer work drops by the bucket count,
    * ~1/buckets of the key. Output rows are EXACTLY the naive
    * key-partitioned window's (spec-verified).
    */
  def tokenBudgetSampleByKey(df: DataFrame, keyCol: String, idCol: String,
      textCol: String, budgets: Map[String, Long],
      defaultBudget: Long = -1L, buckets: Int = 1024): DataFrame = {
    val inCols = df.columns.toSeq
    val budgetCol = budgets.toSeq.sortBy(_._1).foldLeft(lit(defaultBudget)) {
      case (acc, (k, b)) => when(col(keyCol) === k, lit(b)).otherwise(acc)
    }
    withTokenPrefix(df, keyCol, idCol, textCol, buckets, "|budget")._1
      .filter(budgetCol < 0 || col("__pfx") < budgetCol)
      .select(inCols.map(col): _*)
  }

  /** Shared bucketed token-prefix machinery of the token-weighted
    * samplers: attaches `__t` (token count) and `__pfx` (the key's
    * EXCLUSIVE running token total in hash order — identical to the
    * naive key-partitioned window, spec-proven) to every row, plus a
    * per-key token-totals frame DERIVED FROM THE BUCKET SUMS — keys
    * rows, zero extra corpus scans. `salt` domain-separates the order
    * hash per consumer (budget cuts and mixture fractions must not
    * correlate). Returns (prefixed frame, totals (`__tk`, `__tot`)).
    */
  private def withTokenPrefix(df: DataFrame, keyCol: String,
      idCol: String, textCol: String, buckets: Int,
      salt: String): (DataFrame, DataFrame) =
    withCountPrefix(df.withColumn("__t", tokenCount(col(textCol))),
      keyCol, idCol, buckets, salt)

  /** The bucketed exclusive-prefix machinery over a PRECOMPUTED count
    * column `__t` (shared by the text-derived [[withTokenPrefix]] and
    * the id-count stream chunker): a hot key's running sum spreads
    * over `buckets` reducers instead of one. */
  private def withCountPrefix(dfWithT: DataFrame, keyCol: String,
      idCol: String, buckets: Int, salt: String,
      boundedKeys: Option[Int] = None): (DataFrame, DataFrame) = {
    val df = dfWithT
    require(buckets > 0 && (buckets & (buckets - 1)) == 0 &&
      buckets <= (1 << 28), "buckets must be a power of two <= 2^28")
    val shift = 28 - Integer.numberOfTrailingZeros(buckets)
    val withH = df
      .withColumn("__h", TextFns.shingleHash(
        concat(col(idCol).cast("string"), lit(salt))))
      .withColumn("__b", shiftright(col("__h"), shift))
    // bucket token totals, then the exclusive bucket prefix — tiny
    // (keys × buckets rows), so the window and the join-back are cheap
    val bucketSums0 = withH
      .groupBy(col(keyCol).as("__k"), col("__b").as("__bb"))
      .agg(sum(col("__t")).as("__bt"))
    // when the caller PROVES the key space is bounded (the stream
    // chunker's single logical key), a no-op limit at keys × buckets
    // rows makes that bound mechanically visible to the plan sweep:
    // Catalyst folds a CONSTANT key out of the bucket window's
    // partition spec, leaving a technically-unpartitioned window the
    // sweep would otherwise (rightly) reject — the vocabulary
    // post-limit convention, never an exemption by query name
    val bucketSums = boundedKeys match {
      case Some(k) => bucketSums0.orderBy(col("__k"), col("__bb"))
        .limit(k * buckets)
      case None => bucketSums0
    }
    val wb = Window.partitionBy(col("__k")).orderBy(col("__bb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketPfx = bucketSums
      .withColumn("__bpfx", coalesce(sum(col("__bt")).over(wb), lit(0L)))
      .select(col("__k"), col("__bb"), col("__bpfx"))
    // row prefix = bucket prefix + within-bucket exclusive prefix;
    // the within-bucket window partitions on (key, bucket) — a hot
    // key's sort spreads over `buckets` reducers instead of one
    val wr = Window.partitionBy(col(keyCol), col("__b"))
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixed = withH
      .join(bucketPfx,
        col(keyCol) === col("__k") && col("__b") === col("__bb"))
      .withColumn("__pfx",
        col("__bpfx") + coalesce(sum(col("__t")).over(wr), lit(0L)))
    val totals = bucketSums.groupBy(col("__k").as("__tk"))
      .agg(sum(col("__bt")).as("__tot"))
    (prefixed, totals)
  }

  /** TOKEN-weighted mixture sampling — [[mixtureSample]] with the
    * fractional epoch honored in token share instead of row share
    * (LLM mixture recipes weight TOKENS: a key whose fractional
    * remainder is f contributes its first f·total_tokens(key) of
    * tokens — in hash order — one extra epoch, so the realized token
    * mixture hits the recipe exactly at the prefix cut instead of
    * only in expectation). Integer epochs replay every row as in
    * mixtureSample; the fractional admit is `__pfx < f·total` over
    * the bucketed prefix machinery (shared with
    * [[tokenBudgetSampleByKey]] — same scale shape, hot keys spread
    * over `buckets` reducers; totals derive from the bucket sums,
    * zero extra corpus scans) under a "|mixtok" domain-separated
    * hash. Deterministic and SQL-replayable end-to-end. Output:
    * input columns + `epoch`.
    */
  def mixtureSampleByTokens(df: DataFrame, keyCol: String, idCol: String,
      textCol: String, weights: Map[String, Double],
      defaultWeight: Double = 1.0, epochName: String = "epoch",
      buckets: Int = 1024): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(w =>
      w >= 0 && w.isFinite), "mixture weights must be finite and >= 0")
    require(!df.columns.contains(epochName),
      s"input already has a '$epochName' column — rename it or pass " +
        "a different epochName")
    val inCols = df.columns.toSeq
    def perKey(f: Double => org.apache.spark.sql.Column)
        : org.apache.spark.sql.Column =
      weights.toSeq.sortBy(_._1).foldLeft(f(defaultWeight)) {
        case (acc, (k, w)) =>
          when(col(keyCol) === k, f(w)).otherwise(acc)
      }
    val wInt = perKey(w => lit(math.floor(w).toLong))
    val wFrac = perKey(w => lit(w - math.floor(w)))
    val (prefixed, totals) =
      withTokenPrefix(df, keyCol, idCol, textCol, buckets, "|mixtok")
    prefixed
      .join(broadcast(totals), col(keyCol) === col("__tk"))
      .withColumn("__n", wInt +
        when(col("__pfx") < wFrac * col("__tot"), 1L).otherwise(0L))
      .filter(col("__n") > 0)
      .withColumn(epochName,
        explode(sequence(lit(0L), col("__n") - 1)))
      .select((inCols :+ epochName).map(col): _*)
  }

  /** Weighted mixture sampling with UP-sampling — the LLM-mixture
    * primitive [[tokenBudgetSampleByKey]] lacks: a key's weight may
    * exceed 1, in which case its rows DUPLICATE (fractional epochs).
    * Weight w = ⌊w⌋ + f replays every row ⌊w⌋ times (epoch 0..⌊w⌋−1)
    * plus one more epoch for the deterministic ~f fraction of rows
    * whose id-hash bucket falls under f — so realized rates
    * concentrate tightly around w at any volume, and the SAME rows
    * carry the extra epoch on every run, engine, and partitioning
    * (eval contamination cannot shift between reprocessings). Epochs
    * materialize as one explode over a per-row sequence — a pure
    * generator, rows out = Σ w·n_key, no shuffle, no state; weight 0
    * drops the key (the filter runs BEFORE the generator, so dropped
    * rows never explode). The hash is md5-derived (SQL-replayable)
    * and DOMAIN-SEPARATED ("|mix") from the split/sample/budget
    * hashes — mixture membership must not correlate with split
    * assignment or the other samplers. Fractions quantize to 1/10000
    * (the deterministicSampleByKey convention). Keys absent from
    * `weights` get `defaultWeight`. Output: input columns + an
    * `epoch` long column (0-based; a row's epochs are dense 0..n−1,
    * so downstream shuffles can use (id, epoch) as a replay-stable
    * key).
    */
  def mixtureSample(df: DataFrame, keyCol: String, idCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0,
      epochName: String = "epoch"): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(w =>
      w >= 0 && w.isFinite), "mixture weights must be finite and >= 0")
    require(!df.columns.contains(epochName),
      s"input already has a '$epochName' column — rename it or pass " +
        "a different epochName")
    val inCols = df.columns.toSeq
    def perKey(f: Double => Long) =
      weights.toSeq.sortBy(_._1).foldLeft(lit(f(defaultWeight))) {
        case (acc, (k, w)) =>
          when(col(keyCol) === k, lit(f(w))).otherwise(acc)
      }
    val wInt = perKey(w => math.floor(w).toLong)
    val wFracBp = perKey(w => math.round((w - math.floor(w)) * 10000))
    val bucket = pmod(TextFns.shingleHash(
      concat(col(idCol).cast("string"), lit("|mix"))), lit(10000L))
    df.withColumn("__n",
        wInt + when(bucket < wFracBp, 1L).otherwise(0L))
      .filter(col("__n") > 0)
      .withColumn(epochName,
        explode(sequence(lit(0L), col("__n") - 1)))
      .select((inCols :+ epochName).map(col): _*)
  }

  /** Materialize packs as the id sequences a dataloader actually
    * reads: join a [[packSequences]] pack table to a per-doc encoded
    * table (TextAnalysis.bpeEncodeIds output, or any (id, token_ids)
    * frame) and flatten each pack's member arrays IN PACK ORDER.
    * Per-pack state is one collect_list bounded by the pack budget —
    * never corpus-sized. ids_sig is md5 of the space-joined flattened
    * ids (cross-engine replayable: equals concatenating the members'
    * per-doc id strings with single spaces in pack order). NOTE the
    * unit honesty: packSequences budgets in the corpus-wide
    * whitespace-ish token unit while the encoded ids count BPE
    * tokens, so n_ids ≠ total_tokens in general — and a single
    * over-budget doc (the least() termination cap) ships its FULL id
    * sequence.
    *
    * Contract honesty: the join to `encoded` is LEFT — a pack member
    * absent from the encoded frame (or encoded as a null id array,
    * e.g. a null-text doc) contributes NO ids but is WITNESSED in the
    * in-plan `n_missing` column instead of silently shrinking the
    * pack or nulling it wholesale; n_docs always counts the pack
    * MANIFEST. `encoded` must hold at most one row per id (the
    * bpeEncodeIds shape) — a duplicated id would repeat its ids in
    * the flatten. Output: (pack_id, n_docs, n_missing, n_ids,
    * input_ids, ids_sig). */
  def materializePackedIds(packs: DataFrame, encoded: DataFrame,
      idCol: String): DataFrame =
    packs
      .select(col("pack_id"),
        posexplode(split(col("doc_ids"), ",")).as(Seq("__ord", "__doc")))
      .join(encoded.select(col(idCol).cast("string").as("__doc"),
        col("token_ids")), Seq("__doc"), "left")
      .groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        count_if(col("token_ids").isNull).as("n_missing"),
        flatten(transform(
          filter(
            sort_array(collect_list(struct(col("__ord"), col("token_ids")))),
            m => m.getField("token_ids").isNotNull),
          _.getField("token_ids"))).as("input_ids"))
      .select(col("pack_id"), col("n_docs"), col("n_missing"),
        size(col("input_ids")).cast("long").as("n_ids"),
        col("input_ids"),
        md5(array_join(transform(col("input_ids"), _.cast("string")), " "))
          .as("ids_sig"))

  /** GPT-style CONTIGUOUS token-stream chunking — the other canonical
    * pretraining format next to [[packSequences]]' no-split next-fit:
    * concatenate every document's token ids into ONE deterministic
    * stream (md5-hash order with id tie-break — the training-order
    * convention, reprocessing-stable) and slice it into fixed
    * `seqLen` sequences; documents SPLIT across chunk boundaries, so
    * every chunk except the last is exactly full (zero padding waste,
    * the trade packSequences refuses by keeping docs whole).
    *
    * Plan: the per-doc exclusive stream offset comes from the shared
    * bucketed-prefix machinery (single logical key spread over
    * `buckets` reducers — never a one-reducer running sum), absolute
    * positions are per-row arithmetic (pos = offset + index), and ONE
    * shuffle groups tokens by chunk — the inherent cost of
    * re-chunking a stream (every token moves once; chunk key
    * cardinality = total_tokens / seqLen, unbounded-cardinality-safe).
    * Per-chunk state is bounded by seqLen. Null-id docs (null-text
    * encodes) contribute nothing. Output: (chunk_id, n_ids, complete,
    * input_ids, ids_sig) — `complete` marks the one possibly-partial
    * tail chunk. */
  def chunkTokenStream(encoded: DataFrame, idCol: String,
      seqLen: Int, buckets: Int = 1024): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val rows = encoded
      .select(col(idCol), col("token_ids"))
      .filter(col("token_ids").isNotNull)
      .withColumn("__t", size(col("token_ids")).cast("long"))
    val (prefixed, _) =
      withCountPrefix(rows.withColumn("__key", lit("stream")),
        "__key", idCol, buckets, "|stream", boundedKeys = Some(1))
    val toks = prefixed
      .select(col("__pfx"), posexplode(col("token_ids")).as(Seq("__i", "__id")))
      .select((col("__pfx") + col("__i")).as("__pos"), col("__id"))
      .withColumn("__chunk", (col("__pos") / seqLen).cast("long"))
      .withColumn("__off", pmod(col("__pos"), lit(seqLen.toLong)))
    toks.groupBy(col("__chunk").as("chunk_id"))
      .agg(
        transform(
          sort_array(collect_list(struct(col("__off"), col("__id")))),
          _.getField("__id")).as("input_ids"))
      .select(col("chunk_id"),
        size(col("input_ids")).cast("long").as("n_ids"),
        (size(col("input_ids")) === seqLen).as("complete"),
        col("input_ids"),
        md5(array_join(transform(col("input_ids"), _.cast("string")), " "))
          .as("ids_sig"))
  }

  /** Temperature (share^α) mixture weights — the multilingual-recipe
    * renormalization (XLM-R convention, α ≈ 0.3–0.7 flattens toward
    * uniform, α = 1 keeps the natural mixture): from the corpus's own
    * per-key token totals, p_k = tokens_k / T and
    * w_k = p_k^(α−1) / Σ_j p_j^α — the per-key epoch multiplier that
    * makes the TOKEN-weighted effective mixture follow q_k ∝ p_k^α
    * while the total token budget stays at the natural T
    * (Σ_k w_k·tokens_k = T up to the sampler's fractional-admit
    * granularity). ONE key-bounded aggregate collects to the driver
    * (the budgets-map convention — weights are a tiny fit artifact);
    * a zero-token key gets weight 0 (nothing to sample; the α < 1
    * pole is unreachable).
    *
    * Cross-engine determinism is STRUCTURAL, not rounding-dependent:
    * p^(α−1) is derived as p^α / p (a correctly-rounded IEEE division
    * of the same p^α both engines computed for z — never a second
    * engine-approximated pow), z folds the per-key p^α terms in
    * key-sorted order (the list_sort + list_aggregate oracle
    * convention), and at the conventional α = 0.5 the power itself is
    * `sqrt` — correctly rounded per IEEE 754, so bit-identical in any
    * engine, where pow(x, 0.5) is only faithfully rounded and may
    * differ by an ulp between libm implementations. Only non-half α
    * retain a pow() ulp exposure; the 6-decimal HALF_UP rounding
    * (applied identically in both engines on the exact binary double)
    * still absorbs it there. */
  def temperatureWeights(df: DataFrame, keyCol: String, textCol: String,
      alpha: Double): Map[String, Double] = {
    require(alpha > 0 && alpha.isFinite,
      "alpha must be positive and finite")
    val totals = df.groupBy(col(keyCol).cast("string").as("__k"))
      .agg(sum(tokenCount(col(textCol))).as("__t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val t = totals.values.sum.toDouble
    def powAlpha(x: Double): Double =
      if (alpha == 0.5) math.sqrt(x) else math.pow(x, alpha)
    val ordered = totals.toSeq.sortBy(_._1)
      .map { case (k, n) => (k, n, n / t) }
    val z = ordered.foldLeft(0.0) { case (acc, (_, _, p)) =>
      acc + powAlpha(p) }
    ordered.map { case (k, n, p) =>
      k -> (if (n == 0L) 0.0
      else new java.math.BigDecimal(powAlpha(p) / p / z)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue)
    }.toMap
  }

  /** [[mixtureSampleByTokens]] with weights derived by
    * [[temperatureWeights]] — the one-call temperature-sampling
    * operator. Same output contract as the explicit-weights sampler;
    * α = 1 degenerates to every row exactly once at epoch 0. */
  def temperatureMixtureByTokens(df: DataFrame, keyCol: String,
      idCol: String, textCol: String, alpha: Double,
      epochName: String = "epoch", buckets: Int = 1024): DataFrame =
    mixtureSampleByTokens(df, keyCol, idCol, textCol,
      temperatureWeights(df, keyCol, textCol, alpha),
      defaultWeight = 0.0, epochName = epochName, buckets = buckets)

  /** End-to-end curation DAG — the full pre-training assembly line as
    * ONE composed operator: gopher gate → intra-doc line dedup →
    * [optional frozen NB-classifier gate] → exact-dup keep-best →
    * per-source token budget → sequence packing.
    * The stages compose WITHOUT re-scanning the corpus: every per-row
    * signal (keep, quality, cleaned text) fuses into a single
    * projection over the scan (TextAnalysis.withKeepQuality +
    * withDedupedText preserve carried columns), and that enriched
    * frame is materialized ONCE (eager localCheckpoint — the
    * curationReport convention; Spark does NOT reuse forked DAG
    * branches across stages, so the keep-best self-join and the
    * budget/pack consumers would otherwise each re-run the scan).
    * Input scan multiplicity is exactly 1 — spec-pinned with a
    * per-row accumulator. Every stage is the library's oracle-gated
    * operator, parameters surfaced unchanged; keep-best ties resolve
    * to the minimum id (equal cleaned content ⇒ equal quality), so
    * the survivor set is deterministic. (localCheckpoint spills to
    * EXECUTOR-LOCAL storage — right for a single job; a multi-day
    * 100 TB curation run would write the enriched frame to durable
    * parquet between stages instead, same plan shape, and gain
    * restartability.)
    * Output: the [[packSequences]] pack table over the curated set —
    * (pack_id, n_docs, total_tokens, fill_ratio, doc_ids).
    */
  def curateAndPack(df: DataFrame, idCol: String, sourceCol: String,
      textCol: String, budgets: Map[String, Long], packBudget: Long,
      packGroups: Int = 256, delim: String = "\n",
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minStopwords: Int = 2,
      nbModel: Option[DataFrame] = None,
      nbThreshold: Double = 0.0): DataFrame = {
    val baseCols = Seq(col(idCol), col(sourceCol), col("quality"))
    val outCols =
      if (nbModel.isDefined)
        // the NB stage scores the RAW text (the preprocessing the
        // model was FIT on — scoring the line-deduped text instead
        // shifts every token-frequency signal the classifier learned
        // and mis-gates wholesale), so it rides the checkpoint too
        baseCols :+ col(textCol).as("__raw") :+ col("__clean").as(textCol)
      else baseCols :+ col("__clean").as(textCol)
    val enriched = TextAnalysis.withDedupedText(
        TextAnalysis.withKeepQuality(
            df.select(col(idCol), col(sourceCol), col(textCol)),
            textCol, minWords, maxWords, minMeanWordLen, maxMeanWordLen,
            maxSymbolRatio, minStopwords)
          .filter(col("keep")),
        textCol, "__clean", delim)
      .select(outCols: _*)
      .localCheckpoint(true)
    // optional frozen-model quality stage AFTER the heuristic gate —
    // the classifier-distillation insertion point of a real pipeline
    // (CCNet/DCLM shape): score the gated survivors against the
    // broadcast nbQualityModel artifact, keep log_odds > threshold.
    // Reads the checkpoint, never the corpus — the one-scan pin is
    // untouched (spec-held). The model is a FIT ARTIFACT the caller
    // built (fitting inside the same query would re-scan the corpus —
    // the text_nb_quality query does that deliberately; production
    // passes the persisted table).
    val gated = nbModel match {
      case Some(m) =>
        val scored = TextAnalysis.scoreAgainstNbModel(
          enriched.select(col(idCol), col("__raw")), m, idCol, "__raw")
        // at the default threshold 0 the gate IS predicted_keep (the
        // UNROUNDED sign — gating on the 4dp log_odds column would
        // diverge from the standalone scorer for log-odds in
        // (0, 5e-5)); a nonzero threshold compares the 4dp calibrated
        // score, quantizing the knob to 1e-4 steps (the score column
        // is the cross-engine-stable artifact)
        val pass =
          if (nbThreshold == 0.0) col("predicted_keep")
          else col("log_odds") > nbThreshold
        // pin the gate's output: keepBest + the survivors join consume
        // `gated` three times, and un-pinned each consumer re-ran the
        // NB scoring aggregate (r18 final-plan audit)
        enriched.join(scored.filter(pass).select(col(idCol)), idCol)
          .drop("__raw")
          .localCheckpoint(true)
      case None => enriched
    }
    val kept = Dedup.keepBest(gated,
      gated.select(col(idCol), col("quality")), idCol, textCol)
    val survivors = gated.join(
      kept.select(col("keep_id").as(idCol)), idCol)
    packSequences(
      tokenBudgetSampleByKey(survivors, sourceCol, idCol, textCol,
        budgets),
      idCol, textCol, packBudget, packGroups)
  }

  /** 2^60 as an exact double — the denominator that turns a 60-bit
    * md5-derived integer into a uniform in (0, 1]. A power of two, so
    * the division only shifts the exponent (no rounding). */
  private val TwoPow60: Double = 1152921504606846976.0d

  /** Per-row sampling priority for weighted sampling WITHOUT
    * replacement — Duffield–Lund–Thorup priority sampling (JACM 2007):
    * q_i = w_i / u_i with u_i uniform on (0, 1]. Taking the k largest
    * priorities samples row i with probability ~ min(1, w_i/τ), and
    * ŵ_i = max(w_i, τ) (τ = the (k+1)-th priority) is an unbiased
    * subset-sum estimator. u_i derives from the md5 of the id plus a
    * salt (the shingleHash 15-hex-digit convention, 60 bits), so the
    * sample is a pure function of ids — reproducible across runs,
    * partitionings, and engines. Every arithmetic step is an IEEE
    * basic op (int→double conversion, division — both correctly
    * rounded), so a second engine computing the same expression shape
    * gets bit-identical priorities: no libm, no rounding at the edge.
    */
  def priorityCol(id: org.apache.spark.sql.Column,
      weight: org.apache.spark.sql.Column,
      salt: String): org.apache.spark.sql.Column = {
    val h = conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 15),
      16, 10).cast("long")
    weight.cast("double") / ((h + lit(1L)).cast("double") / lit(TwoPow60))
  }

  /** Weighted sample of (up to) `k` rows without replacement by
    * priority sampling — the row-level weighted subsampler a curation
    * pipeline uses to cut a corpus to a budget while (a) favoring
    * high-weight rows, (b) keeping the result a deterministic function
    * of ids, and (c) shipping an unbiased estimator (`w_hat`) with
    * which the sample reconstructs any subset-sum of the full corpus
    * (Σ ŵ over sampled rows in a class estimates Σ w over ALL rows in
    * that class — the property plain top-k-by-weight lacks).
    *
    * Plan shape: priorities are per-row expressions; the k+1 survivors
    * come from ONE TakeOrderedAndProject (per-partition bounded heaps,
    * k+1 rows per task cross the wire — never a global sort); the
    * threshold τ and ranks are then computed on that ≤ k+1-row frame
    * (driver-bounded by the sample size, not the data).
    *
    * Weight hygiene: the DLT estimator assumes nonnegative weights, so
    * NULL and negative weights are EXCLUDED up front (a NULL weight
    * would otherwise yield a NULL priority, and a negative one a
    * negative "sample" row padding an undersized top-k — both outside
    * the estimator's contract). Zero-weight rows stay eligible: their
    * priority is 0, so they enter only when fewer than k positive-weight
    * rows exist, and then τ = 0 gives them ŵ = 0 — still exact. If the
    * filtered input has ≤ k rows the whole input is the sample and
    * τ = 0 (ŵ = w exactly — the DLT degenerate case).
    *
    * Output: (id, weight double, priority double, tau double,
    * w_hat double) — `tau` constant across rows; `w_hat` =
    * max(weight, τ), the unbiased per-row estimate. */
  /** Output columns the samplers claim — an input id/group column with
    * one of these names would be silently shadowed, so refuse loudly
    * (the mixtureSample reserved-column convention). */
  private val PriorityReserved = Set("weight", "priority", "tau", "w_hat")

  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: String = "|prio"): DataFrame = {
    require(k >= 1, s"prioritySample k out of range: $k")
    require(!PriorityReserved.contains(idCol),
      s"prioritySample: id column '$idCol' collides with an output column")
    val scored = df
      .where(col(weightCol).isNotNull && col(weightCol).cast("double") >= 0)
      .select(col(idCol),
        col(weightCol).cast("double").as("weight"),
        priorityCol(col(idCol), col(weightCol), salt).as("priority"))
    // k+1 largest priorities: bounded heap, not a sort
    val top = scored.orderBy(col("priority").desc, col(idCol)).limit(k + 1)
    val ranked = Relational.withScalableOrdinal(top,
      Seq(col("priority").desc, col(idCol)), "__rank")
    val tau = ranked.agg(coalesce(
      min(when(col("__rank") === (k + 1), col("priority"))), lit(0.0))
      .as("tau"))
    ranked.filter(col("__rank") <= k)
      .crossJoin(broadcast(tau))
      .select(col(idCol), col("weight"), col("priority"), col("tau"),
        greatest(col("weight"), col("tau")).as("w_hat"))
  }

  /** [[prioritySample]] stratified by a group column — `k` rows per
    * group (per-source quotas, the mixture-shaped flavor). One window
    * PARTITIONED by the group (never a global window): fan-in per
    * reducer is bounded by the largest group, and at 100 TB the group
    * count (sources, languages, shards) is the parallelism. τ and
    * ŵ are per-group, so per-group subset-sums stay unbiased. */
  def prioritySampleByGroup(df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, k: Int, salt: String = "|prio"): DataFrame = {
    require(k >= 1, s"prioritySampleByGroup k out of range: $k")
    Seq("id" -> idCol, "group" -> groupCol).foreach { case (role, c) =>
      require(!PriorityReserved.contains(c),
        s"prioritySampleByGroup: $role column '$c' collides with an " +
          "output column")
    }
    val scored = df
      .where(col(weightCol).isNotNull && col(weightCol).cast("double") >= 0)
      .select(col(groupCol), col(idCol),
        col(weightCol).cast("double").as("weight"),
        priorityCol(col(idCol), col(weightCol), salt).as("priority"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("priority").desc, col(idCol))
    scored.withColumn("__rank", row_number().over(w))
      .withColumn("tau",
        coalesce(max(when(col("__rank") === (k + 1), col("priority")))
          .over(Window.partitionBy(col(groupCol))), lit(0.0)))
      .filter(col("__rank") <= k)
      .select(col(groupCol), col(idCol), col("weight"), col("priority"),
        col("tau"), greatest(col("weight"), col("tau")).as("w_hat"))
  }
}
