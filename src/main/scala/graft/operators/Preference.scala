package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Post-training data assembly — preference-pair construction (DPO /
  * RLHF reward modeling) and chat-template rendering with loss-mask
  * offsets (instruction tuning, train-on-response-only). The upstream
  * corpus operators (gates, dedup, packing) produce documents; these
  * two turn documents into the (chosen, rejected) and (rendered,
  * masked-span) shapes the post-training stage actually consumes.
  */
object Preference {

  /** Build one (chosen, rejected) preference pair per group: the
    * argmax-score row is chosen, the argmin-score row rejected, ties
    * broken deterministically by id (asc for chosen, desc for
    * rejected, so a fully-tied group still yields two DISTINCT rows).
    * Groups with a single candidate, or whose best-minus-worst margin
    * is below `minMargin`, drop — a pair the scorer can't separate is
    * training noise (the DPO data-quality convention).
    *
    * Scale shape: two row_number windows partitioned on the group key
    * plus one group-keyed self-join — every exchange hashes the group
    * key, per-group window state is O(1), and the pair frame is one
    * row per group. No driver-side anything.
    *
    * Output: (groupCol, chosen_id, rejected_id, chosen_score,
    * rejected_score, margin). */
  def preferencePairs(df: DataFrame, idCol: String, groupCol: String,
      scoreCol: String, minMargin: Double = 0.0): DataFrame = {
    val byBest = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val byWorst = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).asc, col(idCol).desc)
    val slim = df.select(col(groupCol), col(idCol), col(scoreCol))
    val chosen = slim.withColumn("__rn", row_number().over(byBest))
      .where(col("__rn") === 1)
      .select(col(groupCol), col(idCol).as("chosen_id"),
        col(scoreCol).cast("double").as("chosen_score"))
    val rejected = slim.withColumn("__rn", row_number().over(byWorst))
      .where(col("__rn") === 1)
      .select(col(groupCol), col(idCol).as("rejected_id"),
        col(scoreCol).cast("double").as("rejected_score"))
    chosen.join(rejected, groupCol)
      .where(col("chosen_id") =!= col("rejected_id"))
      .withColumn("margin", col("chosen_score") - col("rejected_score"))
      .where(col("margin") >= minMargin)
  }

  /** Render documents into a single-turn chat transcript with special
    * role markers and the character span of the assistant response —
    * the loss mask: tokens inside [mask_start, mask_end) train, the
    * prompt does not. The first `promptWords` whitespace tokens become
    * the user turn, the remainder the assistant turn; documents too
    * short to have a non-empty response drop.
    *
    * One per-row projection — scan-speed, stream-ready, zero
    * exchanges (the gopherRules shape).
    *
    * Output: (idCol, rendered, mask_start, mask_end, n_tokens,
    * n_tokens_masked) — offsets are 0-based character positions into
    * `rendered`; length(rendered's assistant span) == mask_end −
    * mask_start by construction. */
  def chatTemplate(df: DataFrame, idCol: String, textCol: String,
      promptWords: Int, system: String): DataFrame = {
    require(promptWords >= 1,
      s"chatTemplate: promptWords must be >= 1, got $promptWords")
    val ts = split(col(textCol), " ")
    val n = size(ts).cast("long")
    val prompt = array_join(slice(ts, 1, promptWords), " ")
    val response = array_join(
      slice(ts, lit(promptWords + 1), greatest(size(ts) - promptWords, lit(0))),
      " ")
    val pre = concat(lit("<|system|>"), lit(system), lit("<|user|>"),
      prompt, lit("<|assistant|>"))
    df.where(n > promptWords)
      .select(col(idCol),
        concat(pre, response, lit("<|end|>")).as("rendered"),
        length(pre).cast("long").as("mask_start"),
        (length(pre) + length(response)).cast("long").as("mask_end"),
        n.as("n_tokens"),
        (n - promptWords).as("n_tokens_masked"))
  }

  /** Fit Bradley-Terry strengths from decided pairwise outcomes — the
    * rating model behind reward-model data curation (which responses /
    * annotators / sources consistently win) and LLM-arena leaderboards.
    * Input: one row per decided comparison (`winnerCol`, `loserCol`);
    * NULL endpoints and self-comparisons drop.
    *
    * `iters` rounds of Hunter's MM update (Hunter 2004, "MM algorithms
    * for generalized Bradley-Terry models"):
    * p_i ← W_i / Σ_j n_ij/(p_i+p_j), then rescaled so mean(p) = 1
    * (the MM objective is scale-invariant; without the rescale the
    * iterate wanders in scale and cross-engine comparison is
    * meaningless). Players with zero wins rate 0 after one round —
    * the MLE boundary, reported, not an error.
    *
    * Scale shape: the comparison matrix aggregates once to one row per
    * unordered player pair (n_ij) — all further work is
    * player-cardinality-sized, independent of the outcome row count.
    * Per round: one sym⋈ratings double equi-join + one groupBy(player)
    * fold + one tiny (1-row) total broadcast — the pageRank loop
    * conventions exactly (per-round localCheckpoint lineage
    * truncation, eager release of the dead iterate).
    *
    * Determinism: strengths are built from correctly-rounded IEEE ops
    * only (+, /, ×) — no libm. With `portable = true` the per-player
    * denominator and the global total use ordered folds
    * (sort-then-sum), so the result is BIT-identical across engines
    * and partitionings; default sums algebraically (the scale
    * default: ±ulp order noise, constant state per key).
    *
    * Output: (player, n_wins, rating) — one row per player appearing
    * in any decided comparison. */
  def bradleyTerry(outcomes: DataFrame, winnerCol: String,
      loserCol: String, iters: Int,
      portable: Boolean = false): DataFrame = {
    require(iters >= 1, s"bradleyTerry: iters must be >= 1, got $iters")
    val pr = outcomes
      .select(col(winnerCol).as("__w"), col(loserCol).as("__l"))
      .where(col("__w").isNotNull && col("__l").isNotNull &&
        col("__w") =!= col("__l"))
    // one row per unordered pair — everything after this is
    // player-cardinality-sized
    val cmp = pr.groupBy(least(col("__w"), col("__l")).as("a"),
        greatest(col("__w"), col("__l")).as("b"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    try {
      val sym = cmp.select(col("a").as("i"), col("b").as("j"), col("n"))
        .unionByName(
          cmp.select(col("b").as("i"), col("a").as("j"), col("n")))
      val wins = pr.groupBy(col("__w").as("player"))
        .agg(count(lit(1)).as("n_wins"))
      val players = sym.select(col("i").as("player")).distinct()
      // loop-invariant 1-row frame: un-pinned it re-ran the players
      // distinct inside EVERY round's broadcast (r18 plan audit)
      val np = players.agg(count(lit(1)).as("__np"))
        .localCheckpoint(true)
      val fold: Column => Column =
        if (portable)
          c => aggregate(sort_array(collect_list(c)), lit(0.0), _ + _)
        else c => sum(c)
      // each MM round SELF-JOINS ratings (the i- and j-sides of denom),
      // so the checkpointed frame must be stats-stripped per round —
      // squared size estimates double their bit-length every round and
      // stall Catalyst in BigInteger math past ~20 rounds
      // (Checkpoints.stripStats; harmless at the registered 3 rounds,
      // a wall for a user running the knob higher). The wrapper owns
      // no blocks: release the BACKING frame.
      var ratingsBk = players
        .join(wins, Seq("player"), "left")
        .select(col("player"),
          coalesce(col("n_wins"), lit(0L)).as("n_wins"),
          lit(1.0).as("rating"))
        .localCheckpoint(true)
      var ratings = Checkpoints.stripStats(ratingsBk)
      var it = 0
      while (it < iters) {
        val denom = sym
          .join(ratings.select(col("player").as("i"),
            col("rating").as("__pi")), "i")
          .join(ratings.select(col("player").as("j"),
            col("rating").as("__pj")), "j")
          .groupBy(col("i").as("player"))
          .agg(fold(col("n").cast("double") /
            (col("__pi") + col("__pj"))).as("__den"))
        // LAZY checkpoint: `unnorm` feeds both the broadcast total and
        // the rating projection in the same round plan — un-pinned,
        // the denominator joins executed TWICE per round (r18 plan
        // audit); the broadcast stage materializes the blocks, the
        // probe side reads them
        val unnorm = ratings.select(col("player"), col("n_wins"))
          .join(denom, "player")
          .select(col("player"), col("n_wins"),
            (col("n_wins").cast("double") / col("__den")).as("__u"))
          .localCheckpoint(false)
        val total = unnorm.agg(fold(col("__u")).as("__tot"))
        val nextBk = unnorm
          .crossJoin(broadcast(total))
          .crossJoin(broadcast(np))
          .select(col("player"), col("n_wins"),
            (col("__u") * col("__np").cast("double") / col("__tot"))
              .as("rating"))
          .localCheckpoint(true)
        // nextBk is materialized: the round's unnorm blocks are dead
        Checkpoints.releaseIntermediate(unnorm)
        Checkpoints.releaseIntermediate(ratingsBk)
        ratingsBk = nextBk
        ratings = Checkpoints.stripStats(nextBk)
        it += 1
      }
      val out = ratings.select(col("player"), col("n_wins"), col("rating"))
        .localCheckpoint(true)
      Checkpoints.releaseIntermediate(ratingsBk)
      out
    } finally Checkpoints.releaseIntermediate(cmp)
  }
}
