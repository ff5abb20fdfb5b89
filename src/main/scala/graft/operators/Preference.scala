package graft.operators

import org.apache.spark.sql.DataFrame
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
}
