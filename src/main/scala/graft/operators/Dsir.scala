package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** DSIR-style data selection: importance resampling of a raw corpus
  * toward a target distribution over HASHED n-gram features (Xie et
  * al. 2023, "Data Selection for Language Models via Importance
  * Resampling" — the hashed-ngram instantiation, which is the one that
  * runs at pretraining scale).
  *
  * Pipeline: (1) fit — bucket counts of word unigram+bigram features
  * hashed into `buckets` bins, once over the TARGET corpus and once
  * over the RAW corpus, giving add-1-smoothed log-likelihood ratios
  * λ_b per bucket (a bag-of-buckets importance model, the NB-model
  * shape with corpora instead of classes); (2) score — each raw
  * document's log importance weight log w = Σ_features λ_bucket(f);
  * (3) resample — Gumbel top-k over log w + g_id, which draws k docs
  * WITHOUT replacement with probability ∝ w (the standard Gumbel-max
  * argument), deterministically from ids via the engine's md5-uniform
  * convention.
  *
  * Scale shape: the model is ≤ `buckets` rows — a broadcast artifact
  * regardless of corpus size (that's the point of hashing); scoring is
  * one generator + one broadcast join + one per-doc aggregate; the
  * resample is a bounded-heap top-k (k+heap per task, never a global
  * sort). Nothing driver-side scales with data.
  *
  * Determinism: counts are exact integers; λ and the Gumbel key take
  * ln() of bit-identical integer-derived doubles (the selfInfoModel
  * convention); per-doc sums use the ordered-fold flavor for oracle
  * comparison and round(·,4) absorbs ln-ulp daylight (the NB scoring
  * convention).
  */
object Dsir {

  /** 2^60 — the md5-uniform denominator (the priorityCol constant). */
  private val TwoPow60: Double = 1152921504606846976.0d

  /** md5-uniform feature bucket: 60 unbiased hex-derived bits mod
    * `buckets` — engine-portable (the minhash/priority convention). */
  def bucketCol(feat: Column, buckets: Int): Column =
    conv(substring(md5(feat), 1, 15), 16, 10).cast("long") % buckets

  /** One row per hashed feature occurrence: word unigrams + adjacent
    * bigrams of the bpeish tokenization, as (id, __bucket). */
  private[graft] def featureRows(df: DataFrame, idCol: String,
      textCol: String, buckets: Int): DataFrame = {
    val uni = df.select(col(idCol),
      explode(TextFns.bpeishTokens(col(textCol))).as("__feat"))
    val bi = TextAnalysis.ngramRows(df, textCol, 2, col(idCol))
      .select(col(idCol),
        concat_ws(" ", col("__prev"), col("__tok2")).as("__feat"))
    uni.unionByName(bi)
      .select(col(idCol), bucketCol(col("__feat"), buckets).as("__bucket"))
  }

  /** Exact integer bucket counts of both corpora — the inspectable
    * half of the fit (text_nb_model convention). Output:
    * (bucket, n_target, n_raw), ≤ `buckets` rows. */
  def dsirCounts(target: DataFrame, raw: DataFrame, textCol: String,
      buckets: Int): DataFrame = {
    require(buckets >= 2, s"dsirCounts: buckets must be >= 2, got $buckets")
    def side(df: DataFrame, name: String) =
      featureRows(df.select(col(textCol), lit(1L).as("__one")),
          "__one", textCol, buckets)
        .groupBy(col("__bucket")).agg(count(lit(1)).as(name))
    side(target, "n_target")
      .join(side(raw, "n_raw"), Seq("__bucket"), "full")
      .select(col("__bucket").as("bucket"),
        coalesce(col("n_target"), lit(0L)).as("n_target"),
        coalesce(col("n_raw"), lit(0L)).as("n_raw"))
  }

  /** The frozen importance model: per observed bucket the add-1 LLR
    * λ_b = (ln(t_b+1) − ln(T+B)) − (ln(r_b+1) − ln(R+B)), plus the
    * constant OOV ratio an UNOBSERVED bucket scores (both counts 0 —
    * rides on every row, the nbQualityModel convention). ≤ `buckets`
    * rows; persistable; broadcast at scoring time. */
  def dsirModel(target: DataFrame, raw: DataFrame, textCol: String,
      buckets: Int): DataFrame = {
    // pin the bucket counts (≤ `buckets` rows): the totals aggregate
    // and the output projection both consume them, and scoring
    // consumes the model twice more (consts + term join) — un-pinned,
    // every reference re-tokenized BOTH corpus sides (r18 final-plan
    // audit: 36 corpus scans in text_dsir_score). The fit becomes
    // eager, which is the artifact contract anyway ("frozen;
    // persistable").
    val counts = dsirCounts(target, raw, textCol, buckets)
      .localCheckpoint(true)
    val totals = counts.agg(sum(col("n_target")).as("__tt"),
      sum(col("n_raw")).as("__tr"))
    val lnD = (c: Column) => log(c.cast("double"))
    counts.crossJoin(broadcast(totals))
      .select(col("bucket").as("__dbucket"),
        ((lnD(col("n_target") + 1) - lnD(col("__tt") + buckets)) -
          (lnD(col("n_raw") + 1) - lnD(col("__tr") + buckets)))
          .as("__lam"),
        (lnD(col("__tr") + buckets) - lnD(col("__tt") + buckets))
          .as("__lam_oov"))
  }

  /** Score documents against a frozen [[dsirModel]]: log importance
    * weight = Σ per-feature λ (ordered fold — the oracle-portable
    * flavor; swap the fold for `sum` when cross-engine bit-equality
    * isn't needed). Output: (id, n_features, log_w). Docs that
    * tokenize to zero features emit nothing (the tokenize-then-agg
    * convention). */
  def dsirScorePortable(df: DataFrame, model: DataFrame, idCol: String,
      textCol: String, buckets: Int): DataFrame =
    dsirScoreAgg(df, model, idCol, textCol, buckets,
      t => aggregate(sort_array(collect_list(t)), lit(0.0), _ + _))

  /** Algebraic-sum flavor — the scale default ((sum) state per doc at
    * any length; ±ulp summation-order noise, as selfInfoScore). */
  def dsirScore(df: DataFrame, model: DataFrame, idCol: String,
      textCol: String, buckets: Int): DataFrame =
    dsirScoreAgg(df, model, idCol, textCol, buckets, t => sum(t))

  private def dsirScoreAgg(df: DataFrame, model: DataFrame, idCol: String,
      textCol: String, buckets: Int,
      fold: Column => Column): DataFrame = {
    val consts = model.select(col("__lam_oov")).limit(1)
    featureRows(df, idCol, textCol, buckets)
      .join(broadcast(model.select(col("__dbucket"), col("__lam"))),
        col("__bucket") === col("__dbucket"), "left")
      .crossJoin(broadcast(consts))
      .select(col(idCol),
        coalesce(col("__lam"), col("__lam_oov")).as("__term"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_features"),
        fold(col("__term")).as("__lw"))
      .select(col(idCol), col("n_features"),
        round(col("__lw"), 4).as("log_w"), col("__lw"))
  }

  /** Gumbel top-k importance resample: key_i = log wᵢ + gᵢ with
    * gᵢ = −ln(−ln(uᵢ)), uᵢ the md5-uniform of (id, salt) — draws k
    * docs without replacement ∝ wᵢ, deterministic in ids. One
    * TakeOrderedAndProject (bounded per-task heaps) + a rank over the
    * ≤ k-row survivor frame. Output: (id, log_w, sample_key, rank). */
  def dsirResample(df: DataFrame, model: DataFrame, idCol: String,
      textCol: String, buckets: Int, k: Int,
      salt: String = "|dsir"): DataFrame = {
    require(k >= 1, s"dsirResample: k must be >= 1, got $k")
    val scored = dsirScorePortable(df, model, idCol, textCol, buckets)
    val h = conv(substring(md5(concat(col(idCol).cast("string"),
      lit(salt))), 1, 15), 16, 10).cast("long")
    val u = (h + lit(1L)).cast("double") / lit(TwoPow60)
    val keyed = scored.select(col(idCol), col("log_w"),
      (col("__lw") - log(-log(u))).as("__key"))
    val top = keyed.orderBy(col("__key").desc, col(idCol)).limit(k)
    Relational.withScalableOrdinal(top,
        Seq(col("__key").desc, col(idCol)), "rank")
      .select(col(idCol), col("log_w"),
        round(col("__key"), 4).as("sample_key"),
        col("rank").cast("long").as("rank"))
  }
}
