package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One comparison field in a Fellegi-Sunter linkage: a display name,
  * the agreement predicate over the joined candidate frame, and the
  * model's conditional agreement probabilities — `m` = P(agree |
  * records match), `u` = P(agree | records don't). The log2
  * likelihood-ratio weights are computed DRIVER-side (plain `math.log`
  * on literals) and enter the plan as double literals — no libm call
  * ever runs per row, and an oracle replaying the same literals is
  * bit-identical.
  */
final case class LinkField(name: String, agree: Column, m: Double,
    u: Double) {
  require(m > 0 && m < 1, s"LinkField($name): m out of (0,1): $m")
  require(u > 0 && u < 1, s"LinkField($name): u out of (0,1): $u")
  require(m > u,
    s"LinkField($name): agreement must be likelier among matches (m > u), got m=$m u=$u")

  /** Weight added when the field agrees: log2(m/u) > 0. */
  def agreeWeight: Double = math.log(m / u) / math.log(2.0)

  /** Weight added when the field disagrees: log2((1−m)/(1−u)) < 0. */
  def disagreeWeight: Double = math.log((1 - m) / (1 - u)) / math.log(2.0)
}

/** Probabilistic record linkage (Fellegi & Sunter 1969) — the
  * entity-resolution complement to [[Dedup]]'s near-duplicate
  * detection: instead of "are these two documents the same text",
  * "are these two structured records the same ENTITY", scored as a
  * sum of per-field log-likelihood-ratio weights and classified
  * match / possible / nonmatch against two thresholds.
  */
object Linkage {

  /** Score blocked candidate pairs under the Fellegi-Sunter model.
    *
    * `left` and `right` must share ONLY the `blockOn` column names
    * (disambiguate everything else before calling). Candidates are the
    * equi-join on `blockOn` — the blocking. That join is the entire
    * scale contract: candidate count is Σ_b |L_b|·|R_b| over blocks,
    * chosen by the caller's key, never the all-pairs product; both
    * sides shuffle-partition on the block key (or the small side
    * broadcasts — AQE's call). Everything downstream is a per-row
    * projection.
    *
    * Each field contributes a THREE-state weight, the FS missing-data
    * convention: agree → log2(m/u), disagree → log2((1−m)/(1−u)),
    * predicate NULL (a comparand was missing) → 0 ("no information"
    * — a missing field must not masquerade as disagreement). The
    * score sums the fields in declaration order — fixed-order IEEE
    * adds of driver-computed literals, so the doubles are
    * reproducible bit-for-bit across engines.
    *
    * Verdict: score ≥ `matchThreshold` → 'match', ≥
    * `possibleThreshold` → 'possible' (the clerical-review band),
    * else 'nonmatch'. Nonmatches — the overwhelming bulk of any
    * blocked candidate set — are dropped unless `keepNonMatches`
    * (the output should be decisions-sized, not candidate-sized).
    *
    * Output: blockOn ++ left/right passthrough columns ++ one
    * `agree_<field>` boolean per field (NULL when the field was
    * missing) ++ (score, verdict). */
  def linkPairs(left: DataFrame, right: DataFrame, blockOn: Seq[String],
      fields: Seq[LinkField], matchThreshold: Double,
      possibleThreshold: Double,
      keepNonMatches: Boolean = false): DataFrame = {
    require(blockOn.nonEmpty, "linkPairs: blockOn must be non-empty " +
      "(an unblocked linkage is the all-pairs product)")
    require(fields.nonEmpty, "linkPairs: need at least one field")
    require(fields.map(_.name).distinct.size == fields.size,
      "linkPairs: duplicate field names")
    require(matchThreshold >= possibleThreshold,
      s"linkPairs: matchThreshold ($matchThreshold) must be >= " +
        s"possibleThreshold ($possibleThreshold)")
    val cand = left.join(right, blockOn)
    val flagged = fields.foldLeft(cand) { (df, f) =>
      df.withColumn(s"agree_${f.name}", f.agree)
    }
    val score = fields.map { f =>
      val flag = col(s"agree_${f.name}")
      when(flag.isNull, lit(0.0))
        .when(flag, lit(f.agreeWeight))
        .otherwise(lit(f.disagreeWeight))
    }.reduce(_ + _)
    val scored = flagged.withColumn("score", score)
      .withColumn("verdict",
        when(col("score") >= matchThreshold, lit("match"))
          .when(col("score") >= possibleThreshold, lit("possible"))
          .otherwise(lit("nonmatch")))
    if (keepNonMatches) scored
    else scored.where(col("verdict") =!= "nonmatch")
  }

  /** One survivorship decision in [[goldenRecords]]: which value of
    * `field` survives when a matched cluster's members disagree. Every
    * rule is a deterministic STRUCT-ORDERED aggregate (both Spark and
    * DuckDB order structs field-by-field), ties broken by the value
    * itself — no first()/any_value() nondeterminism anywhere. */
  sealed trait SurvivorRule { def field: String }
  /** Longest non-null string wins (ties → lexicographically greatest). */
  final case class Longest(field: String) extends SurvivorRule
  /** Numeric max / min. */
  final case class MaxOf(field: String) extends SurvivorRule
  final case class MinOf(field: String) extends SurvivorRule
  /** Value from the row with the GREATEST `tsField` among rows where
    * `field` is non-null (ties → greatest value). */
  final case class Latest(field: String, tsField: String) extends SurvivorRule
  /** Value from the row with the SMALLEST `priorityField` among rows
    * where `field` is non-null (ties → smallest value) — source
    * preference: tag each source with a priority and the most trusted
    * source that HAS the field wins. */
  final case class Prefer(field: String, priorityField: String)
      extends SurvivorRule

  /** Survivorship — the golden-record half of entity resolution: after
    * [[linkPairs]] (or any clustering) has decided WHICH records are
    * the same entity, merge each cluster into one record, field by
    * field, under explicit [[SurvivorRule]]s (the Talend/Informatica
    * "survivorship" step, deterministic by construction).
    *
    * ONE pass: a single groupBy(cluster) carrying one struct-ordered
    * aggregate per rule plus the member count — no per-field windows,
    * no second scan. Per-cluster state is one struct per rule.
    *
    * Output: (clusterCol, n_members, <one column per rule, named by
    * its field>). A rule whose field is null on EVERY member yields
    * NULL (min/max skip null structs in both engines). */
  def goldenRecords(records: DataFrame, clusterCol: String,
      rules: Seq[SurvivorRule]): DataFrame = {
    require(rules.nonEmpty, "goldenRecords: need at least one rule")
    require(rules.map(_.field).distinct.size == rules.size,
      "goldenRecords: one rule per field (duplicate field)")
    val aggs = rules.map {
      case Longest(f) =>
        max(when(col(f).isNotNull,
          struct(length(col(f)).as("k"), col(f).as("v"))))
          .getField("v").as(f)
      case MaxOf(f) => max(col(f)).as(f)
      case MinOf(f) => min(col(f)).as(f)
      case Latest(f, ts) =>
        max(when(col(f).isNotNull,
          struct(col(ts).as("k"), col(f).as("v"))))
          .getField("v").as(f)
      case Prefer(f, p) =>
        min(when(col(f).isNotNull,
          struct(col(p).as("k"), col(f).as("v"))))
          .getField("v").as(f)
    }
    records.groupBy(col(clusterCol))
      .agg(count(lit(1)).as("n_members"), aggs: _*)
  }
}
