package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental table maintenance — the operations that keep a large
  * keyed corpus current between crawl / ingest snapshots: last-writer
  * upsert (MERGE), snapshot-vs-snapshot change capture, change-log
  * replay, and change-compressed SCD-2 history.
  *
  * The reference pipeline is append-only (its file sink accumulates
  * batches; `streaming_app.scala` never revises a written row), so
  * this family is a gap-fill in the same spirit as §2.3's joins: the
  * moment the corpus is a maintained TABLE rather than an append log —
  * re-crawled pages replacing stale ones, takedown deletes, profile
  * updates — these four verbs are the whole vocabulary.
  *
  * Scale shape (100 TB): every operator here is one or two hash
  * shuffles on the table key — the same exchange a plain `groupBy(key)`
  * costs — and nothing touches the driver. With both sides bucketed by
  * the key (the production layout for a maintained table) the joins
  * are exchange-free. Window-based steps partition by the table key
  * (high cardinality — never a global window), and consecutive windows
  * share one partitioning so Catalyst plans a single exchange.
  */
object Incremental {

  /** MERGE (last-writer-wins): rows of `source` replace same-key rows
    * of `target`; source-only keys are inserts; unmatched target rows
    * survive. `source` must be key-unique (compose with
    * [[latestPerKey]] when it is a raw change feed); `target` is
    * assumed key-unique as any maintained table is.
    *
    * Plan: one LEFT ANTI join (target minus touched keys) + a
    * zero-cost union. Both shuffles key on `keys`; AQE broadcasts the
    * anti side when the delta is small — the common case of a daily
    * delta against a huge base never reshuffles the base twice. */
  def mergeUpsert(target: DataFrame, source: DataFrame,
      keys: Seq[String]): DataFrame =
    target.join(source.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(source.select(target.columns.map(col).toIndexedSeq: _*))

  /** Keep the latest row per key from a change feed, "latest" = max of
    * `ord` (pass a total order — e.g. ts then a unique id — or ties
    * resolve arbitrarily). One window, partitioned by the key. */
  def latestPerKey(log: DataFrame, keys: Seq[String],
      ord: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord.map(_.desc): _*)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Change capture between two key-unique snapshots: emit one row per
    * changed key, tagged `op` ∈ {I, U, D} (insert / update / delete).
    * I and U rows carry the NEW payload, D rows the last-seen OLD
    * payload. Unchanged keys are dropped — the output IS the delta
    * that [[mergeUpsert]] + a delete anti-join would replay, and
    * `IncrementalSpec` pins that round-trip exactly.
    *
    * Payload comparison is null-safe struct equality (`<=>`), so a
    * null→value flip is a U, not a dropped row. One full-outer join
    * keyed on `keys` — the canonical two-snapshot diff shape. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keys: Seq[String]): DataFrame = {
    val payload = oldSnap.columns.filterNot(keys.contains).toIndexedSeq
    require(payload.nonEmpty, "snapshotDiff: no payload columns")
    val o = oldSnap.select(keys.map(col) ++
      Seq(struct(payload.map(col): _*).as("__old")): _*)
    val n = newSnap.select(keys.map(col) ++
      Seq(struct(payload.map(col): _*).as("__new")): _*)
    o.join(n, keys.toIndexedSeq, "full_outer")
      .withColumn("op",
        when(col("__old").isNull, lit("I"))
          .when(col("__new").isNull, lit("D"))
          .when(!(col("__old") <=> col("__new")), lit("U")))
      .filter(col("op").isNotNull)
      .select(keys.map(col) ++ Seq(col("op")) ++ payload.map(c =>
        when(col("op") === "D", col(s"__old.$c"))
          .otherwise(col(s"__new.$c")).as(c)): _*)
  }

  /** Replay a change feed onto a base snapshot: the latest feed row
    * per key wins; if its `opCol` value is `deleteOp` the key is
    * removed, otherwise its payload upserts. Base and feed payload
    * columns must align by name (feed may carry `opCol` extra).
    *
    * Plan: one key-window (latest), one anti+union (upsert), one anti
    * (delete) — three key-shuffles worst case, AQE-broadcast when the
    * feed is a small delta. */
  def applyChangeLog(base: DataFrame, log: DataFrame, keys: Seq[String],
      ord: Seq[Column], opCol: String = "op",
      deleteOp: String = "delete"): DataFrame = {
    val latest = latestPerKey(log, keys, ord)
    val upserts = latest.filter(col(opCol) =!= deleteOp).drop(opCol)
    val deletes = latest.filter(col(opCol) === deleteOp)
      .select(keys.map(col): _*)
    mergeUpsert(base, upserts, keys).join(deletes, keys, "left_anti")
  }

  /** Change-compressed SCD-2 history from an attribute feed: per key,
    * order by `ord`, keep only rows where `attrs` differ from the
    * previous row (null-safe), then stamp `valid_from` = that row's
    * `versionCol`, `valid_to` = the next kept row's (null while
    * current) and `is_current`. The result is the type-2 dimension a
    * warehouse would maintain — every key's attribute timeline with
    * no same-value runs.
    *
    * Both windows partition by the key and sort by `ord`, and the
    * filter between them preserves the first window's hash
    * partitioning — Catalyst plans ONE exchange + sort for the pair
    * (PlanSpec-checkable), so history costs what a single key-window
    * costs. */
  def scd2History(log: DataFrame, keys: Seq[String], ord: Seq[Column],
      attrs: Seq[String], versionCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val cur = struct(attrs.map(col): _*)
    val kept = log
      .withColumn("__prev", lag(cur, 1).over(w))
      .filter(col("__prev").isNull || !(col("__prev") <=> cur))
    kept.select(keys.map(col) ++ attrs.map(col) ++ Seq(
      col(versionCol).as("valid_from"),
      lead(col(versionCol), 1).over(w).as("valid_to"),
      lead(col(versionCol), 1).over(w).isNull.as("is_current")): _*)
  }
}
