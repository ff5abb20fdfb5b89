package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by dedup / text-analysis operators.
  *
  * Everything here composes built-in codegen'd functions — no UDFs — so
  * the expressions stay inside WholeStageCodegen and push through
  * Catalyst untouched. All hashing is md5 (available verbatim in the
  * DuckDB oracle, so signatures are cross-checkable bit-for-bit).
  */
object TextFns {

  /** lower + trim + collapse internal whitespace to single spaces. */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Whitespace tokens of the normalized text. */
  def words(text: Column): Column = split(normalize(text), " ")

  /** Word n-gram shingles; a document shorter than n words collapses to
    * one whole-text shingle. Pure expression tree (transform/sequence/
    * slice), evaluated per row without a shuffle.
    */
  def shingles(text: Column, n: Int): Column = {
    val w = words(text)
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n),
        i => array_join(slice(w, i + 1, lit(n)), " ")))
      .otherwise(array(array_join(w, " ")))
  }

  /** Normalized-content fingerprint: md5 of the whitespace-collapsed,
    * lowercased text. Exact-dup detection key that survives formatting
    * noise. */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** One member of the minhash family: the lexicographic minimum of
    * md5(seed || "|" || shingle) over a document's shingle set. md5 of
    * distinct shingles is uniform on hex strings, so the lexicographic
    * min is a valid uniform order statistic per permutation. */
  def minhashExpr(shingle: Column, perm: Int): Column =
    md5(concat(lit(s"$perm|"), shingle))

  /** "BPE-ish" token pattern: runs of letters, runs of digits, or a
    * single non-alphanumeric symbol. */
  val TokenPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  def bpeishTokens(text: Column): Column =
    regexp_extract_all(normalize(text), lit(TokenPattern), lit(0))
}
