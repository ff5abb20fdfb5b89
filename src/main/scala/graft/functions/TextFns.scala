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
    *
    * PERF: pass a MATERIALIZED words column (shinglesOfWords over a
    * prior projection), not `shingles(text)` directly, on hot paths:
    * higher-order functions are interpreted (CodegenFallback), so a
    * `w` that is itself split(regexp_replace(...)) re-executes the
    * regexp once per lambda invocation — ~n_words× per row.
    */
  def shingles(text: Column, n: Int): Column =
    shinglesOfWords(words(text), n)

  /** Shingles from an already-computed words array column. */
  def shinglesOfWords(w: Column, n: Int): Column =
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n),
        i => array_join(slice(w, i + 1, lit(n)), " ")))
      .otherwise(array(array_join(w, " ")))

  /** Normalized-content fingerprint: md5 of the whitespace-collapsed,
    * lowercased text. Exact-dup detection key that survives formatting
    * noise. */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** 28-bit base hash of a shingle: the first 7 hex chars of its md5.
    * Computed ONCE per shingle; the k minhash permutations are integer
    * affine maps of it (see minhashPerm) — k× cheaper than k md5 calls
    * and exactly reproducible in SQL oracles
    * (CAST('0x'||substr(md5(s),1,7) AS BIGINT)). */
  def shingleHash(shingle: Column): Column =
    conv(substring(md5(shingle), 1, 7), 16, 10).cast("long")

  /** Modulus for the minhash permutation family: 2^31 - 1 (prime). */
  val MinhashP: Long = 2147483647L

  /** Deterministic affine coefficients (a in [1, P-1], b in [0, P-1])
    * for permutation i — Knuth/Fibonacci multipliers, fixed forever so
    * signatures are stable across runs and engines. */
  def permCoeffs(i: Int): (Long, Long) = {
    val a = (2654435761L * (i + 1) + 40503L) % (MinhashP - 1) + 1
    val b = (2246822519L * (i + 1) + 104729L) % MinhashP
    (a, b)
  }

  /** Permutation i of a 28-bit shingle hash: (a·h + b) mod P. All values
    * fit in a long (h < 2^28, a < 2^31 → a·h < 2^59); arithmetic is
    * exact in both Spark and any BIGINT SQL engine. */
  def minhashPerm(shingleHash: Column, perm: Int): Column = {
    val (a, b) = permCoeffs(perm)
    (shingleHash * a + b) % MinhashP
  }

  /** "BPE-ish" token pattern: runs of letters, runs of digits, or a
    * single non-alphanumeric symbol. */
  val TokenPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  def bpeishTokens(text: Column): Column =
    bpeishTokensOfNorm(normalize(text))

  /** Tokens from an already-normalized text column (materialize the
    * normalization once when several expressions consume it). */
  def bpeishTokensOfNorm(norm: Column): Column =
    regexp_extract_all(norm, lit(TokenPattern), lit(0))
}
