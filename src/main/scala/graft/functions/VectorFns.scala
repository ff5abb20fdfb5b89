package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level dense-vector math over `array<float>` embedding columns.
  *
  * Implemented with Spark's higher-order array functions (zip_with /
  * aggregate) rather than UDFs: the expression tree is Catalyst-visible,
  * null-safe, and needs no serialization of the row to the JVM object
  * world. Accumulation is left-to-right in array order in DOUBLE, which
  * makes results deterministic and lets the DuckDB oracle reproduce the
  * exact float math (unnest order = list order).
  */
object VectorFns {

  /** Dot product, accumulated in double in element order. Uses the
    * codegen'd DotProduct expression when a session is active (the hot
    * path); falls back to the pure-built-in higher-order form otherwise.
    * Both compute bit-identical IEEE results. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.SparkSession.getActiveSession match {
      case Some(s) =>
        GraftFunctions.register(s)
        call_function("graft_dot", a, b)
      case None => hofDot(a, b)
    }

  /** Higher-order-function formulation: interpreted lambda per element —
    * correct everywhere, slow on all-pairs joins (see DotProduct).
    * Null products are filtered so the semantics MATCH DotProduct on
    * edge inputs: mismatched lengths truncate to the shorter side
    * (zip_with pads with null) and null elements contribute 0, instead
    * of null-poisoning the whole sum. */
  def hofDot(a: Column, b: Column): Column =
    aggregate(
      filter(
        zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        p => p.isNotNull),
      lit(0.0),
      (acc, x) => acc + x)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Similarity-scoring division with a degenerate guard: a
    * non-positive (or null) norm product scores −Infinity — never the
    * nearest neighbor, below every similarity threshold — instead of
    * THROWING under Spark's default ANSI divide-by-zero. Zero-norm
    * vectors are not hypothetical at corpus scale (padding rows, dead
    * encoders, all-zero PQ sub-slices — the sparse-block case), and a
    * single one must not kill a 100 TB scan or a Lloyd fit. The
    * guarded branch evaluates the UNTOUCHED division, so scores for
    * non-degenerate rows — everything the oracles check — are
    * bit-identical. */
  def simDiv(num: Column, den: Column): Column =
    when(den > 0, num / den).otherwise(lit(Double.NegativeInfinity))

  /** Cosine similarity in [-1, 1]; −Infinity for a zero-norm side
    * (see [[simDiv]]). */
  def cosine(a: Column, b: Column): Column =
    simDiv(dot(a, b), norm2(a) * norm2(b))
}
