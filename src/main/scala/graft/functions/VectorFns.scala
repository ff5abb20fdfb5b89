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

  /** Cosine similarity in [-1, 1]. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))
}
