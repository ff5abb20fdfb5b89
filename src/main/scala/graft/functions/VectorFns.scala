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

  /** Dot product, accumulated in double in element order. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))
}
