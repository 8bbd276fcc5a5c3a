package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over `array<float>` columns.
  *
  * All accumulation is forced to DOUBLE in array order (left fold), matching
  * the oracle's evaluation, and everything is built-in higher-order functions —
  * codegen-friendly, no UDF, no driver-side math.
  */
object VecFns {
  /** Σ aᵢ·bᵢ in double, element order. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Σ aᵢ² in double. */
  def sqNorm(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))

  def norm(a: Column): Column = sqrt(sqNorm(a))

  /** cosine(a,b) — caller rounds before using it as a sort key. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
