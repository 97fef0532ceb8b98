package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` columns, built from
  * higher-order functions (zip_with / aggregate) so they stay inside
  * Catalyst — no UDF serialization, no driver involvement.
  *
  * Every element is cast to double BEFORE arithmetic and accumulation is
  * strictly left-to-right, which is what makes the results bit-identical
  * to the DuckDB oracle's list_transform/list_sum pipeline.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ with double accumulation in array order. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))
}
