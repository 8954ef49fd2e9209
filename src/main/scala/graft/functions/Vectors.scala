package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from Spark's
  * codegen'd higher-order functions (`zip_with`/`aggregate`) — no UDFs, so
  * the expressions stay inside whole-stage codegen and are usable at
  * 100 TB without serialization overhead.
  *
  * Determinism: `aggregate` folds left in index order, giving a fixed IEEE
  * summation order — required for DuckDB-oracle hash parity.
  */
object Vectors {

  /** Cast to array<double> (exact float widening) for stable arithmetic. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product — native fused-loop Expression (see [[DotProduct]]). */
  def dot(a: Column, b: Column): Column = DotProduct(a, b)

  /** Composed-builtins dot product (zip_with + left-fold aggregate);
    * value-identical to [[dot]], kept as the no-custom-code fallback and
    * for the equivalence spec. */
  def dotComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Squared L2 distance — native fused-loop Expression ([[SqDist]]). */
  def l2sq(a: Column, b: Column): Column = SqDist(a, b)

  /** Composed-builtins squared L2; value-identical to [[l2sq]], kept
    * for the equivalence spec. */
  def l2sqComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity: dot(a,b) / (|a| * |b|). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))
}
