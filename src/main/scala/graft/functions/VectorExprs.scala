package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType(FloatType/DoubleType) columns as declarative
  * higher-order functions — stays inside whole-stage codegen (no UDF, no
  * serialization boundary per row).
  */
object VectorExprs {

  /** Cast array<float> to array<double> (all math in double for parity and
    * to avoid float accumulation noise). */
  def asDouble(c: String): Column = expr(s"transform($c, x -> cast(x as double))")

  /** Sequential left-fold dot product of two array<double> columns. */
  def dot(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), cast(0 as double), (acc, x) -> acc + x)")

  /** L2 norm. */
  def norm(a: String): Column =
    sqrt(expr(s"aggregate($a, cast(0 as double), (acc, x) -> acc + x * x)"))
}
