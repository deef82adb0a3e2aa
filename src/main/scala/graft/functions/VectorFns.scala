package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Embedding-similarity primitives over `array<float>` columns.
  * Accumulation is an in-order left fold in double precision — the same
  * order DuckDB's list functions use — so similarity values are
  * bit-reproducible across engines. The dot product is a native codegen
  * [[FloatVecDotExpr]] (tight loop, no intermediate array); the
  * higher-order-function forms remain for non-float inputs.
  */
object VectorFns {

  /** Ordered left-fold sum of an array<double>. */
  private def foldSum(c: Column): Column =
    aggregate(c, lit(0.0), (acc, x) => acc + x)

  /** float-array dot product (native expression; see FloatVecDot). */
  def dot(a: Column, b: Column): Column =
    GraftSql.column(FloatVecDotExpr(GraftSql.expression(a), GraftSql.expression(b)))

  /** HOF fallback for non-float array types. */
  def dotHof(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)))

  def norm2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))

  /** Sign-random-projection bucket of an embedding: the sign bits of `bits`
    * fixed pseudo-random hyperplanes, packed into a long. This is the LSH
    * cell id for approximate cosine search — vectors in the same cell are
    * near-duplicates candidates. Hyperplane r_i components are deterministic
    * ±1 derived from (i, j) parity mixing, so any engine can reproduce them.
    */
  def srpBucket(a: Column, bits: Int, dim: Int): Column = {
    val bitCols = (0 until bits).map { i =>
      // h_i = sum_j s(i,j) * a_j with s(i,j) = +1 if (i*31 + j*17) % 2 == 0 else -1
      val proj = foldSum(zip_with(a, sequence(lit(0), lit(dim - 1)),
        (x, j) => x.cast(DoubleType) *
          when(pmod(lit(i * 31) + j * lit(17), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))))
      when(proj > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }
}
