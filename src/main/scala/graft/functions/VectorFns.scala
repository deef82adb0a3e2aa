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

  /** array<float> × array<double> dot (native expression; bit-identical
    * to [[dotHof]]'s fold) — the vector-vs-trained-centroid hot path.
    */
  def dotMixed(a: Column, b: Column): Column =
    GraftSql.column(MixedVecDotExpr(GraftSql.expression(a), GraftSql.expression(b)))

  def norm2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))

  /** splitmix64 finalizer: injective avalanche mixing for hyperplane signs.
    * A LINEAR parity like (i*31 + j*17) mod 2 collapses to (i+j) mod 2 —
    * hyperplanes i and i+2 become identical and i+1 = -i, so a "bits"-bit
    * bucket carries ONE bit of information (the round-7 SRP did exactly
    * this: 16 nominal buckets, 2 effective). An avalanche mix has no such
    * linear structure, so every (table, bit) pair gets an independent
    * plane.
    */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic ±1 sign of hyperplane component (table, bit, j) —
    * shared by the Spark expression and the DuckDB oracle generator so
    * both engines see bit-identical planes.
    */
  def srpSign(table: Int, bit: Int, j: Int): Double = {
    val key = (table.toLong * 1000003L + bit.toLong) * 1000033L + j.toLong
    if ((mix64(key) & 1L) == 0L) 1.0 else -1.0
  }

  /** Hyperplane (table, bit) as an array<float> literal payload. ±1 is
    * exact in float, and x * ±1.0 is an exact IEEE sign flip, so the
    * projection equals DuckDB's list_inner_product over the same ±1
    * DOUBLE[] literals bit-for-bit.
    */
  def srpPlane(table: Int, bit: Int, dim: Int): Array[Float] =
    Array.tabulate(dim)(j => srpSign(table, bit, j).toFloat)

  /** Sign-random-projection bucket of an embedding: the sign bits of `bits`
    * fixed pseudo-random hyperplanes, packed into a long. This is the LSH
    * cell id for approximate cosine search — vectors in the same cell are
    * near-duplicate candidates. `table` selects an independent hyperplane
    * family: OR-ing candidates across several tables recovers the recall
    * that a single high-`bits` table gives up (the classic multi-table
    * LSH construction, mirroring the minhash band structure in
    * [[TextFns.MinhashBands]]). Each projection is the native codegen
    * [[FloatVecDotExpr]] against a plane literal — no per-row plane
    * recomputation.
    */
  def srpBucket(a: Column, bits: Int, dim: Int, table: Int = 0): Column = {
    val bitCols = (0 until bits).map { i =>
      when(dot(a, lit(srpPlane(table, i, dim))) > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** Bucket-width knob: bits so that mean bucket occupancy ≈ `occupancy`
    * at corpus size n, floored at 8. Candidate pairs per table are then
    * ~n*occupancy/2 — LINEAR in n — instead of the O(n²/2^bits) a fixed
    * bits gives. Production semantic dedup should derive bits from a
    * (cheap, metadata-only) corpus count; the oracled queries pin bits so
    * the SQL twin replays the identical recall cut.
    */
  def srpBitsFor(n: Long, occupancy: Int = 8): Int = {
    val needed = math.ceil(math.log(math.max(1L, n).toDouble / occupancy) / math.log(2.0)).toInt
    math.max(8, needed)
  }
}
