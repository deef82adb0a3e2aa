package graft.repo

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleaving for multi-dimensional clustering — the
  * 2-D extension of the `clusterCols` data-skipping policy. Sorting by the
  * interleaved code keeps rows that are close in BOTH dimensions close in
  * the file order, so every written file covers a compact bounding box and
  * min-max footer stats prune on either column. A lexicographic 2-column
  * sort clusters only the leading column; Z-order is the standard
  * lakehouse answer (Delta OPTIMIZE ZORDER BY, Iceberg sort orders).
  *
  * Codegen native expression — stays inside whole-stage codegen on the
  * write path like [[Md5ModExpr]].
  */
object ZOrder {

  /** Spread the low 32 bits of `v` onto the even bit positions. */
  def spread(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** 64-bit Morton code over each input's 32-bit window, SIGN-BIASED
    * (offset binary: bit 31 of the window is flipped, i.e. +2^31) so
    * negative values interleave BELOW positive ones — raw two's-complement
    * low bits would sort every negative above every positive and split
    * each dimension's locality at zero, degrading the z-sort's clustering
    * (never correctness: the code is a sort key only). For values in
    * [0, 2^31) the bias is a uniform constant, so their relative order
    * — and any existing layout built from them — is unchanged; the
    * usable domain is the SIGNED window ±2^31 (one former magnitude bit
    * now carries the sign), and values outside it alias in the dropped
    * bits (documented).
    *
    * The final sign-bit flip makes the code a SIGNED-sortable key: the
    * biased interleave of dimension b's top window bit lands in bit 63,
    * which a signed long sort reads as the sign — without the flip, all
    * b >= 0 rows (negative codes) would sort BEFORE all b < 0 rows. The
    * flip is uniform and order-preserving (x^MIN < y^MIN signed iff
    * x < y unsigned), so layouts built from the previously-valid
    * non-negative domain are unchanged.
    * Called from generated code — keep signature (long, long) -> long.
    */
  def morton(a: Long, b: Long): Long =
    (spread(biased32(a)) | (spread(biased32(b)) << 1)) ^ java.lang.Long.MIN_VALUE

  private def biased32(v: Long): Long = (v & 0xffffffffL) ^ 0x80000000L

  /** Column API: `morton(a, b)` with both inputs cast to long. */
  def code(a: Column, b: Column): Column =
    GraftSql.column(ZOrderExpr(
      GraftSql.expression(a.cast("long")), GraftSql.expression(b.cast("long"))))

  /** k-D Morton code (k = 2..6): interleave each column's SIGNED window
    * of 64/k bits (sign-biased like [[morton]] — one window bit is spent
    * on the sign so negatives cluster below positives), dimension d at
    * bit positions i*k + d, and the final code sign-flipped so it stays
    * signed-sortable. The 2-D case routes through the native
    * [[ZOrderExpr]] fast path; higher k composes built-in shift/and/or
    * functions — every term is codegen'd, so the write path stays inside
    * whole-stage codegen either way. Precision drops with k: the usable
    * per-dimension domain is ±2^(64/k − 1), i.e. 31/20/15/11/9 magnitude
    * bits for k = 2..6; values outside it alias in the dropped bits,
    * which weakens clustering but never correctness (the z-code is a
    * SORT key only). Relative order — and therefore existing layouts —
    * is unchanged for values within the signed window's non-negative
    * half. Beyond ~4 columns the per-dimension resolution is usually too
    * coarse to prune well — prefer partitioning on the extra columns
    * instead.
    */
  def codeK(cols: Seq[Column]): Column = {
    val k = cols.size
    require(k >= 2 && k <= 6, s"z-order interleaves 2..6 columns, got $k")
    if (k == 2) code(cols.head, cols(1))
    else {
      import org.apache.spark.sql.functions.{lit, shiftleft, shiftright}
      val bitsPer = 64 / k
      // same sign bias as [[morton]], at this k's window width (flip the
      // window's top bit so negatives interleave below positives), and
      // the same final sign-bit flip so the code stays signed-sortable
      // (k=4 also reaches bit 63: position 15*4+3)
      val terms = for { d <- 0 until k; i <- 0 until bitsPer } yield
        shiftleft(shiftright(cols(d).cast("long")
          .bitwiseXOR(lit(1L << (bitsPer - 1))), i).bitwiseAND(lit(1L)), i * k + d)
      terms.reduce(_.bitwiseOR(_)).bitwiseXOR(lit(java.lang.Long.MIN_VALUE))
    }
  }
}

case class ZOrderExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(l: Any, r: Any): Any =
    ZOrder.morton(l.asInstanceOf[Long], r.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.repo.ZOrder.morton($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZOrderExpr =
    copy(left = l, right = r)
  override def prettyName: String = "zorder"
}
