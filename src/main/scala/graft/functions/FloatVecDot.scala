package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd dot product over two `array<float>` columns.
  *
  * Semantics are EXACTLY the ordered left fold
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0d, +)` —
  * each float is widened to double, products accumulate in element order —
  * so results are bit-identical to the higher-order-function formulation
  * (and to DuckDB's `list_inner_product` over `DOUBLE[]`). The win is
  * mechanical: one tight loop over the two ArrayData buffers instead of an
  * intermediate 64-element array allocation per pair, which dominates the
  * pairwise-similarity hot path.
  */
object FloatVecDot {
  /** Called from generated code — keep signature (ArrayData, ArrayData) -> double. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }
}

case class FloatVecDotExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any =
    FloatVecDot.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.FloatVecDot.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloatVecDotExpr =
    copy(left = l, right = r)
  override def prettyName: String = "fvec_dot"
}

/** Codegen'd dot product for `array<float>` × `array<double>` — the
  * vector-vs-TRAINED-CENTROID pair (centroid components are rounded
  * double means). Same ordered left fold as
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0d, +)`,
  * so bit-identical to the HOF formulation and the DuckDB replay; the
  * win is the k-means assignment hot path, where this runs n·k times
  * per Lloyd iteration and the HOF's per-pair intermediate array
  * dominated the build wall clock.
  */
object MixedVecDot {
  /** Called from generated code — keep signature (ArrayData, ArrayData) -> double. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getDouble(i)
      i += 1
    }
    s
  }
}

case class MixedVecDotExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any =
    MixedVecDot.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.MixedVecDot.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MixedVecDotExpr =
    copy(left = l, right = r)
  override def prettyName: String = "mvec_dot"
}
