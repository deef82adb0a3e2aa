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
