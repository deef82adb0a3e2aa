package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product over two `array<float>` columns.
  *
  * Semantics are EXACTLY the ordered left fold
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0d, +)` —
  * each float is widened to double, products accumulate in element order,
  * and MISMATCHED LENGTHS or NULL ELEMENTS yield NULL (zip_with
  * null-pads the shorter side, and any null product poisons the fold) —
  * so results are bit-identical to the higher-order-function formulation
  * (and to DuckDB's `list_inner_product` over `DOUBLE[]`), degenerate
  * inputs included. The win is mechanical: one
  * tight loop over the two ArrayData buffers instead of an intermediate
  * 64-element array allocation per pair, which dominates the
  * pairwise-similarity hot path.
  *
  * Both expressions declare `inputTypes`, so a mistyped operand — e.g. an
  * `array<double>` query embedding on the float side, whose 8-byte
  * elements `getFloat` would silently misread from UnsafeArrayData — is
  * an ANALYSIS-time error, not a wrong similarity.
  */
object FloatVecDot {
  /** Called from generated code AFTER the equal-length and null-element
    * gates — keep signature (ArrayData, ArrayData) -> double.
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  /** Null-element scan (bitmask reads on UnsafeArrayData) — generated
    * ONLY when an input's ArrayType admits null elements, so the common
    * containsNull=false path pays nothing. A null element nulls the HOF
    * fold (null product poisons the aggregate), so it must null these
    * expressions too — keep signature (ArrayData, ArrayData) -> boolean.
    */
  def anyNull(a: ArrayData, b: ArrayData): Boolean = {
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return true
      i += 1
    }
    false
  }
}

case class FloatVecDotExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  // the null-element scan exists only when the schema admits null
  // elements — embeddings from parquet/toDF are containsNull=false and
  // skip it entirely. Fixed once the children are resolved, so a lazy
  // val: the interpreted fallback re-enters nullSafeEval per row and
  // must not re-derive it each time
  private lazy val mayHaveNullElems: Boolean = Seq(left, right).exists(
    _.dataType.asInstanceOf[ArrayType].containsNull)
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements() ||
      (mayHaveNullElems && FloatVecDot.anyNull(a, b))) null
    else FloatVecDot.dot(a, b)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nullScan = if (mayHaveNullElems)
      (a: String, b: String) => s" || graft.functions.FloatVecDot.anyNull($a, $b)"
    else (_: String, _: String) => ""
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()${nullScan(a, b)}) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.FloatVecDot.dot($a, $b);
         |}
       """.stripMargin)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloatVecDotExpr =
    copy(left = l, right = r)
  override def prettyName: String = "fvec_dot"
}

/** Codegen'd dot product for `array<float>` × `array<double>` — the
  * vector-vs-TRAINED-CENTROID pair (centroid components are rounded
  * double means). Same ordered left fold as
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0d, +)`,
  * null on mismatched lengths like the fold, so bit-identical to the HOF
  * formulation and the DuckDB replay; the win is the k-means assignment
  * hot path, where this runs n·k times per Lloyd iteration and the HOF's
  * per-pair intermediate array dominated the build wall clock.
  */
object MixedVecDot {
  /** Called from generated code AFTER the equal-length gate — keep
    * signature (ArrayData, ArrayData) -> double.
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getDouble(i)
      i += 1
    }
    s
  }
}

case class MixedVecDotExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes =
    Seq(ArrayType(FloatType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  // lazy val, not def: per-row on the interpreted fallback path
  private lazy val mayHaveNullElems: Boolean = Seq(left, right).exists(
    _.dataType.asInstanceOf[ArrayType].containsNull)
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements() ||
      (mayHaveNullElems && FloatVecDot.anyNull(a, b))) null
    else MixedVecDot.dot(a, b)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nullScan = if (mayHaveNullElems)
      (a: String, b: String) => s" || graft.functions.FloatVecDot.anyNull($a, $b)"
    else (_: String, _: String) => ""
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()${nullScan(a, b)}) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.MixedVecDot.dot($a, $b);
         |}
       """.stripMargin)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MixedVecDotExpr =
    copy(left = l, right = r)
  override def prettyName: String = "mvec_dot"
}
