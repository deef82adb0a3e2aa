package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{array_compact, array_distinct, size, sort_array}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Set-intersection cardinality for the exact-Jaccard pair family.
  *
  * `size(array_intersect(a, b))` builds a hash set PER CANDIDATE PAIR —
  * on a pairwise near-dup join that allocation runs |pairs| times and
  * dominates the verify stage. Over [[SetOps.sortedSet]]-materialized
  * arrays (sorted once per DOCUMENT, amortized across all its pairs) the
  * same count is a single allocation-free merge walk. Result is
  * bit-identical: the intersection cardinality of two distinct-element
  * sets does not depend on representation, so the DuckDB
  * `len(list_intersect(...))` oracles are unchanged.
  */
object SetOps {

  /** Sorted distinct long-array form — materialize ONCE per row (behind
    * the exchange feeding a self-join), then every pairwise
    * [[intersectCount]] is a linear merge.
    */
  def sortedSet(arr: Column): Column = sort_array(array_distinct(arr))

  /** Set cardinality EXCLUDING null slots — the Jaccard denominator's
    * size. A null element is not a set member on either engine
    * ([[count]] skips it; DuckDB's `list_distinct` drops it before `len`
    * ever sees it), so a plain `size` over a [[sortedSet]] that kept a
    * null slot would count a phantom member and skew every denominator
    * the null-bearing set appears in. Null-free inputs compact to
    * themselves — same value, same hashes.
    */
  def memberCount(sortedSetCol: Column): Column = size(array_compact(sortedSetCol))

  /** `|a ∩ b|` over two SORTED distinct long arrays. */
  def intersectCount(a: Column, b: Column): Column =
    GraftSql.column(IntersectCountExpr(GraftSql.expression(a), GraftSql.expression(b)))

  /** Called from generated code — merge walk over two sorted ArrayData.
    * Leading NULL slots are skipped, not read: `sort_array` places nulls
    * FIRST, and `ArrayData.getLong` on a null slot returns the zeroed
    * backing word — a phantom 0 that both under-counts (walks past real
    * negatives) and over-counts (matches a genuine 0 on the other side).
    * A null element is not a set member on either engine (DuckDB's
    * `list_intersect` ignores nulls too), so skipping keeps oracle parity.
    */
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && a.isNullAt(i)) i += 1
    while (j < nb && b.isNullAt(j)) j += 1
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** Codegen'd merge-intersection count; inputs MUST be sorted distinct
  * `array<bigint>` (produce them with [[SetOps.sortedSet]]). The element
  * type is ENFORCED at analysis: the merge walk reads 8-byte slots, so an
  * `array<int>` operand slipping through would silently misread two
  * packed ints as one long — the same silent-misread class
  * [[FloatVecDotExpr]] guards against with its `inputTypes`.
  */
case class IntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes =
    Seq(org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))
  override def dataType: DataType = IntegerType
  override def nullSafeEval(l: Any, r: Any): Any =
    SetOps.count(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SetOps.count($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntersectCountExpr =
    copy(left = l, right = r)
  override def prettyName: String = "set_intersect_count"
}
