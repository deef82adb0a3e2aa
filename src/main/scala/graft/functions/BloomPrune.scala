package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Semi-join reduction via a broadcast Bloom sketch.
  *
  * The 100 TB problem this solves: a selective dimension filter leaves a
  * key set too big to broadcast as a hash relation but trivially small as
  * a BITMAP — a Bloom sketch over 10M keys at 3% fpp is ~7 MB. Sending the
  * sketch to every fact-side task and pre-filtering BEFORE the join's
  * exchange means the shuffle carries only (matching + fpp) rows instead
  * of the whole fact table. False positives are eliminated by the real
  * join that follows, so the operator is semantically transparent —
  * which is exactly why its oracle is the plain join.
  *
  * Spark's own runtime bloom filter (`InjectRuntimeFilter`) applies the
  * same idea automatically but only under shuffle-join plans it elects;
  * this explicit form pins the behavior and works for any key expression.
  * The codegen'd [[BloomContainsExpr]] keeps the probe inside
  * whole-stage codegen (one virtual call per row, no UDF boxing).
  */
object BloomPrune {

  /** Build a sketch of the (long) `keyCol` values of `keys` and return a
    * pruning predicate usable on any fact-side long column. Building runs
    * one lightweight aggregation job (partial sketches OR-merged on the
    * driver) — the standard two-phase sketch build.
    */
  def filterFor(keys: DataFrame, keyCol: String, expectedItems: Long,
      fpp: Double = 0.03)(probe: Column): Column = {
    val bf = keys.stat.bloomFilter(keyCol, expectedItems, fpp)
    val bytes = new ByteArrayOutputStream()
    bf.writeTo(bytes)
    GraftSql.column(BloomContainsExpr(GraftSql.expression(probe), bytes.toByteArray))
  }
}

/** `bloom_contains(key)` — true iff the sketch might contain the key.
  * The probe must be an INTEGRAL column (the sketch stores longs;
  * narrower ints widen identically on the codegen and interpreted
  * paths). The deserialized filter is codegen-referenced once per task,
  * not per row; the probe itself is two xxhash64 evaluations against a
  * bitmap.
  */
case class BloomContainsExpr(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  // Number.longValue keeps the interpreted path consistent with codegen,
  // where Java implicitly widens narrower integral types to long
  override def nullSafeEval(v: Any): Any =
    bf.mightContainLong(v.asInstanceOf[Number].longValue())

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", bf, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContainsExpr =
    copy(child = newChild)

  override def prettyName: String = "bloom_contains"
}
