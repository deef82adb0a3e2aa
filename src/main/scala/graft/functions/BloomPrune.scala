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
    // The probe side always hashes LONGs (mightContainLong), so the build
    // side must insert from the same hash domain: Spark's stat.bloomFilter
    // happily builds from a STRING column via putBinary — a different hash
    // input — and every genuinely-present key would then probe FALSE.
    // False positives are semantically transparent here; false NEGATIVES
    // silently drop matching fact rows, so a non-integral build column is
    // an error, not a degradation.
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val dt = keys.schema(keyCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"bloom pruning probes the LONG hash domain; build column '$keyCol' is $dt — " +
        "cast it to an integral key first (a mismatched domain would produce false " +
        "negatives, which a pruning filter must never do)")
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
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  // LongType expected, with IMPLICIT-cast semantics (plain
  // ExpectsInputTypes only validates — an int probe that has always
  // worked would suddenly fail analysis): narrower integrals arrive
  // through a value cast into the same hash domain the sketch was built
  // from, instead of a raw operand hashing a different domain and
  // returning false for present keys
  override def inputTypes = Seq(org.apache.spark.sql.types.LongType)

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
