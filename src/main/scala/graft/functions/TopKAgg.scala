package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Per-group top-k as a real AGGREGATE, not a window.
  *
  * `row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k` materializes
  * and sorts every group's full history before discarding all but k rows —
  * at 100 TB that is a giant sort per group feeding a 99.99% discard. This
  * aggregate keeps a k-bounded heap per group instead: partial aggregation
  * runs map-side (each task contributes at most k candidates per group to
  * the shuffle), the exchange carries O(groups x k) rows, and no sort of
  * the full data ever happens. Same output, ~|data|/(k x groups)
  * shuffle-volume reduction.
  *
  * Ordering is (value DESC, tie ASC); the caller supplies a tie column
  * that totally orders equal values, which makes the result set — and the
  * exploded ranks — deterministic (the q_topn_group rule).
  */
case class TopKAgg(
    value: Expression,
    tie: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  require(k > 0, s"topk: k must be positive, got $k")

  // input contract: value DOUBLE, tie BIGINT. ExpectsInputTypes is
  // private[sql] and children may be unresolved at construction, so the
  // contract is enforced by BOTH entry points inserting casts —
  // TopKAgg.topk (Column API) and the graft_topk SQL builder. Direct
  // construction must cast likewise.
  override def children: Seq[Expression] = Seq(value, tie)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("value", DoubleType, nullable = false),
      StructField("tie", LongType, nullable = false))), containsNull = false)

  /** a strictly precedes b in the top-k order. Double.compare gives
    * Spark's SQL total order (NaN greatest, -0.0 < 0.0), so a NaN value
    * ranks FIRST under DESC — exactly where `row_number() ORDER BY v
    * DESC` puts it. Null values are excluded by update() (the window
    * form ranks nulls last under DESC; coalesce the input if nulls must
    * occupy slots).
    */
  private def precedes(av: Double, at: Long, bv: Double, bt: Long): Boolean = {
    val c = java.lang.Double.compare(av, bv)
    c > 0 || (c == 0 && at < bt)
  }

  private def insert(buf: ArrayBuffer[(Double, Long)], v: Double, t: Long): Unit = {
    if (buf.length >= k && !precedes(v, t, buf.last._1, buf.last._2)) return
    var idx = 0
    while (idx < buf.length && precedes(buf(idx)._1, buf(idx)._2, v, t)) idx += 1
    buf.insert(idx, (v, t))
    if (buf.length > k) buf.remove(buf.length - 1): Unit
  }

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    new ArrayBuffer[(Double, Long)](k + 1)

  override def update(buf: ArrayBuffer[(Double, Long)], input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val v = value.eval(input)
    val t = tie.eval(input)
    if (v != null && t != null)
      insert(buf, v.asInstanceOf[Double], t.asInstanceOf[Long])
    buf
  }

  override def merge(buf: ArrayBuffer[(Double, Long)], other: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    other.foreach { case (v, t) => insert(buf, v, t) }
    buf
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(buf.map { case (v, t) => InternalRow(v, t) }.toArray[Any])

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.length)
    bb.putInt(buf.length)
    buf.foreach { case (v, t) => bb.putDouble(v); bb.putLong(t) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(Double, Long)](math.max(n, k) + 1)
    var i = 0
    while (i < n) { buf += ((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(value = newChildren(0), tie = newChildren(1))
  override def prettyName: String = "graft_topk"
}

object TopKAgg {
  /** Column-API entry: `topk(value, tie, k)` aggregate yielding the sorted
    * `array<struct<value, tie>>` of the group's top k.
    */
  def topk(value: Column, tie: Column, k: Int): Column =
    GraftSql.column(
      TopKAgg(GraftSql.expression(value.cast("double")),
        GraftSql.expression(tie.cast("bigint")), k).toAggregateExpression())
}
