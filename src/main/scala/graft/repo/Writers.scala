package graft.repo

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.StructType

/** Buffered micro-batch ingestion — the Spark analog of the reference's
  * writer family (/root/reference/parquetranger/core.py:458-523). Records
  * accumulate on the driver and flush as one distributed append (or upsert)
  * per batch; `close()` flushes the remainder. At cluster scale the same
  * flush path runs under Structured Streaming `foreachBatch` (see
  * [[graft.streaming.RepoSink]]).
  */
/** Dict-record writer (`RecordWriter`, core.py:458-505; contract
  * tests/test_writer.py:8-23). Records are projected onto `schema`: missing
  * fields become null, unknown fields are dropped — which also covers the
  * reference's `FixedRecordWriter` (core.py:508-513, tests/test_writer.py:53-64).
  * `replace = true` flushes via keyed upsert instead of append — the
  * reference's "replacing writer" factories (core.py:239-243).
  */
class RecordWriter(
    val repo: TableRepo,
    val schema: StructType,
    val recordLimit: Int = 10000,
    val replace: Boolean = false
) extends AutoCloseable {
  private val buf = ArrayBuffer[Row]()

  def add(rec: Map[String, Any]): Unit = {
    buf += Row.fromSeq(schema.fieldNames.toIndexedSeq.map(n => rec.getOrElse(n, null)))
    if (buf.size >= recordLimit) flush()
  }

  def addAll(recs: Iterable[Map[String, Any]]): Unit = recs.foreach(add)

  def flush(): Unit = if (buf.nonEmpty) {
    val df = repo.spark.createDataFrame(buf.toList.asJava, schema)
    if (replace) repo.replaceRecords(df) else repo.extend(df)
    buf.clear()
  }

  override def close(): Unit = flush()
}

/** DataFrame-batch writer counting rows, not batches (`DfBatchWriter`,
  * core.py:516-523; contract tests/test_writer.py:26-50). Buffers lazy
  * plans and flushes their union — rows never land on the driver.
  */
class DfBatchWriter(
    val repo: TableRepo,
    val rowLimit: Long = 1000000L,
    val replace: Boolean = false
) extends AutoCloseable {
  private val buf = ArrayBuffer[DataFrame]()
  private var bufferedRows = 0L

  def add(df: DataFrame): Unit = {
    buf += df
    bufferedRows += df.count()
    if (bufferedRows >= rowLimit) flush()
  }

  def flush(): Unit = if (buf.nonEmpty) {
    val union = buf.reduce(_.unionByName(_, allowMissingColumns = true))
    if (replace) repo.replaceRecords(union) else repo.extend(union)
    buf.clear()
    bufferedRows = 0L
  }

  override def close(): Unit = flush()
}
