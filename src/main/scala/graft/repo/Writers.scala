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

  /** One batch write — overridable seam (tests inject faults here). */
  protected def writeBatch(df: DataFrame): Unit =
    if (replace) repo.replaceRecords(df) else repo.extend(df)

  /** Flush with one retry after recreating the repo's directories — the
    * reference's `_write` recreates a racily-deleted table dir and tries
    * again (core.py:488-497); same contract for flaky object stores.
    * The retry fires ONLY when the table directory is actually gone (the
    * raced case the reference guards — the exception type itself is
    * unreliable: a vanished dir surfaces as AnalysisException /
    * SparkException-wrapped IO errors, not a bare IOException). Any other
    * failure rethrows with the batch still buffered: a failure during job
    * commit can leave a subset of task outputs visible
    * (FileOutputCommitter promotes them one rename at a time), and a
    * blind re-append there would duplicate those rows.
    */
  def flush(): Unit = if (buf.nonEmpty) {
    val df = repo.spark.createDataFrame(buf.toList.asJava, schema)
    try writeBatch(df)
    catch {
      case scala.util.control.NonFatal(_) if !repo.exists =>
        repo.mkdirs()
        writeBatch(df)
    }
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

  /** Buffer a batch. Counting a lazy plan is one Spark job per batch, so
    * callers that already know the row count pass it as `rowsHint` and the
    * job is skipped; without a hint the count runs (the reference counts
    * eagerly too — its batches are materialized pandas frames).
    */
  def add(df: DataFrame, rowsHint: Long = -1L): Unit = {
    buf += df
    bufferedRows += (if (rowsHint >= 0L) rowsHint else df.count())
    if (bufferedRows >= rowLimit) flush()
  }

  /** Same raced-deleted-directory retry contract as [[RecordWriter.flush]]
    * (the family's shared `_write` recreates and retries, core.py:488-497)
    * — previously only the record writer honored it, so this writer threw
    * on the exact transient the family doc says is retried.
    */
  def flush(): Unit = if (buf.nonEmpty) {
    val union = buf.reduce(_.unionByName(_, allowMissingColumns = true))
    def write(): Unit =
      if (replace) repo.replaceRecords(union) else repo.extend(union)
    try write()
    catch {
      case scala.util.control.NonFatal(_) if !repo.exists =>
        repo.mkdirs()
        write()
    }
    buf.clear()
    bufferedRows = 0L
  }

  override def close(): Unit = flush()
}
