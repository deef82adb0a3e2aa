package graft.repo

import org.apache.spark.sql.types._

import graft.SparkSuite

/** Port of /root/reference/parquetranger/tests/test_writer.py. */
class WritersSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("i", LongType), StructField("thing", LongType)))

  test("record writer flushes on limit and on close (test_writer.py:8-23)") {
    val repo = new TableRepo(scratch("rw"), spark)
    val w = new RecordWriter(repo, schema, recordLimit = 7)
    (0 until 30).foreach(i => w.add(Map("i" -> i.toLong, "thing" -> (i * 10).toLong)))
    assert(repo.count() == 28) // 4 full flushes of 7
    w.close()
    assert(repo.count() == 30)
  }

  test("replacing record writer upserts by key (test_writer.py:17-23)") {
    val repo = new TableRepo(scratch("rw-rep"), spark, keyCols = Seq("i"))
    val w = new RecordWriter(repo, schema, recordLimit = 100, replace = true)
    (0 until 30).foreach(i => w.add(Map("i" -> i.toLong, "thing" -> (i * 10).toLong)))
    w.close()
    val w2 = new RecordWriter(repo, schema, recordLimit = 100, replace = true)
    w2.add(Map("i" -> 10L, "thing" -> 1L))
    w2.close()
    assert(repo.count() == 30)
    assert(repo.getFullDf.filter($"i" === 10L).select("thing").as[Long].head() == 1L)
  }

  test("records project onto the schema: missing null, extras dropped (test_writer.py:53-64)") {
    val repo = new TableRepo(scratch("rw-fixed"), spark)
    val w = new RecordWriter(repo, schema, recordLimit = 10)
    w.add(Map("i" -> 1L, "junk" -> "zzz")) // thing missing, junk dropped
    w.close()
    val row = repo.getFullDf.collect().head
    assert(row.getLong(0) == 1L && row.isNullAt(1))
  }

  test("df-batch writer counts rows, not batches (test_writer.py:26-50)") {
    val repo = new TableRepo(scratch("dfw"), spark)
    val w = new DfBatchWriter(repo, rowLimit = 50)
    (0 until 20).foreach { b =>
      w.add((0 until 30).map(i => (b * 30 + i).toLong).toDF("v"))
    }
    w.close()
    assert(repo.count() == 600)
  }

  test("df-batch writer accepts a row-count hint (no count job per batch)") {
    val repo = new TableRepo(scratch("dfw-hint"), spark)
    val w = new DfBatchWriter(repo, rowLimit = 50)
    (0 until 4).foreach { b =>
      w.add((0 until 30).map(i => (b * 30 + i).toLong).toDF("v"), rowsHint = 30L)
    }
    w.close()
    assert(repo.count() == 120)
  }

  test("fixed-column writer factory restricts the schema (core.py:233,508-513)") {
    val repo = new TableRepo(scratch("rw-fixedcols"), spark)
    val w = repo.extendingFixedRecordWriter(schema, cols = Seq("i"), recordLimit = 10)
    w.add(Map("i" -> 5L, "thing" -> 50L)) // thing outside cols -> dropped
    w.close()
    assert(repo.getFullDf.columns.toSeq == Seq("i"))
    assert(repo.getFullDf.select("i").as[Long].head() == 5L)
  }

  test("record writer retries a failed flush after recreating dirs (core.py:488-497)") {
    val repo = new TableRepo(scratch("rw-retry"), spark)
    var failures = 0
    val w = new RecordWriter(repo, schema, recordLimit = 100) {
      override protected def writeBatch(df: org.apache.spark.sql.DataFrame): Unit = {
        if (failures == 0) { failures += 1; throw new java.io.IOException("dir vanished") }
        super.writeBatch(df)
      }
    }
    w.add(Map("i" -> 1L, "thing" -> 2L))
    w.close()
    assert(failures == 1)
    assert(repo.count() == 1)
  }

  test("a failed flush with the directory intact rethrows instead of re-appending") {
    val repo = new TableRepo(scratch("rw-noretry"), spark)
    // seed the repo so the data directory exists at failure time — a commit-
    // phase failure can leave partial task outputs visible, so a blind
    // re-append there could duplicate rows; the writer must surface it
    val seed = new RecordWriter(repo, schema, recordLimit = 100)
    seed.add(Map("i" -> 0L, "thing" -> 0L))
    seed.close()
    var attempts = 0
    val w = new RecordWriter(repo, schema, recordLimit = 100) {
      override protected def writeBatch(df: org.apache.spark.sql.DataFrame): Unit = {
        attempts += 1; throw new java.io.IOException("commit failed")
      }
    }
    w.add(Map("i" -> 1L, "thing" -> 2L))
    intercept[java.io.IOException](w.flush())
    assert(attempts == 1) // no blind retry
    assert(repo.count() == 1) // only the seed row
  }
}
