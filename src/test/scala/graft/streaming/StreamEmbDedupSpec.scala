package graft.streaming

import scala.util.Random

import graft.SparkSuite

/** Streaming semantic near-dup: same-bucket arrivals within the horizon
  * emit exact-cosine hits against the first occupant; hits agree with the
  * batch bucket-collision cut on the same data; bucket state evicts at
  * the horizon (inline under continuous traffic).
  */
class StreamEmbDedupSpec extends SparkSuite {
  import spark.implicits._

  private val sec = 1000000L
  private val rng = new Random(123)

  private def vec(seed: Int): Array[Float] = {
    val r = new Random(seed)
    Array.fill(64)(r.nextFloat() - 0.5f)
  }

  /** near-twin: tiny perturbation keeps all SRP signs w.h.p. */
  private def near(v: Array[Float]): Array[Float] = v.map(x => x + 0.001f * math.signum(x))

  private def run(batches: Seq[Seq[(Long, Array[Float], Long)]], horizonUs: Long,
      name: String): Seq[(Long, Long, Int, Double)] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Array[Float], Long)]
    val stream = ms.toDF().toDF("vec_id", "embedding", "ts_us")
    val q = StreamEmbDedup.candidates(stream, horizonUs)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
  }

  test("a near-twin within the horizon hits with cosine ~1 in every table") {
    val v = vec(1)
    val got = run(Seq(
      Seq((1L, v, 10 * sec), (2L, vec(2), 11 * sec)),
      Seq((3L, near(v), 20 * sec))
    ), horizonUs = 600 * sec, name = "sed1")
    val hits3 = got.filter(_._1 == 3L)
    assert(hits3.nonEmpty, s"expected hits for the near-twin, got $got")
    assert(hits3.forall(h => h._2 == 1L && h._4 > 0.99), s"bad hits: $hits3")
    // 4 tables, twin signs preserved in each -> one hit per table
    assert(hits3.map(_._3).distinct.size == hits3.size)
    // first occupants never hit
    assert(!got.exists(_._1 == 1L))
  }

  test("null and zero-norm rows are dropped instead of wedging the query") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Option[Long], Array[Float], Option[Long])]
    val stream = ms.toDF().toDF("vec_id", "embedding", "ts_us")
    val q = StreamEmbDedup.candidates(stream, 600 * sec)
      .writeStream.outputMode("append").format("memory").queryName("sed_null").start()
    val v = vec(1)
    // pre-fix: a null vec_id/ts_us NPE'd the typed VecRow encoder and the
    // checkpoint replayed the same batch forever; an all-zero embedding
    // has no cosine, so every hit against it was a silent NaN
    ms.addData((Some(1L), v, Some(10 * sec)),
      (None, v, Some(11 * sec)), (Some(8L), v, None),
      (Some(9L), Array.fill(64)(0.0f), Some(12 * sec)))
    q.processAllAvailable()
    ms.addData((Some(3L), near(v), Some(20 * sec)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sed_null").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.nonEmpty && got.forall(h => h._1 == 3L && h._2 == 1L && h._3 > 0.99),
      s"the near-twin must hit doc 1 with dropped rows never occupying: ${got.toSeq}")
  }

  test("streamed hits equal the batch bucket-collision cut on the same data") {
    val data = (0 until 40).map { i =>
      val base = if (i % 4 == 0) near(vec(i / 4)) else vec(i % 7)
      (i.toLong, base, (100 + i) * sec)
    }
    // one row per batch, in ts order: the stream sees the same arrival
    // order the batch twin's min_by(ts, id) occupant rule assumes
    val got = run(data.map(Seq(_)), horizonUs = 3600 * sec, name = "sed2")
    val batch = StreamEmbDedup.batchTwin(data.toDF("vec_id", "embedding", "ts_us"),
        horizonUs = 3600 * sec)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
    assert(got.toSet == batch.toSet,
      s"stream/batch divergence:\n only-stream=${got.toSet -- batch.toSet}\n only-batch=${batch.toSet -- got.toSet}")
    assert(got.nonEmpty)
  }

  test("batch twin agrees across MULTIPLE horizon lapses (true backfill twin)") {
    // 25s horizon over 40 rows spaced 10s apart: every bucket re-occupies
    // several times over the replay — the regime the old global-first-
    // occupant twin got wrong beyond one horizon.
    val data = (0 until 40).map { i =>
      val base = if (i % 4 == 0) near(vec(i / 4)) else vec(i % 7)
      (i.toLong, base, (100 + 10 * i) * sec)
    }
    val got = run(data.map(Seq(_)), horizonUs = 25 * sec, name = "sed4")
    val batch = StreamEmbDedup.batchTwin(data.toDF("vec_id", "embedding", "ts_us"),
        horizonUs = 25 * sec)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
    assert(got.toSet == batch.toSet,
      s"stream/batch divergence:\n only-stream=${got.toSet -- batch.toSet}\n only-batch=${batch.toSet -- got.toSet}")
    assert(got.nonEmpty)
  }

  test("bits/tables parameters flow through to bucket layout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val v = vec(5)
    val ms = MemoryStream[(Long, Array[Float], Long)]
    val stream = ms.toDF().toDF("vec_id", "embedding", "ts_us")
    // production shape: occupancy-scaled bits (srpBitsFor), fewer tables
    val bits = graft.functions.VectorFns.srpBitsFor(100000, occupancy = 8) // 14
    val q = StreamEmbDedup.candidates(stream, horizonUs = 600 * sec, bits = bits, tables = 2)
      .writeStream.outputMode("append").format("memory").queryName("sedp").start()
    ms.addData((1L, v, 10 * sec)); q.processAllAvailable()
    ms.addData((2L, near(v), 20 * sec)); q.processAllAvailable()
    q.stop()
    val got = spark.table("sedp").collect().map(r => (r.getLong(0), r.getInt(2)))
    // a near-twin keeps all sign bits w.h.p. even at 14 bits; exactly one
    // hit per table, and table ids stay within the configured count
    assert(got.nonEmpty && got.forall(_._1 == 2L))
    assert(got.map(_._2).toSet.subsetOf(Set(0, 1)))
  }

  test("past the horizon a vector re-occupies silently, even under continuous traffic") {
    val v = vec(9)
    val got = run(Seq(
      Seq((1L, v, 10 * sec)),
      Seq((2L, near(v), 30 * sec)),   // within horizon of 1 -> hits
      Seq((3L, near(v), 100 * sec)),  // past 1's horizon, bucket never drained -> re-occupies
      Seq((4L, near(v), 110 * sec))   // hits the fresh occupant 3
    ), horizonUs = 60 * sec, name = "sed3")
    assert(got.filter(_._1 == 2L).forall(_._2 == 1L))
    assert(!got.exists(_._1 == 3L), s"doc 3 must re-occupy, got $got")
    assert(got.filter(_._1 == 4L).nonEmpty)
    assert(got.filter(_._1 == 4L).forall(_._2 == 3L), s"doc 4 must hit doc 3: $got")
  }
}
