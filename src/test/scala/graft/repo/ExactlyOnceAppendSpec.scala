package graft.repo

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.streaming.RepoSink

/** Crash/replay coverage for the exactly-once append ledger
  * ([[TableRepo.extendExactlyOnce]]). Crash-window states are built with
  * the REAL protocol steps (`stageBatchOnly` = stage + manifest), then
  * recovery is exercised by calling the public entry point again — the
  * same call path a restarted streaming query takes.
  */
class ExactlyOnceAppendSpec extends SparkSuite {

  private def batch(lo: Int, hi: Int): DataFrame = {
    import spark.implicits._
    (lo until hi).map(i => (i.toLong, s"row-$i")).toDF("k", "v")
  }

  private def fs: FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  test("a replayed batch lands exactly once and reports already-committed") {
    val repo = new TableRepo(scratch("eo-replay"), spark)
    assert(repo.extendExactlyOnce(batch(0, 10), "w", 0L))
    assert(!repo.extendExactlyOnce(batch(0, 10), "w", 0L), "replay must be a no-op")
    assert(repo.count() == 10)
    assert(repo.isBatchCommitted("w", 0L))
    assert(!repo.isBatchCommitted("w", 1L))
    // distinct batches still append
    assert(repo.extendExactlyOnce(batch(10, 15), "w", 1L))
    assert(repo.count() == 15)
  }

  test("crash after staging, before any rename: replay lands the staged bytes once") {
    val repo = new TableRepo(scratch("eo-staged"), spark)
    repo.extendExactlyOnce(batch(0, 5), "w", 0L)
    // crashed attempt: staged + manifest written, nothing renamed yet
    repo.stageBatchOnly(batch(5, 12), "w", 1L)
    assert(repo.count() == 5, "a staged batch must be invisible to readers")
    // the restarted query replays the same batchId; the manifest freezes
    // the staged bytes, so even a (contract-violating) different df
    // argument cannot change what lands
    assert(repo.extendExactlyOnce(batch(100, 200), "w", 1L))
    assert(repo.count() == 12)
    assert(repo.getFullDf.where(col("k") >= 100).count() == 0,
      "recovery must land the manifest's staged bytes, not re-run the job")
  }

  test("crash mid-rename: replay completes the remaining files, duplicating none") {
    val repo = new TableRepo(scratch("eo-midrename"), spark,
      maxRecordsPerFile = 3) // force several files per batch
    repo.extendExactlyOnce(batch(0, 5), "w", 0L)
    repo.stageBatchOnly(batch(5, 17), "w", 1L)
    // simulate the crashed attempt having landed ONE staged file already
    val staging = new Path(s"${repo.root}/_graft_staging/w-1")
    val staged = {
      val it = fs.listFiles(staging, true)
      val b = scala.collection.mutable.ArrayBuffer[Path]()
      while (it.hasNext) { val f = it.next(); if (f.getPath.getName.endsWith(".parquet")) b += f.getPath }
      b.toSeq
    }
    assert(staged.size >= 2, s"need multiple staged files, got ${staged.size}")
    val moved = staged.head
    val rel = moved.toString.stripPrefix(fs.makeQualified(staging).toString + "/")
    assert(fs.rename(moved, new Path(s"${repo.root}/data/$rel")))
    // recovery: the moved file is skipped, the rest are landed
    assert(repo.extendExactlyOnce(batch(5, 17), "w", 1L))
    assert(repo.count() == 17)
    assert(repo.getFullDf.select("k").distinct().count() == 17, "no duplicated rows")
  }

  test("crash window spanning a full rewrite: landed files are recovered from the grace version") {
    val repo = new TableRepo(scratch("eo-rewrite"), spark, maxRecordsPerFile = 3)
    repo.extendExactlyOnce(batch(0, 5), "w", 0L)
    repo.stageBatchOnly(batch(5, 17), "w", 1L)
    val staging = new Path(s"${repo.root}/_graft_staging/w-1")
    val staged = {
      val it = fs.listFiles(staging, true)
      val b = scala.collection.mutable.ArrayBuffer[Path]()
      while (it.hasNext) { val f = it.next(); if (f.getPath.getName.endsWith(".parquet")) b += f.getPath }
      b.toSeq
    }
    assert(staged.size >= 2)
    val moved = staged.head
    val rel = moved.toString.stripPrefix(fs.makeQualified(staging).toString + "/")
    assert(fs.rename(moved, new Path(s"${repo.root}/data/$rel")))
    // a full rewrite now supersedes the pinned target; the crashed
    // attempt's landed file survives only in the grace version dir
    repo.replaceAll(batch(0, 5))
    assert(repo.count() == 5)
    // recovery pulls the landed file back from the grace dir, then lands
    // the whole batch into the CURRENT version
    assert(repo.extendExactlyOnce(batch(5, 17), "w", 1L))
    assert(repo.count() == 17)
    assert(repo.getFullDf.select("k").distinct().count() == 17)
  }

  test("grouped layout: staged partition dirs are recreated on commit and replay is clean") {
    val repo = new TableRepo(scratch("eo-grouped"), spark, groupCols = Seq("g"))
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b:x")).toDF("k", "g") // escaped dir value
    assert(repo.extendExactlyOnce(df, "w", 0L))
    assert(!repo.extendExactlyOnce(df, "w", 0L))
    assert(repo.count() == 3)
    assertSameRows(repo.getFullDf.select("k", "g").orderBy("k"), df.orderBy("k"))
  }

  test("exactly-once appends racing compact lose no batch (both orders)") {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val repo = new TableRepo(scratch("eo-race-compact"), spark)
    repo.extendExactlyOnce(batch(0, 100), "seed", 0L)
    val rounds = 6
    val pool = Executors.newFixedThreadPool(2)
    try {
      (0 until rounds).foreach { r =>
        val start = new CountDownLatch(1)
        // odd rounds bias the append first, even rounds the compact —
        // the write monitor must serialize BOTH interleavings, and the
        // ledger commit (stage + manifest + renames + marker) must land
        // entirely on one side of every version swap
        val f1 = pool.submit(new Runnable { def run(): Unit = {
          start.await(); if (r % 2 == 1) Thread.sleep(5)
          repo.extendExactlyOnce(batch(1000 + 10 * r, 1000 + 10 * r + 10), "w", r.toLong): Unit
        } })
        val f2 = pool.submit(new Runnable { def run(): Unit = {
          start.await(); if (r % 2 == 0) Thread.sleep(5)
          repo.compact(targetRecordsPerFile = 40)
        } })
        start.countDown()
        f1.get(120, TimeUnit.SECONDS); f2.get(120, TimeUnit.SECONDS): Unit
      }
    } finally pool.shutdownNow()
    assert(repo.count() == 100 + 10 * rounds, "a ledgered batch was lost to a version swap")
    assert(repo.getFullDf.select("k").distinct().count() == 100 + 10 * rounds)
    (0 until rounds).foreach(r => assert(repo.isBatchCommitted("w", r.toLong)))
    // and every batch replays as a no-op after the dust settles
    (0 until rounds).foreach(r =>
      assert(!repo.extendExactlyOnce(batch(1000 + 10 * r, 1000 + 10 * r + 10), "w", r.toLong)))
    assert(repo.count() == 100 + 10 * rounds)
  }

  test("RepoSink exactlyOnce end-to-end: restart from the checkpoint re-lands nothing") {
    val repo = new TableRepo(scratch("eo-sink"), spark)
    val srcDir = scratch("eo-sink-src")
    val ckpt = scratch("eo-sink-ckpt")
    batch(0, 20).coalesce(1).write.json(srcDir)
    val schema = batch(0, 1).schema
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).json(srcDir)
      val q = RepoSink.start(stream, repo, ckpt, exactlyOnce = true, writerId = "sink")
      q.awaitTermination()
    }
    runOnce()
    assert(repo.count() == 20)
    runOnce() // restart on the same checkpoint: no new files, no replays
    assert(repo.count() == 20)
    assert(repo.isBatchCommitted("sink", 0L))
  }
}
