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

  test("a writerId starting with '_' is rejected before anything is staged") {
    // `_append-x` would stage under `_graft_staging/_append-x-<batch>`,
    // matching sweepAppendStaging's plain-append prefix — vacuum could
    // reclaim a crashed-but-replayable exactly-once writer's staging
    // under the wrong (shorter-ttl) policy. Underscore names are the
    // repo's own namespace; refuse them loudly at the ledger boundary.
    val repo = new TableRepo(scratch("eo-writerid"), spark)
    val e = intercept[IllegalArgumentException] {
      repo.extendExactlyOnce(batch(0, 3), "_append-evil", 0L)
    }
    assert(e.getMessage.contains("writerId"))
    assert(!fs.exists(new Path(repo.root, "_graft_staging")), "nothing staged")
    assert(intercept[IllegalArgumentException] {
      repo.hasLedger("_w")
    }.getMessage.contains("writerId"))
  }

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

  /** Build the crash window: batch staged + manifest pinned + ONE staged
    * file already renamed into the current version dir, marker absent.
    * Returns nothing — the repo is left mid-crash.
    */
  private def crashMidRename(repo: TableRepo, lo: Int, hi: Int, batchId: Long): Unit = {
    repo.stageBatchOnly(batch(lo, hi), "w", batchId)
    val staging = new Path(s"${repo.root}/_graft_staging/w-$batchId")
    val staged = {
      val it = fs.listFiles(staging, true)
      val b = scala.collection.mutable.ArrayBuffer[Path]()
      while (it.hasNext) { val f = it.next(); if (f.getPath.getName.endsWith(".parquet")) b += f.getPath }
      b.toSeq
    }
    assert(staged.size >= 2, s"need multiple staged files, got ${staged.size}")
    val moved = staged.head
    val rel = moved.toString.stripPrefix(fs.makeQualified(staging).toString + "/")
    val cur = repo.snapshotVersions.lastOption.map(v => s"data-v$v").getOrElse("data")
    assert(fs.rename(moved, new Path(s"${repo.root}/$cur/$rel")))
  }

  test("crash window spanning a COMPACT: the half-landed batch is not doubled") {
    val repo = new TableRepo(scratch("eo-compact"), spark, maxRecordsPerFile = 3)
    repo.extendExactlyOnce(batch(0, 5), "w", 0L)
    crashMidRename(repo, 5, 17, 1L)
    assert(repo.count() == 5, "an uncommitted batch's landed prefix must be invisible")
    // the data-PRESERVING rewrite must not carry the landed file into the
    // new version — replay pulls it back from the grace dir and re-lands
    // the whole batch, which would double those rows
    repo.compact(targetRecordsPerFile = 4)
    assert(repo.count() == 5, "compact must not surface the uncommitted prefix")
    assert(repo.extendExactlyOnce(batch(5, 17), "w", 1L))
    assert(repo.count() == 17)
    assert(repo.getFullDf.select("k").distinct().count() == 17, "no doubled rows")
  }

  test("vacuum keeps a grace version a pending manifest still pins; replay lands the full batch") {
    val repo = new TableRepo(scratch("eo-vacuum"), spark,
      maxRecordsPerFile = 3, snapshotRetention = 2)
    repo.extendExactlyOnce(batch(0, 5), "w", 0L)
    crashMidRename(repo, 5, 17, 1L)
    repo.compact(targetRecordsPerFile = 4) // plain data dir becomes grace, still pinned
    repo.vacuum(keepLast = 1)              // must NOT delete the pinned grace dir
    assert(repo.extendExactlyOnce(batch(5, 17), "w", 1L),
      "replay must land the batch after vacuum")
    assert(repo.count() == 17, "vacuum deleted a pinned grace version: partial batch")
    assert(repo.getFullDf.select("k").distinct().count() == 17)
  }

  test("seeded crash/compact/vacuum gauntlet resolves every batch exactly once") {
    // random walk over the whole protocol surface, respecting the
    // streaming engine's contract (a crashed batch is replayed before the
    // next batchId is attempted — hwm subsumption depends on in-order
    // commits): each batch either commits cleanly, crashes after staging,
    // or crashes mid-rename; compact (data-preserving rewrite) and
    // vacuum fire randomly both inside and outside the crash windows.
    // Every ledger bug fixed this round (rewrite carrying a landed
    // prefix, vacuum deleting a pinned grace dir, hwm over-trim) fails
    // this test.
    val rng = new scala.util.Random(1117)
    val repo = new TableRepo(scratch("eo-gauntlet"), spark,
      maxRecordsPerFile = 3, snapshotRetention = 2)
    var nextRow = 0
    var expected = 0
    val ranges = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long)]
    def maybeRewrite(): Unit = {
      if (rng.nextInt(3) == 0) repo.compact(targetRecordsPerFile = 5 + rng.nextInt(10))
      if (rng.nextInt(4) == 0) repo.vacuum()
    }
    for (b <- 0 until 12) {
      val lo = nextRow; val hi = nextRow + 4 + rng.nextInt(6); nextRow = hi
      expected += hi - lo
      ranges += ((lo, hi, b.toLong))
      rng.nextInt(3) match {
        case 0 =>
          assert(repo.extendExactlyOnce(batch(lo, hi), "w", b.toLong))
        case 1 => // crash after staging; a rewrite may land before the replay
          repo.stageBatchOnly(batch(lo, hi), "w", b.toLong)
          maybeRewrite()
          assert(repo.extendExactlyOnce(batch(lo, hi), "w", b.toLong),
            s"replay of staged-crash batch $b must land it")
        case 2 => // crash mid-rename; a rewrite may land before the replay
          crashMidRename(repo, lo, hi, b.toLong)
          maybeRewrite()
          assert(repo.extendExactlyOnce(batch(lo, hi), "w", b.toLong),
            s"replay of mid-rename-crash batch $b must land it")
      }
      maybeRewrite()
    }
    // full replay of the whole history: every batch is a no-op
    ranges.foreach { case (lo, hi, id) =>
      assert(!repo.extendExactlyOnce(batch(lo, hi), "w", id),
        s"batch $id replayed after commit must no-op")
    }
    assert(repo.count() == expected, "row count drifted from the model")
    assert(repo.getFullDf.select("k").distinct().count() == expected,
      "duplicate or missing keys after the gauntlet")
  }

  /** Hand-build the crash shape "marker created, manifest delete lost":
    * re-create the batch's .pending manifest naming files that ARE
    * committed in the current version dir.
    */
  private def staleManifestFor(repo: TableRepo, writerId: String, batchId: Long,
      files: Seq[String]): Unit = {
    // the manifest's target line carries the RAW dataPath string (what
    // stageBatchOnly writes); rels are stripped against its qualified form
    val dataRaw =
      s"${repo.root}/${repo.snapshotVersions.lastOption.map(v => s"data-v$v").getOrElse("data")}"
    val dataQual = fs.makeQualified(new Path(dataRaw))
    val rels = files.map(_.stripPrefix(dataQual.toString + "/"))
    val p = new Path(s"${repo.root}/_graft_ledger/$writerId/$batchId.pending")
    val out = fs.create(p, true)
    try out.write((dataRaw +: rels).mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  test("a stale manifest from a crash between marker and manifest-delete is cleaned, files visible again") {
    val repo = new TableRepo(scratch("eo-stale-manifest"), spark)
    assert(repo.extendExactlyOnce(batch(0, 10), "w", 0L))
    val before = repo.paths.toSet
    assert(repo.extendExactlyOnce(batch(10, 20), "w", 1L))
    val landed = (repo.paths.toSet -- before).toSeq
    assert(landed.nonEmpty)
    // crash shape: batch 1 is durably committed (marker exists) but its
    // manifest delete was lost — the stale manifest hides the committed
    // files from every read and would pin the version dir forever
    staleManifestFor(repo, "w", 1L, landed)
    assert(repo.count() == 10, "sanity: the stale manifest hides the committed files")
    // the streaming replay of the same batchId cleans its own leftover
    assert(!repo.extendExactlyOnce(batch(10, 20), "w", 1L), "still a committed no-op")
    assert(repo.count() == 20, "replay must remove the stale manifest")
    assert(!fs.exists(new Path(s"${repo.root}/_graft_ledger/w/1.pending")))
    // …and for a writer that NEVER replays (abandoned stream), any other
    // mutating op sweeps it
    staleManifestFor(repo, "w", 1L, landed)
    assert(repo.count() == 10)
    repo.extend(batch(20, 23))
    assert(repo.count() == 23, "a mutating op must sweep the stale manifest")
    assert(!fs.exists(new Path(s"${repo.root}/_graft_ledger/w/1.pending")))
  }

  test("two writers interleaving under injected stale manifests: every batch exactly once, no in-flight manifest swept") {
    // Two concurrent exactly-once writers (their own ids, their own
    // ledgers) hammer one repo while crash-shaped STALE manifests are
    // repeatedly injected for ALREADY-COMMITTED batches. The head-of-op
    // sweep each writer triggers must clean exactly the stale leftovers
    // (theirs or the other writer's) and must never touch a genuinely
    // in-flight batch — in-JVM that is enforced by the write monitor
    // (the whole extendExactlyOnce protocol holds it, so a manifest the
    // sweep can SEE with its commit marker present is definitively
    // stale); this test drives the interleaving to prove the reasoning
    // holds under real contention, not just in the single-writer specs.
    val repo = new TableRepo(scratch("eo-two-writers"), spark)
    val batches = 10
    @volatile var err: Throwable = null
    def writer(id: String, base: Int): Thread = new Thread(() => {
      try {
        for (b <- 0 until batches) {
          val lo = base + b * 10
          assert(repo.extendExactlyOnce(batch(lo, lo + 10), id, b.toLong),
            s"$id batch $b must land (fresh id space)")
          if (b % 3 == 1) {
            // crash shape: this writer's PREVIOUS batch left its manifest
            // behind (marker exists, manifest-delete lost) — the other
            // writer's next op (or our own) must sweep it, not refuse it.
            // The injection holds the repo's write monitor like every real
            // protocol step: a bare fs.create here races the OTHER
            // writer's sweep deleting the same path mid-create, which on
            // the local checksum filesystem dies in the .crc chmod — a
            // harness artifact, not a protocol state (real manifests are
            // only ever created under the monitor)
            TableRepo.monitorFor(repo.root).synchronized {
              val landed = repo.paths // any files; target line is what matters
              staleManifestFor(repo, id, (b - 1).toLong, landed.take(1))
            }
          }
        }
      } catch { case t: Throwable => err = t }
    })
    val a = writer("wa", 0)
    val c = writer("wc", 100000)
    a.start(); c.start()
    a.join(180000); c.join(180000)
    assert(!a.isAlive && !c.isAlive, "writers wedged")
    if (err != null) throw new AssertionError("writer failed", err)
    // one final mutating op sweeps any stale manifest injected on the
    // last iterations, then: every batch exactly once, ledgers clean
    repo.extend(batch(-10, 0))
    assert(repo.count() == 2L * batches * 10 + 10,
      s"every batch exactly once, got ${repo.count()}")
    val ks = repo.getFullDf.select(col("k")).collect().map(_.getLong(0)).sorted
    assert(ks.distinct.length == ks.length, "no batch landed twice")
    Seq("wa", "wc").foreach { id =>
      val leftover = fs.listStatus(new Path(s"${repo.root}/_graft_ledger/$id"))
        .map(_.getPath.getName).filter(_.endsWith(".pending"))
      assert(leftover.isEmpty, s"$id stale manifests must be swept, got ${leftover.toSeq}")
    }
    // and replays of every batch from both writers are committed no-ops
    for (b <- 0 until batches) {
      assert(!repo.extendExactlyOnce(batch(b * 10, b * 10 + 10), "wa", b.toLong))
      assert(!repo.extendExactlyOnce(batch(100000 + b * 10, 100000 + b * 10 + 10), "wc", b.toLong))
    }
    assert(repo.count() == 2L * batches * 10 + 10, "replays landed nothing")
  }

  test("a foreign digit-only .pending name past Long range is skipped, not fatal") {
    val repo = new TableRepo(scratch("eo-overflow-manifest"), spark)
    assert(repo.extendExactlyOnce(batch(0, 10), "w", 0L))
    // 20 digits: passes forall(_.isDigit) but overflows Long — before the
    // Try-parse the sweep threw NumberFormatException here, wedging EVERY
    // mutating op on the table until manual cleanup
    val p = new Path(s"${repo.root}/_graft_ledger/w/99999999999999999999.pending")
    val out = fs.create(p, true)
    out.write("/nonexistent-foreign-target\n".getBytes("UTF-8")); out.close()
    repo.extend(batch(10, 13))
    assert(repo.count() == 13, "mutating ops proceed past the unparseable manifest")
    assert(fs.exists(p), "an unparseable foreign manifest is skipped, not deleted")
  }

  test("a corrupt (empty-target) manifest is refused, not 'recovered' into a partial batch") {
    val repo = new TableRepo(scratch("eo-corrupt-manifest"), spark)
    repo.extendExactlyOnce(batch(0, 5), "w", 0L)
    // a torn manifest cannot come from the atomic temp+rename writer —
    // simulate a foreign/corrupt one for an UNCOMMITTED batch id
    val p = new Path(s"${repo.root}/_graft_ledger/w/1.pending")
    fs.create(p, true).close() // zero bytes: empty target line
    val ex = intercept[IllegalArgumentException] {
      repo.extendExactlyOnce(batch(5, 10), "w", 1L)
    }
    assert(ex.getMessage.contains("corrupt batch manifest"), ex.getMessage)
    assert(repo.count() == 5, "nothing may land from a corrupt manifest")
  }

  test("purge clears the ledger and staging: a re-created repo accepts the same writer ids") {
    val repo = new TableRepo(scratch("eo-purge"), spark)
    (0 until 5).foreach(b => assert(repo.extendExactlyOnce(batch(b * 3, b * 3 + 3), "w", b.toLong)))
    assert(repo.count() == 15)
    repo.purge()
    assert(!fs.exists(new Path(s"${repo.root}/_graft_ledger")), "purge must drop the ledger")
    assert(!fs.exists(new Path(s"${repo.root}/_graft_staging")), "purge must drop staging")
    // a fresh pipeline reusing the writer id must not have its batches
    // dropped as replays of the purged table's history
    assert(repo.extendExactlyOnce(batch(0, 4), "w", 0L), "batch 0 must land after purge")
    assert(repo.extendExactlyOnce(batch(4, 8), "w", 1L))
    assert(repo.count() == 8)
  }

  test("a pruned upsert never consumes an uncommitted batch's landed prefix (grouped dirs)") {
    val repo = new TableRepo(scratch("eo-pruned-invis"), spark,
      groupCols = Seq("g"), keyCols = Seq("k"), maxRecordsPerFile = 3)
    import spark.implicits._
    def gbatch(lo: Int, hi: Int): DataFrame =
      (lo until hi).map(i => (i.toLong, s"row-$i", "a")).toDF("k", "v", "g")
    assert(repo.extendExactlyOnce(gbatch(0, 5), "w", 0L))
    // crash shape: batch 1 staged + manifest pinned + ONE staged file
    // already renamed into the g=a partition dir, marker absent
    repo.stageBatchOnly(gbatch(5, 17), "w", 1L)
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
    val cur = repo.snapshotVersions.lastOption.map(v => s"data-v$v").getOrElse("data")
    val landedPath = new Path(s"${repo.root}/$cur/$rel")
    assert(fs.rename(moved, landedPath))
    assert(repo.count() == 5, "landed prefix invisible")
    // a pruned upsert over the SAME group and overlapping keys must not
    // read the landed prefix into its merge nor delete it out from under
    // the batch's replay
    repo.replaceRecordsPruned(
      Seq((5L, "UPD-5", "a"), (6L, "UPD-6", "a")).toDF("k", "v", "g"), byGroups = true)
    assert(fs.exists(landedPath),
      "the uncommitted landed file must survive the pruned merge untouched")
    assert(repo.count() == 7, "visible rows: 5 originals + 2 new upsert keys")
    // replay completes the batch exactly-once; the upsert's k=5/6 rows and
    // the batch's k=5/6 rows coexist as duplicate keys by WRITE ORDER
    // (the upsert logically preceded the batch's commit)
    assert(repo.extendExactlyOnce(gbatch(5, 17), "w", 1L))
    assert(repo.getFullDf.where(col("k") >= 7).select("k").distinct().count() == 10)
    assert(repo.count() == 19, "5 originals + 2 upserted + 12 batch rows")
  }

  test("ledger stays O(1): 100 batches leave only the high-water mark; trimmed replays no-op") {
    val repo = new TableRepo(scratch("eo-trim"), spark)
    val df = batch(0, 3)
    (0 until 100).foreach(b => assert(repo.extendExactlyOnce(df, "w", b.toLong)))
    val entries = fs.listStatus(new Path(s"${repo.root}/_graft_ledger/w"))
      .map(_.getPath.getName).toSeq
    assert(entries.size <= 2, s"ledger must not grow with batch count: $entries")
    (0 until 100).foreach(b => assert(repo.isBatchCommitted("w", b.toLong)))
    assert(!repo.extendExactlyOnce(df, "w", 0L), "a trimmed batch must replay as a no-op")
    assert(!repo.extendExactlyOnce(df, "w", 57L), "a trimmed batch must replay as a no-op")
    assert(repo.count() == 300)
  }
}
