package graft.repo

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Version-claim liveness: a crashed full rewrite's claim goes stale (its
  * heartbeat dies with it) and the next commit reclaims the orphan
  * `data-v<N>` dir — a FULL-SIZE table copy, the dominant crash-storage
  * leak at scale — while retiring the number with a permanent `.swept`
  * tombstone. Commit and expiry are two atomic renames of the same claim
  * file, so a reclaimed dir can never be blessed: a holder that stalls
  * past the ttl finds the tombstone at its bless point and aborts LOUDLY,
  * and a live holder (however slow) is kept fresh by the heartbeat.
  */
/** One-shot flag for the mid-write reclaim test: lives in a top-level
  * object so the task closure captures no suite instance (local mode —
  * same JVM, so the static is shared with the driver).
  */
object ClaimExpirySpecState {
  @volatile var yanked = false
}

class ClaimExpirySpec extends SparkSuite {
  import spark.implicits._

  private def fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def backdate(p: Path, ageMs: Long): Unit =
    fs.setTimes(p, System.currentTimeMillis() - ageMs, -1)

  /** Fabricate the on-disk shape a crashed rewrite leaves: a bare claim
    * (holder id content, stale mtime) and optionally its uncommitted
    * orphan version dir.
    */
  private def plantCrashedClaim(root: String, v: Int, withDir: Boolean): Unit = {
    assert(Lease.tryCreateExclusive(fs, new Path(s"$root/_graft_claim-v$v"),
      s"dead-process:${java.util.UUID.randomUUID()}"))
    backdate(new Path(s"$root/_graft_claim-v$v"), TableRepo.ClaimTtlMs + 60000)
    if (withDir)
      (0L until 40L).toDF("junk").write.parquet(s"$root/data-v$v")
  }

  test("a crashed rewrite's orphan dir is reclaimed at the next commit; its number is never reused") {
    val root = scratch("claim-reclaim")
    val repo = new TableRepo(root, spark)
    repo.extend((1L to 30L).map(i => (i, s"v$i")).toDF("id", "payload"))
    plantCrashedClaim(root, 5, withDir = true) // crashed mid-write: claim + orphan copy
    plantCrashedClaim(root, 6, withDir = false) // crashed before its write job started
    val pre = TableRepo.claimsExpired.get()

    repo.replaceAll((1L to 30L).map(i => (i, s"r$i")).toDF("id", "payload"))

    assert(TableRepo.claimsExpired.get() == pre + 2, "both crash shapes reclaimed")
    assert(!fs.exists(new Path(s"$root/data-v5")), "the orphan full-size copy is gone")
    assert(!fs.exists(new Path(s"$root/_graft_claim-v5")) &&
      fs.exists(new Path(s"$root/_graft_claim-v5.swept")), "claim retired to a tombstone")
    assert(fs.exists(new Path(s"$root/_graft_claim-v6.swept")))
    assert(repo.getFullDf.agg(count(lit(1))).head.getLong(0) == 30)
    assert(repo.getFullDf.filter(col("payload").startsWith("r")).count() == 30)

    // drive the committed chain up to and past the retired numbers: the
    // bump loop must skip 5 and 6 forever (reusing an expired number could
    // race the dead claimant's still-running write job)
    for (i <- 1 to 5)
      repo.replaceAll((1L to 30L).map(j => (j, s"round$i-$j")).toDF("id", "payload"))
    val versions = repo.snapshotVersions
    assert(!versions.contains(5) && !versions.contains(6),
      s"tombstoned numbers must never recommit: $versions")
    assert(versions.max == 7, s"five rewrites after v0 end at v7 (5 and 6 skipped): $versions")
    assert(!fs.exists(new Path(s"$root/data-v5")) && !fs.exists(new Path(s"$root/data-v6")))
    // once the committed head passes a tombstone it is spent (the bump
    // loop starts above the head; no claim, no possible bless) — the next
    // commit's sweep GCs it instead of paying for it forever
    repo.replaceAll((1L to 30L).map(i => (i, s"gc$i")).toDF("id", "payload"))
    assert(!fs.exists(new Path(s"$root/_graft_claim-v5.swept")) &&
      !fs.exists(new Path(s"$root/_graft_claim-v6.swept")),
      "spent tombstones below the committed head must be GC'd")
    assert(repo.snapshotVersions.max == 8 && !fs.exists(new Path(s"$root/data-v5")))
  }

  test("a version committed inside the listing→claim window is never re-claimed or clobbered") {
    // the bless rename REMOVES the winning claim file, so a freshly
    // committed number is re-claimable by a writer whose version listing
    // predates the bless — without the post-claim marker re-check, that
    // writer's "leftover predecessor" delete would destroy a LIVE
    // committed version another process already reported durable
    val root = scratch("claim-raced-commit")
    val repo = new TableRepo(root, spark)
    repo.extend((1L to 20L).toDF("id"))
    TableRepo.testClaimHook = Some(() => {
      // another process blesses v0 right after our listing: fabricate the
      // exact post-bless shape (marker carrying a claim id, no root claim)
      (100L until 120L).toDF("id").write.parquet(s"$root/data-v0")
      val mk = fs.create(new Path(s"$root/data-v0/_GRAFT_COMMIT"), true)
      mk.write("foreign:bless".getBytes("UTF-8")); mk.close()
    })
    repo.replaceAll((1L to 20L).toDF("id"))
    assert(TableRepo.testClaimHook.isEmpty, "the hook must have fired")
    assert(fs.exists(new Path(s"$root/data-v0/_GRAFT_COMMIT")),
      "the raced commit must survive untouched")
    assert(spark.read.parquet(s"$root/data-v0").count() == 20,
      "the raced commit's content must survive untouched")
    assert(repo.snapshotVersions == Seq(0, 1),
      "our rewrite must land ABOVE the raced commit, never on it")
    assert(repo.getFullDf.count() == 20)
  }

  test("a sweeper reclaiming THIS attempt mid-write turns the job failure into a clean retry") {
    // a rewrite stalled past the ttl can have its claim tombstoned and its
    // dir deleted while the write job still runs — the job dies with
    // file-not-found; the attempt must detect the tombstone, abort, and
    // retry at a fresh number instead of leaking the raw job error
    val root = scratch("claim-midwrite")
    val repo = new TableRepo(root, spark)
    repo.extend((1L to 15L).toDF("id"))
    val preAborts = TableRepo.claimExpiredAborts.get()
    ClaimExpirySpecState.yanked = false
    val rootCap = root // capture only the path, not the suite instance
    val df = (1L to 15L).toDF("id").repartition(1).as[Long].mapPartitions { it =>
      if (!ClaimExpirySpecState.yanked) {
        ClaimExpirySpecState.yanked = true
        // the sweeper's exact order: tombstone rename, then dir delete
        java.nio.file.Files.move(
          java.nio.file.Paths.get(rootCap, "_graft_claim-v0"),
          java.nio.file.Paths.get(rootCap, "_graft_claim-v0.swept"))
        val dir = java.nio.file.Paths.get(rootCap, "data-v0")
        if (java.nio.file.Files.exists(dir)) {
          java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
            .forEach(p => java.nio.file.Files.deleteIfExists(p): Unit)
        }
        throw new java.io.FileNotFoundException("data-v0 yanked by the sweeper mid-job")
      }
      it
    }.toDF("id")
    repo.replaceAll(df)
    assert(TableRepo.claimExpiredAborts.get() == preAborts + 1,
      "the mid-write reclaim must be detected via the tombstone and retried, not rethrown")
    assert(repo.snapshotVersions == Seq(1), "the retry lands on a fresh number")
    assert(!fs.exists(new Path(s"$root/data-v0")))
    assert(repo.getFullDf.count() == 15)
  }

  test("a FRESH foreign claim is a live rewrite: never swept, its number skipped") {
    val root = scratch("claim-fresh")
    val repo = new TableRepo(root, spark)
    repo.extend((1L to 20L).toDF("id"))
    // a live (fresh-heartbeat) in-flight rewrite in another process
    assert(Lease.tryCreateExclusive(fs, new Path(s"$root/_graft_claim-v0"),
      s"live-process:${java.util.UUID.randomUUID()}"))
    (0L until 10L).toDF("junk").write.parquet(s"$root/data-v0")
    val pre = TableRepo.claimsExpired.get()

    repo.replaceAll((1L to 20L).toDF("id"))

    assert(TableRepo.claimsExpired.get() == pre, "a fresh claim must not be swept")
    assert(fs.exists(new Path(s"$root/_graft_claim-v0")), "the live claim is untouched")
    assert(fs.exists(new Path(s"$root/data-v0")), "the live rewrite's dir is untouched")
    assert(repo.snapshotVersions == Seq(1), "the commit skipped the claimed number")

    // once the foreign holder dies (claim goes stale), vacuum reclaims it
    backdate(new Path(s"$root/_graft_claim-v0"), TableRepo.ClaimTtlMs + 60000)
    repo.vacuum()
    assert(TableRepo.claimsExpired.get() == pre + 1)
    assert(!fs.exists(new Path(s"$root/data-v0")))
    assert(fs.exists(new Path(s"$root/_graft_claim-v0.swept")))
    assert(repo.getFullDf.count() == 20)
  }

  test("a holder expired mid-flight aborts loudly at the bless point and retries — a reclaimed dir is never blessed") {
    val root = scratch("claim-expired-holder")
    val repo = new TableRepo(root, spark, maxRecordsPerFile = 10)
    repo.extend((1L to 50L).map(i => (i, s"v$i")).toDF("id", "payload"))
    val preAborts = TableRepo.claimExpiredAborts.get()
    var sweptVersion = -1
    TableRepo.testGapHook = Some(() => {
      // simulate a sweeper that (wrongly or rightly) expired this claim
      // while the rewrite ran: tombstone rename, then dir delete — the
      // exact order sweepExpiredClaims uses
      val claim = fs.listStatus(new Path(root)).map(_.getPath.getName)
        .collectFirst { case TableRepo.ClaimRe(n) => n.toInt }.get
      sweptVersion = claim
      assert(fs.rename(new Path(s"$root/_graft_claim-v$claim"),
        new Path(s"$root/_graft_claim-v$claim.swept")))
      fs.delete(new Path(s"$root/data-v$claim"), true)
    })

    repo.compact(1000L) // guarded rewrite: the hook fires right before the bless point

    assert(TableRepo.testGapHook.isEmpty, "the hook must have fired")
    assert(TableRepo.claimExpiredAborts.get() == preAborts + 1,
      "the expired attempt must abort at the bless point, not bless the reclaimed dir")
    assert(sweptVersion >= 0)
    assert(!fs.exists(new Path(s"$root/data-v$sweptVersion")),
      "the reclaimed dir must never be re-blessed or recreated by the retry")
    val versions = repo.snapshotVersions
    assert(versions.nonEmpty && !versions.contains(sweptVersion),
      s"the retry must land on a fresh number: $versions (swept: $sweptVersion)")
    assert(repo.getFullDf.count() == 50, "no rows lost across the expiry abort + retry")
  }

  test("seeded lifecycle with injected crashed-rewrite leftovers: junk never surfaces, every plant is reclaimed") {
    // the RandomizedSpec lifecycle model, adversarially extended: between
    // ordinary mutations, plant the exact on-disk shape a crashed rewrite
    // leaves (stale claim + orphan dir full of junk rows) at numbers the
    // live protocol is about to claim — the bump loop must skip them, no
    // commit may ever surface the junk, and the sweep must retire every
    // plant by the end
    val rng = new scala.util.Random(20260816)
    val root = scratch("claim-rand")
    val repo = new TableRepo(root, spark, keyCols = Seq("k"))
    val model = scala.collection.mutable.Map[Long, Double]()
    val planted = scala.collection.mutable.Set[Int]()
    def rows(n: Int) = (0 until n).map(_ => (rng.nextInt(50).toLong, rng.nextDouble()))
    def check(step: String): Unit = {
      val got = repo.getFullDf.select(col("k"), col("v")).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
      assert(got == model.toSeq.sortBy(_._1), s"diverged after $step " +
        s"(junk keys visible: ${got.map(_._1).filter(_ >= 1000000000L).take(3)})")
    }
    val init = rows(20).distinctBy(_._1)
    repo.extend(init.toDF("k", "v"))
    init.foreach { case (k, v) => model(k) = v }
    for (step <- 1 to 16) {
      rng.nextInt(8) match {
        case 0 | 1 | 2 => // keyed upsert
          val ups = rows(4 + rng.nextInt(6)).distinctBy(_._1)
          ups.foreach { case (k, v) => model(k) = v }
          repo.replaceRecords(ups.toDF("k", "v"))
        case 3 | 4 => // snapshot-versioned full replace (commits + sweeps)
          val all = rows(10 + rng.nextInt(8)).distinctBy(_._1)
          model.clear(); all.foreach { case (k, v) => model(k) = v }
          repo.replaceAll(all.toDF("k", "v"))
        case 5 => // content-preserving compact (guarded commit + sweep)
          repo.compact(500L)
        case 6 => // CRASH INJECTION: a dead rewrite's leftovers at a number
          // the next commit will try first (head+1) or nearly so
          val v = repo.snapshotVersions.lastOption.getOrElse(-1) + 1 + rng.nextInt(2)
          if (!planted.contains(v) && !fs.exists(new Path(s"$root/_graft_claim-v$v"))) {
            assert(Lease.tryCreateExclusive(fs, new Path(s"$root/_graft_claim-v$v"),
              s"dead:${rng.nextLong()}"))
            backdate(new Path(s"$root/_graft_claim-v$v"), TableRepo.ClaimTtlMs + 60000)
            (1000000000L until 1000000040L).map((_, -1.0)).toDF("k", "v")
              .write.mode("overwrite").parquet(s"$root/data-v$v")
            planted += v
          }
        case 7 => repo.vacuum()
      }
      if (step % 4 == 0) check(s"step $step")
    }
    repo.vacuum() // final sweep pass: every stale plant must be reclaimed
    check("final")
    val head = repo.snapshotVersions.lastOption.getOrElse(-1)
    planted.foreach { v =>
      assert(!fs.exists(new Path(s"$root/data-v$v")),
        s"planted orphan data-v$v survived the sweeps")
      // a tombstone below the committed head is legitimately GC'd (spent);
      // above it, it must still guard its number
      assert(fs.exists(new Path(s"$root/_graft_claim-v$v.swept")) || v <= head,
        s"planted claim v$v (head $head) was neither retired nor spent")
      assert(!fs.exists(new Path(s"$root/_graft_claim-v$v")),
        s"planted claim v$v must not survive as a bare claim")
      assert(!repo.snapshotVersions.contains(v), s"planted number $v was re-blessed")
    }
    assert(planted.nonEmpty, "the seed must actually inject crash shapes")
  }

  test("the heartbeat keeps a slow rewrite alive: a concurrent sweep finds nothing stale") {
    val prevTtl = TableRepo.ClaimTtlMs
    TableRepo.ClaimTtlMs = 1000 // beat every 250 ms; the write job below takes ~2.5 s
    try {
      val root = scratch("claim-slow-alive")
      val repo = new TableRepo(root, spark)
      repo.extend((1L to 25L).toDF("id"))
      val pre = TableRepo.claimsExpired.get()
      val slow = (1L to 25L).toDF("id").repartition(1).as[Long]
        .mapPartitions { it => Thread.sleep(2500); it }.toDF("id")
      @volatile var failure: Throwable = null
      val t = new Thread(() => {
        try repo.replaceAll(slow)
        catch { case e: Throwable => failure = e }
      }, "slow-rewrite")
      t.start()
      Thread.sleep(1300) // > ttl since the CLAIM was created — but the beat re-stamped it
      assert(repo.sweepExpiredClaims() == 0,
        "a live slow rewrite must never be expired — its heartbeat keeps the claim fresh")
      t.join(60000)
      assert(!t.isAlive && failure == null, s"slow rewrite must commit cleanly: $failure")
      assert(TableRepo.claimsExpired.get() == pre)
      assert(repo.snapshotVersions == Seq(0) && repo.getFullDf.count() == 25)
    } finally TableRepo.ClaimTtlMs = prevTtl
  }
}
