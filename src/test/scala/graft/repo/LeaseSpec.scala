package graft.repo

import org.apache.hadoop.fs.Path

import graft.SparkSuite

/** Writer-lease semantics in one JVM: loud refusal against a live
  * holder, TTL takeover of a dead one, reentrancy, cleanup on both exit
  * paths. The REAL cross-process shape (a second JVM's upsert failing
  * against a held lease, succeeding after TTL expiry) is
  * MultiProcessSpec territory.
  */
/** Counting wrapper filesystems for the heartbeat's portability seams.
  * [[NoOpSetTimesFs]] is the object-store shape (Hadoop's base
  * `FileSystem.setTimes` silently does nothing; blob stores inherit it);
  * [[SkewedSetTimesFs]] is a working `setTimes` against a server clock
  * `skewMs` behind the local one.
  */
private class CountingFs(under: org.apache.hadoop.fs.FileSystem)
    extends org.apache.hadoop.fs.FilterFileSystem(under) {
  @volatile var setTimesCalls = 0
  @volatile var creates = 0
  override def create(f: Path,
      permission: org.apache.hadoop.fs.permission.FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    creates += 1
    super.create(f, permission, overwrite, bufferSize, replication, blockSize, progress)
  }
}

private class NoOpSetTimesFs(under: org.apache.hadoop.fs.FileSystem) extends CountingFs(under) {
  override def setTimes(p: Path, mtime: Long, atime: Long): Unit =
    setTimesCalls += 1 // and do nothing — the object-store default
}

private class SkewedSetTimesFs(under: org.apache.hadoop.fs.FileSystem, skewMs: Long)
    extends CountingFs(under) {
  override def setTimes(p: Path, mtime: Long, atime: Long): Unit = {
    setTimesCalls += 1
    super.setTimes(p, mtime - skewMs, atime)
  }
}

class LeaseSpec extends SparkSuite {
  import spark.implicits._

  private def fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def plantLease(root: String, content: String, ageMs: Long = 0): Path = {
    val p = Lease.pathIn(root)
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8"))
    finally out.close()
    if (ageMs > 0) {
      val local = java.nio.file.Paths.get(fs.makeQualified(p).toUri.getPath)
      java.nio.file.Files.setLastModifiedTime(local,
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - ageMs))
    }
    p
  }

  test("an upsert against a live foreign lease fails loudly; release unblocks it") {
    val root = scratch("lease-live")
    val repo = new TableRepo(root, spark, keyCols = Seq("id"))
    repo.extend(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val p = plantLease(root, "foreign-process:some-op")
    val e = intercept[java.util.ConcurrentModificationException] {
      repo.replaceRecords(Seq((1L, "A")).toDF("id", "v"))
    }
    assert(e.getMessage.contains("lease"))
    assert(repo.getFullDf.filter($"id" === 1L).select($"v").head().getString(0) == "a",
      "the refused upsert must not have touched the table")
    fs.delete(p, false)
    repo.replaceRecords(Seq((1L, "A")).toDF("id", "v"))
    assert(repo.getFullDf.filter($"id" === 1L).select($"v").head().getString(0) == "A")
    assert(!fs.exists(p), "lease released after the op")
  }

  test("a stale lease (killed holder: no heartbeat past the ttl) is taken over") {
    val root = scratch("lease-stale")
    val repo = new TableRepo(root, spark, keyCols = Seq("id"))
    repo.extend(Seq((1L, "a")).toDF("id", "v"))
    val p = plantLease(root, "dead-process:crashed-op", ageMs = Lease.DefaultTtlMs + 30000)
    repo.replaceRecords(Seq((1L, "A")).toDF("id", "v")) // takeover, no throw
    assert(repo.getFullDf.filter($"id" === 1L).select($"v").head().getString(0) == "A")
    assert(!fs.exists(p), "the taken-over lease is released like any other")
  }

  test("the pruned upsert holds the same lease and its fallback re-enters it") {
    // nested Lease.withLease on one root must reuse the outer acquisition
    // (the pruned upsert's fallback into the partition merge), never
    // deadlock on its own file or release the outer hold early
    val root = scratch("lease-reenter")
    var innerRan = false
    Lease.withLease(fs, root, "outer") {
      Lease.withLease(fs, root, "inner") { innerRan = true }
      assert(fs.exists(Lease.pathIn(root)), "inner exit must not release the outer hold")
    }
    assert(innerRan)
    assert(!fs.exists(Lease.pathIn(root)), "outermost exit releases")
  }

  test("the lease is released when the body throws, and the body's failure surfaces") {
    val root = scratch("lease-throw")
    val e = intercept[RuntimeException] {
      Lease.withLease(fs, root, "failing-op") { throw new RuntimeException("body boom") }
    }
    assert(e.getMessage == "body boom")
    assert(!fs.exists(Lease.pathIn(root)))
  }

  test("the heartbeat keeps a long-held lease fresh (mtime advances at ttl/4)") {
    val root = scratch("lease-beat")
    val p = Lease.pathIn(root)
    Lease.withLease(fs, root, "long-op", ttlMs = 400) {
      val t0 = fs.getFileStatus(p).getModificationTime
      // > several heartbeat periods (100 ms each at ttl 400)
      Thread.sleep(700)
      val t1 = fs.getFileStatus(p).getModificationTime
      // (no upper-bound assert on the stamp's age: a loaded box can delay
      // the beat thread arbitrarily — advancing mtime IS the property)
      assert(t1 > t0, s"heartbeat must re-stamp the lease ($t0 -> $t1)")
    }
    assert(!fs.exists(p))
  }

  test("a takeover during a stalled heartbeat surfaces as a LOUD lease-lost failure at release") {
    // simulate the one dangerous interleaving: the holder's heartbeat
    // stalls past the ttl (GC/VM suspend), a foreign writer takes over,
    // the original wakes and finishes its body — the release must throw,
    // never silently delete the taker's lease or report success
    val root = scratch("lease-lost")
    val p = Lease.pathIn(root)
    val e = intercept[java.util.ConcurrentModificationException] {
      Lease.withLease(fs, root, "stalled-op", ttlMs = 60000) {
        // ttl 60s means no heartbeat fires during this body; the foreign
        // takeover is simulated by replacing the lease file content
        val out = fs.create(p, true)
        out.write("taker-process:takeover-op".getBytes("UTF-8")); out.close()
      }
    }
    assert(e.getMessage.contains("LOST"))
    assert(fs.exists(p), "the taker's lease must not be deleted by the loser's release")
    val in = fs.open(p)
    val content = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    assert(content == "taker-process:takeover-op")
    fs.delete(p, false)
  }

  test("no-op setTimes (object-store shape): the heartbeat flips to content-rewrite stamps; a live holder never goes falsely stale") {
    // Hadoop's base FileSystem.setTimes is a silent no-op and blob stores
    // inherit it; the heartbeat must DETECT that (mtime did not change)
    // and permanently fall back to content rewrites, or a live holder's
    // lease would age out under it. The takeover protocol is documented
    // as outside its envelope on such stores — liveness is the priority.
    val noop = new NoOpSetTimesFs(fs)
    val root = scratch("lease-noop")
    val p = Lease.pathIn(root)
    Lease.withLease(noop, root, "long-op", ttlMs = 400) {
      val t0 = noop.getFileStatus(p).getModificationTime
      Thread.sleep(900) // many 100 ms beats
      assert(noop.setTimesCalls >= 1, "the beat must have tried setTimes first")
      assert(noop.creates >= 1, "the fallback must have content-rewritten the lease")
      assert(noop.getFileStatus(p).getModificationTime > t0,
        "content-rewrite stamps must advance the mtime even though setTimes is a no-op")
    } // returning without a LOST failure proves the holder never went stale to itself
    assert(!fs.exists(p), "released cleanly after the fallback")
  }

  test("a skewed-but-working setTimes stays in mtime mode: landed-ness is judged by the mtime changing, not local-clock distance") {
    // a server clock 250 ms behind (> ttl/2 of 400) used to permanently
    // flip the beat into content-rewrite mode on exactly the filesystems
    // whose atomic rename makes the takeover protocol sound — reinstating
    // the takeover-clobber race the setTimes design closes. The fix
    // judges "stamp landed" by the observed mtime CHANGING vs the
    // pre-stamp read, which skew cannot fake.
    val skewed = new SkewedSetTimesFs(fs, skewMs = 250)
    val root = scratch("lease-skew")
    val p = Lease.pathIn(root)
    Lease.withLease(skewed, root, "long-op", ttlMs = 400) {
      val t0 = skewed.getFileStatus(p).getModificationTime
      Thread.sleep(900)
      assert(skewed.setTimesCalls >= 1, "beats must have fired")
      assert(skewed.creates == 0,
        "no content rewrite may happen while setTimes provably lands (mtime advances)")
      assert(skewed.getFileStatus(p).getModificationTime > t0, "skewed stamps still advance")
    }
    assert(!fs.exists(p))
  }

  test("crash-stranded grave files are reclaimed once stale; fresh ones survive") {
    // a crash between the takeover/release rename and its follow-up
    // delete strands `.expired-*`/`.released-*` copies; they must not
    // accumulate forever on long-lived tables with crashy writers
    val root = scratch("lease-graves")
    fs.mkdirs(new Path(root))
    def plant(name: String, ageMs: Long): Path = {
      val p = new Path(root, name)
      val out = fs.create(p, true); out.write("x".getBytes("UTF-8")); out.close()
      java.nio.file.Files.setLastModifiedTime(
        java.nio.file.Paths.get(fs.makeQualified(p).toUri.getPath),
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - ageMs))
      p
    }
    val staleExp = plant(s"${Lease.LeaseName}.expired-dead1", Lease.GraveSweepMs + 60000)
    val staleRel = plant(s"${Lease.LeaseName}.released-dead2", Lease.GraveSweepMs + 60000)
    val freshExp = plant(s"${Lease.LeaseName}.expired-live", 0)
    val live = plant(Lease.LeaseName, 0) // a live lease itself is never a grave
    Lease.sweepGraves(fs, root)
    assert(!fs.exists(staleExp) && !fs.exists(staleRel), "stale graves reclaimed")
    assert(fs.exists(freshExp), "a fresh grave (possibly a takeover in flight) survives")
    assert(fs.exists(live), "the lease file itself is untouched")
  }

  test("a custom-ttl takeover copy is judged against ITS ttl, not the default sweep floor") {
    // acquire's freshAfterAll window is `<= ttlMs` of the CALLER's ttl: a
    // copy made under ttl=10*DefaultTtl can be restorable while already
    // older than the default GraveSweepMs — a sweep using the default
    // floor would delete it mid-takeover, silently un-leasing a live
    // holder. The `.expired-t<ttl>-` name widens the floor per file.
    val root = scratch("lease-graves-ttl")
    fs.mkdirs(new Path(root))
    val bigTtl = 10 * Lease.DefaultTtlMs
    def plant(name: String, ageMs: Long): Path = {
      val p = new Path(root, name)
      val out = fs.create(p, true); out.write("x".getBytes("UTF-8")); out.close()
      java.nio.file.Files.setLastModifiedTime(
        java.nio.file.Paths.get(fs.makeQualified(p).toUri.getPath),
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - ageMs))
      p
    }
    // restorable window for bigTtl: fresh-enough at GraveSweepMs + 1 min
    val restorable = plant(s"${Lease.LeaseName}.expired-t$bigTtl-a", Lease.GraveSweepMs + 60000)
    val longDead = plant(s"${Lease.LeaseName}.expired-t$bigTtl-b", 10 * bigTtl + 60000)
    assert(Lease.graveSweepThresholdMs(restorable.getName) == 10 * bigTtl)
    assert(Lease.graveSweepThresholdMs(s"${Lease.LeaseName}.released-x") == Lease.GraveSweepMs,
      "release graves and legacy names keep the default floor")
    Lease.sweepGraves(fs, root)
    assert(fs.exists(restorable),
      "a copy younger than 10x its own ttl survives (may be a takeover in flight)")
    assert(!fs.exists(longDead), "past 10x its own ttl it is a crash leftover")
  }

  test("a table root's grave files are reclaimed by the claim sweep (vacuum)") {
    val root = scratch("lease-graves-repo")
    val repo = new TableRepo(root, spark, keyCols = Seq("id"))
    repo.extend(Seq((1L, "a")).toDF("id", "v"))
    val p = new Path(root, s"${Lease.LeaseName}.expired-crashed")
    val out = fs.create(p, true); out.write("x".getBytes("UTF-8")); out.close()
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(fs.makeQualified(p).toUri.getPath),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - Lease.GraveSweepMs - 60000))
    repo.vacuum()
    assert(!fs.exists(p), "vacuum's claim sweep reclaims stale lease graves too")
  }

  test("two threads in one JVM serialize at the lease instead of failing") {
    val root = scratch("lease-threads")
    val repo = new TableRepo(root, spark, keyCols = Seq("id"))
    repo.extend((1L to 10L).map(i => (i, "seed")).toDF("id", "v"))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 4).map { t =>
      new Thread(() => {
        try repo.replaceRecords(Seq((t.toLong, s"t$t")).toDF("id", "v"))
        catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(errs.isEmpty, s"in-JVM writers queue, never fail: ${errs.peek()}")
    val got = repo.getFullDf.filter($"id" <= 4L).select($"v").collect().map(_.getString(0)).toSet
    assert(got == Set("t1", "t2", "t3", "t4"))
    assert(!fs.exists(Lease.pathIn(root)))
  }
}
