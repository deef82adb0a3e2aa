package graft.repo

import org.apache.hadoop.fs.Path

import graft.SparkSuite

/** Writer-lease semantics in one JVM: loud refusal against a live
  * holder, TTL takeover of a dead one, reentrancy, cleanup on both exit
  * paths. The REAL cross-process shape (a second JVM's upsert failing
  * against a held lease, succeeding after TTL expiry) is
  * MultiProcessSpec territory.
  */
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
