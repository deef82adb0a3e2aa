package graft.repo

import java.net.URI

import org.apache.hadoop.fs.{FileSystem, FileUtil, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

import graft.SparkSuite

/** Object-store-shaped filesystem for envelope tests: local storage with
  * the two WEAK primitives blob stores actually provide —
  *
  *  - `create(overwrite = false)` is a blob PUT: it silently OVERWRITES
  *    an existing object instead of failing (no O_EXCL anywhere), so
  *    every exclusive-create claim in the codebase stops excluding;
  *  - `rename` is an emulated COPY + DELETE: non-atomic (a reader can
  *    observe both paths mid-move), and a file destination is silently
  *    replaced rather than refused.
  *
  * Registered under the `weakfs:` scheme so a TableRepo rooted there
  * drives the REAL read/write/claim/lease paths through these semantics
  * — the SCALE.md portability envelope's "outside" case, now exercised
  * instead of assumed.
  */
class WeakStoreFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("weakfs:///")

  // BOTH create funnels: RawLocalFileSystem routes FileSystem.create(f,
  // overwrite) through the non-permissioned overload directly (its
  // permissioned one delegates the other way), so overriding just one
  // would leave an exclusive-create path with real O_EXCL semantics
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    if (!overwrite && exists(f)) WeakStoreFs.exclusiveCreateBreaches.incrementAndGet()
    // a blob PUT never fails on an existing key
    super.create(f, true, bufferSize, replication, blockSize, progress)
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    if (!overwrite && exists(f)) WeakStoreFs.exclusiveCreateBreaches.incrementAndGet()
    super.create(f, permission, true, bufferSize, replication, blockSize, progress)
  }

  override def rename(src: Path, dst: Path): Boolean = {
    if (!exists(src)) return false
    val dstExists = exists(dst)
    // dir destinations keep the HDFS refusal (Spark's committer never
    // renames onto an existing dir; emulating "move into" would only
    // mask bugs) — the envelope-relevant weakness is the FILE case
    if (dstExists && getFileStatus(dst).isDirectory) return false
    if (dstExists) delete(dst, false) // overwrite-on-rename: no refusal
    WeakStoreFs.copyRenames.incrementAndGet()
    FileUtil.copy(this, src, this, dst, true /* deleteSource */, true, getConf)
  }
}

object WeakStoreFs {
  val exclusiveCreateBreaches = new java.util.concurrent.atomic.AtomicInteger()
  val copyRenames = new java.util.concurrent.atomic.AtomicInteger()
}

/** The rename-atomicity / overwrite-on-create envelope, exercised. The
  * heartbeat's `setTimes` seam was pinned in round 18 (LeaseSpec wrapper
  * FSs); this closes the remaining assumption: what the lease takeover /
  * release and the version-claim protocol actually do when exclusive
  * create does not exclude and rename is an emulated copy.
  *
  * Proven shape: NO SILENT dual-holder. The exclusion primitive breaches
  * (pinned below — that is what "outside the envelope" means), but every
  * breach either surfaces as a LOUD failure within one heartbeat (lease)
  * or resolves to exactly one winner at the bless rename, whose source
  * consumption is atomic-enough even as copy+delete: the loser's bless
  * has no source file left and aborts loudly.
  */
class WeakStoreSpec extends SparkSuite {
  import spark.implicits._

  private lazy val weak: FileSystem = {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.weakfs.impl", classOf[WeakStoreFs].getName)
    FileSystem.get(URI.create("weakfs:///"), conf)
  }

  private def wroot(name: String): String = "weakfs:" + scratch(name)

  test("overwrite-on-create cannot exclude: the envelope breach premise, pinned") {
    val root = wroot("weak-excl")
    weak.mkdirs(new Path(root))
    val p = new Path(root, "claimfile")
    assert(Lease.tryCreateExclusive(weak, p, "first"))
    assert(Lease.tryCreateExclusive(weak, p, "second"),
      "a blob PUT silently replaces: the exclusive create MUST breach here")
    assert(Lease.readContent(weak, p).contains("second"), "the second writer stole the file")
    // contrast: the file scheme's O_EXCL create refuses, which is the
    // inside-the-envelope behavior every claim protocol builds on
    val localFs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val lp = new Path(scratch("weak-excl-local"), "claimfile")
    localFs.mkdirs(lp.getParent)
    assert(Lease.tryCreateExclusive(localFs, lp, "first"))
    assert(!Lease.tryCreateExclusive(localFs, lp, "second"))
  }

  test("a lease stolen by an intruder PUT surfaces LOUDLY within one heartbeat; the intruder keeps the file") {
    // the dual-holder window on an overwrite-on-create store is bounded
    // by the heartbeat cadence (ttl/4): the next stamp re-reads the id,
    // sees the thief's, flags the loss, and release throws instead of
    // reporting success or deleting the thief's lease
    val root = wroot("weak-lease")
    weak.mkdirs(new Path(root))
    val p = weak.makeQualified(Lease.pathIn(root))
    val e = intercept[java.util.ConcurrentModificationException] {
      Lease.withLease(weak, root, "weak-op", ttlMs = 400) {
        assert(Lease.tryCreateExclusive(weak, p, "intruder:steal"),
          "breach premise: the intruder's exclusive create wins on weakfs")
        Thread.sleep(500) // several 100 ms beats: the loss is detected mid-body
      }
    }
    assert(e.getMessage.contains("LOST"))
    assert(Lease.readContent(weak, p).contains("intruder:steal"),
      "the loser's release must not delete the thief's lease")
    weak.delete(p, false)
  }

  test("a crashed holder's stale lease never blocks a weakfs acquirer (the PUT wins directly)") {
    // on an overwrite-on-create store the acquire's FIRST create already
    // replaces whatever lease file exists — the stale-age takeover dance
    // (rename-away, freshness re-check, restore) is unreachable dead
    // code there, because it only runs after a FAILED exclusive create.
    // Liveness is trivially preserved; what is lost is exclusion against
    // a LIVE holder, pinned loudly by the intruder test above.
    val root = wroot("weak-takeover")
    weak.mkdirs(new Path(root))
    val p = Lease.pathIn(root)
    val out = weak.create(p, true)
    out.write("dead-process:crashed".getBytes("UTF-8")); out.close()
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(weak.makeQualified(p).toUri.getPath),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - Lease.DefaultTtlMs - 30000))
    var ran = false
    Lease.withLease(weak, root, "taker") { ran = true } // PUT replaces the corpse, no throw
    assert(ran)
    assert(!weak.exists(p), "released cleanly after the acquisition")
  }

  test("full repo lifecycle on weakfs: append, upsert, guarded compact — correct content, no leftovers") {
    // the protocol's FUNCTIONAL correctness does not depend on rename
    // atomicity under a single writer: staging + per-file copy-renames,
    // the claim/bless cycle, and the lease all complete; what the store
    // weakens is multi-writer EXCLUSION (pinned by the tests around
    // this one), not single-writer integrity
    WeakStoreFs.copyRenames.set(0)
    val root = wroot("weak-repo")
    val repo = new TableRepo(root, spark, keyCols = Seq("id"))
    repo.extend((1L to 50L).map(i => (i, s"v$i")).toDF("id", "v"))
    repo.extend((51L to 80L).map(i => (i, s"v$i")).toDF("id", "v"))
    repo.replaceRecords(Seq((7L, "SEVEN"), (81L, "EIGHTYONE")).toDF("id", "v"))
    repo.compact(100000L)
    assert(WeakStoreFs.copyRenames.get() > 0, "the lifecycle must have exercised emulated renames")
    val got = repo.getFullDf
    assert(got.count() == 81)
    assert(got.filter($"id" === 7L).select($"v").head().getString(0) == "SEVEN")
    val leftovers = weak.listStatus(new Path(root)).map(_.getPath.getName).filter(n =>
      n.startsWith("_graft_claim-v") && !n.endsWith(".swept"))
    assert(leftovers.isEmpty, s"no bare claims may survive a committed rewrite: ${leftovers.toSeq}")
    assert(!weak.exists(Lease.pathIn(root)), "lease released")
  }

  test("IvfIndex manifest swap on weakfs: build -> k-changing rebuild -> probe serves ONE generation") {
    // the OTHER rename-dependent protocol (besides the version claim):
    // the `_ivf_manifest-v<N>.json` commit rename that pins a
    // (centroid-version, assignment-version, k) pair. On weakfs the
    // rename is an emulated copy+delete and create never excludes, so
    // this drives the swap through blob-store semantics and asserts
    // single-generation serving — a mixed-generation read (new centroids
    // with old assignments) would answer the probes below differently
    // from the trained-together twin.
    import org.apache.spark.sql.functions.col
    // 4 direction clusters each split into 2 angular subclusters (the
    // IvfIndexSpec generator): k=4 merges each pair, k=8 separates it,
    // and at n=64 the two generations answer top-10 probes DIFFERENTLY —
    // the observable that makes mixed-generation serving detectable
    val e = (0 until 64).map { i =>
      val c = i % 4
      val s = (i / 4) % 2
      val base = Array.fill(8)(0.0f)
      base(2 * c) = 1.0f
      base(2 * c + 1) = 0.45f * s
      base((2 * c + 2) % 8) = 0.03f * ((i * 5 + 1) % 7)
      (i.toLong, base.toSeq)
    }.toDF("vec_id", "embedding")
    val root = wroot("weak-ivf")
    weak.mkdirs(new Path(root))
    val idx = new graft.ops.IvfIndex(root, spark)
    val m4 = idx.build(e, 4, 2)
    assert(m4.k == 4)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val at4 = idx.probe(q, 1, 10).orderBy("q_id", "n_id")
    assertSameRows(at4, graft.ops.Ivf.probeTopK(e, 4, 2, 1, 5L, 10).orderBy("q_id", "n_id"))
    val rows4 = at4.collect().map(_.toString).sorted.toSeq
    WeakStoreFs.copyRenames.set(0)
    val m8 = idx.rebuild(e, 8, 2)
    assert(WeakStoreFs.copyRenames.get() > 0,
      "the k-changing swap must have exercised emulated copy+delete renames")
    assert(m8.k == 8 && m8.centVersion > m4.centVersion && m8.asgVersion > m4.asgVersion)
    // the manifest pins a trained-together pair: exactly the tables' committed maxima
    assert(m8.centVersion == idx.cent.snapshotVersions.max)
    assert(m8.asgVersion == idx.asg.snapshotVersions.max)
    assert(idx.manifest.contains(m8), "readers resolve the new generation after the flip")
    val at8 = idx.probe(q, 1, 10).orderBy("q_id", "n_id")
    assertSameRows(at8, graft.ops.Ivf.probeTopK(e, 8, 2, 1, 5L, 10).orderBy("q_id", "n_id"))
    assert(at8.collect().map(_.toString).sorted.toSeq != rows4,
      "the two generations must answer differently, else mixed serving would be invisible here")
  }

  test("a claim stolen mid-rewrite by a foreign PUT still blesses EXACTLY once (source consumption decides)") {
    // the breach mode, pinned end-to-end: a foreign claimant's PUT lands
    // on OUR live claim file inside the rewrite (possible only because
    // create does not exclude). The bless rename consumes the one claim
    // file — whoever renames first wins; the other side's bless has no
    // source and aborts loudly (claim-expired contract). No interleaving
    // yields two commit markers for one version number.
    val root = wroot("weak-steal")
    val repo = new TableRepo(root, spark)
    repo.extend((1L to 40L).map(i => (i, i * 2)).toDF("id", "x"))
    var sawClaim = false
    TableRepo.testGapHook = Some(() => {
      val claims = weak.listStatus(new Path(root)).map(_.getPath).filter { p =>
        p.getName.startsWith("_graft_claim-v") && !p.getName.endsWith(".swept")
      }
      sawClaim = claims.nonEmpty
      claims.foreach { c =>
        val out = weak.create(c, true)
        out.write("foreign:thief".getBytes("UTF-8")); out.close()
      }
    })
    repo.compact(100000L) // guarded rewrite: the hook fires inside the marker window
    assert(sawClaim, "the gap hook must have found our live claim to steal")
    val dirs = weak.listStatus(new Path(root)).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("data-v"))
    val committed = dirs.filter(d => weak.exists(new Path(s"$root/$d/_GRAFT_COMMIT")))
    assert(committed.length == 1, s"exactly one blessed version: ${committed.toSeq}")
    val bare = weak.listStatus(new Path(root)).map(_.getPath.getName)
      .filter(n => n.startsWith("_graft_claim-v") && !n.endsWith(".swept"))
    assert(bare.isEmpty, "the stolen claim was consumed by the bless rename — " +
      "the foreign side's own bless has no source left and must abort loudly")
    assert(repo.getFullDf.count() == 40, "content intact through the stolen-claim rewrite")
  }
}
