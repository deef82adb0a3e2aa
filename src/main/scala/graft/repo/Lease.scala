package graft.repo

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.locks.ReentrantLock

import org.apache.hadoop.fs.{FileSystem, Path}

/** Cross-process writer lease — turns the "single writer per table"
  * PROSE contract into an enforced one for the operations where two
  * uncoordinated writers can silently lose an update: keyed upserts
  * (`TableRepo.replaceRecords*`, an in-place read-modify-write) and IVF
  * index maintenance (`IvfIndex.build/rebuild/compact`, a multi-table
  * swap). Appends and guarded full rewrites stay lease-free — they are
  * already safe under the claim/guard protocols.
  *
  * Mechanism (the same primitives as the version-claim protocol, with
  * liveness added):
  *   - ACQUIRE: exclusive create (`CREATE_NEW`, true O_EXCL on the file
  *     scheme) of `_graft_lease` under the resource root, holding a
  *     per-acquisition id. A concurrent holder makes the create fail.
  *   - LIVENESS: a daemon heartbeat re-stamps the file every `ttl/4`
  *     while held, so a LIVE holder's lease never goes stale. The
  *     reference's analog was process-pool named locks
  *     (/root/reference/parquetranger/core.py:18) — process-local;
  *     this enforces the same exclusion across machines sharing a
  *     filesystem.
  *   - TAKEOVER: an acquirer finding an existing lease reads its age —
  *     fresh means a live holder (fail LOUDLY, the caller must not
  *     proceed), stale past `ttl` means the holder died mid-op (crash
  *     leaves the file; the heartbeat died with it) and the lease is
  *     deleted and re-claimed through the same exclusive create, so
  *     racing takeover candidates resolve to exactly one winner.
  *   - LOSS DETECTION: the heartbeat re-reads the file before each
  *     stamp and release re-checks it — a foreign id means a takeover
  *     happened (only possible if OUR heartbeat stalled past the TTL,
  *     e.g. a multi-minute GC/suspend); the op then fails loudly at
  *     release instead of silently racing the taker.
  *
  * In-JVM, a per-path [[ReentrantLock]] serializes and re-enters: one
  * process's threads queue on the JVM lock (they are already serialized
  * by the repo write monitors where it matters) and nested leased ops
  * (a pruned upsert falling back to the partition merge) reuse the
  * outer acquisition instead of deadlocking on their own file.
  */
private[graft] object Lease {

  /** Default holder-death TTL. The heartbeat stamps every ttl/4, so a
    * live holder is never stale; a crashed one blocks other writers for
    * at most this long. Long mid-op stalls (GC, VM suspend) past the
    * TTL surface as a loud lease-lost failure at release.
    */
  val DefaultTtlMs: Long = 60000L

  private[graft] val LeaseName = "_graft_lease"

  /** The lease file a resource root would carry — for purge paths and
    * specs that construct crash shapes.
    */
  private[graft] def pathIn(dir: String): Path = new Path(dir, LeaseName)

  /** Sum of takeover-eligible retries before acquire gives up: each
    * loop means the lease file changed hands mid-acquire — livelock
    * between takeover candidates, which CREATE_NEW bounds to one winner
    * per round.
    */
  private val MaxAcquireRounds = 5

  private val local = new ConcurrentHashMap[String, ReentrantLock]()

  /** Run `body` holding the writer lease for `dir`. Reentrant per
    * thread; one file acquisition per outermost entry. Throws
    * `ConcurrentModificationException` when another process holds a
    * live lease, and at exit when the lease was lost mid-op.
    */
  def withLease[T](fs: FileSystem, dir: String, what: String,
      ttlMs: Long = DefaultTtlMs)(body: => T): T = {
    val p = fs.makeQualified(new Path(dir, LeaseName))
    val lock = local.computeIfAbsent(p.toString, _ => new ReentrantLock())
    lock.lock()
    try {
      if (lock.getHoldCount > 1) body // nested leased op: outer frame owns the file
      else {
        val held = acquire(fs, p, ttlMs, what)
        var failed = true
        try { val r = body; failed = false; r }
        finally held.release(suppressLossFailure = failed)
      }
    } finally lock.unlock()
  }

  private def acquire(fs: FileSystem, p: Path, ttlMs: Long, what: String): Held = {
    fs.mkdirs(p.getParent)
    val id = s"${TableRepo.ProcessToken}:${java.util.UUID.randomUUID()}"
    var rounds = 0
    while (true) {
      if (tryCreateExclusive(fs, p, id)) return new Held(fs, p, id, ttlMs, what)
      val st =
        try Some(fs.getFileStatus(p))
        catch { case _: java.io.FileNotFoundException => None }
      st.foreach { s =>
        val age = System.currentTimeMillis() - s.getModificationTime
        if (age <= ttlMs)
          throw new java.util.ConcurrentModificationException(
            s"$what under ${p.getParent}: the writer lease is held by a live writer " +
              s"(heartbeat ${age} ms old, ttl $ttlMs ms). These operations are " +
              "lost-update-prone under concurrent writers; run them from the single " +
              "writer that owns this resource, or wait for the holder to finish " +
              "(a crashed holder's lease expires after the ttl)")
        // stale: the holder died mid-op. RENAME the stale file away
        // (atomic — one winner among takeover racers) instead of a blind
        // delete: a delete could destroy a FRESH lease another taker
        // created between our staleness read and the delete. The rename
        // itself has the same window, so VERIFY what was renamed: a fresh
        // file is another taker's live lease that slipped in — restore it
        // and treat this round as a collision. Whoever wins (or finds the
        // file already gone) contends on the exclusive create below,
        // which picks exactly one new holder.
        // the name encodes THIS acquisition's ttl: the restorable-fresh
        // window below is `<= ttlMs`, so a sweep must judge staleness
        // against the ttl the copy was made under, not the default
        // (graveSweepThresholdMs — a custom ttl > ~10x the default would
        // otherwise let a concurrent vacuum eat a fresh copy mid-takeover)
        val expired = new Path(p.getParent,
          s"${p.getName}.expired-t$ttlMs-${java.util.UUID.randomUUID()}")
        if (fs.rename(p, expired)) {
          val freshAfterAll =
            try System.currentTimeMillis() -
              fs.getFileStatus(expired).getModificationTime <= ttlMs
            catch { case _: java.io.FileNotFoundException => false }
          if (freshAfterAll && restoreNoReplace(fs, expired, p)) ()
          else fs.delete(expired, false): Unit
        }
      }
      rounds += 1
      if (rounds >= MaxAcquireRounds)
        throw new java.io.IOException(
          s"$what: writer lease at $p keeps changing hands mid-acquire ($rounds rounds)")
    }
    throw new IllegalStateException("unreachable")
  }

  /** Atomic exclusive create with content. On the file scheme Hadoop's
    * `create(overwrite = false)` is a non-atomic exists-then-create, so
    * NIO `CREATE_NEW` (true O_EXCL) does the claim; HDFS-like schemes
    * make the plain call atomic server-side. Shared with the version-claim
    * protocol, whose claims carry a holder id for the same liveness trick.
    */
  private[repo] def tryCreateExclusive(fs: FileSystem, p: Path, content: String): Boolean = {
    val q = fs.makeQualified(p)
    try {
      if (q.toUri.getScheme == "file") {
        val out = java.nio.file.Files.newOutputStream(
          java.nio.file.Paths.get(q.toUri.getPath),
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        try out.write(content.getBytes("UTF-8"))
        finally out.close()
      } else {
        val out = fs.create(p, false)
        try out.write(content.getBytes("UTF-8"))
        finally out.close()
      }
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.io.IOException if fs.exists(p) => false // HDFS-style wrapped collision
    }
  }

  /** Restore a renamed-away lease copy to `dst` WITHOUT replacing a file
    * that reappeared there meanwhile. On the file scheme Hadoop's rename
    * is `File.renameTo`, which silently OVERWRITES an existing
    * destination — restoring a fresh taker's lease could then clobber a
    * third taker's just-created lease at `dst` (a dual-holder window) —
    * and NIO `Files.move` without `REPLACE_EXISTING` is itself an
    * exists-check-then-rename(2) (rename(2) overwrites), so it only
    * narrows that window. The truly atomic fail-if-exists primitive is
    * a HARD LINK (`Files.createLink` = link(2), EEXIST on a present
    * destination; src and dst share the lease's parent dir, so same
    * filesystem), mirroring [[tryCreateExclusive]]'s O_EXCL. Move is
    * the fallback only where links are unsupported. HDFS-style schemes'
    * own rename refuses an existing destination. False = `dst`
    * reappeared (the caller drops the copy; whoever owns `dst`
    * proceeds undisturbed).
    */
  private def restoreNoReplace(fs: FileSystem, src: Path, dst: Path): Boolean = {
    val q = fs.makeQualified(dst)
    if (q.toUri.getScheme == "file") {
      val srcNio = java.nio.file.Paths.get(fs.makeQualified(src).toUri.getPath)
      val dstNio = java.nio.file.Paths.get(q.toUri.getPath)
      try {
        java.nio.file.Files.createLink(dstNio, srcNio) // atomic: EEXIST if dst exists
        java.nio.file.Files.deleteIfExists(srcNio)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false // dst reappeared: yield
        case _: UnsupportedOperationException | _: java.io.IOException =>
          // a linkless mount surfaces as FileSystemException/EPERM (an
          // IOException), NOT UnsupportedOperationException — treating it
          // as failure would deterministically destroy a restorable fresh
          // lease. Fall back to the NIO move: its no-replace check is an
          // exists-then-rename (a µs window, documented), still strictly
          // narrower than the plain overwrite rename it replaced, and it
          // too yields (false) when dst provably exists.
          try { java.nio.file.Files.move(srcNio, dstNio); true }
          catch { case _: java.io.IOException => false }
      }
    } else
      try fs.rename(src, dst)
      catch { case scala.util.control.NonFatal(_) => false }
  }

  /** Grave files (`.expired-*` takeover copies, `.released-*` release
    * copies) older than this are crash leftovers — the healthy paths
    * delete them within ms — and are reclaimable by any later sweep. Far
    * above any heartbeat cadence (a live holder's file is never older
    * than its ttl/4), so a sweep can never eat a restorable fresh copy.
    * A copy made under a CUSTOM ttl is restorable for up to that ttl
    * (acquire's freshAfterAll check), so `.expired-t<ttl>-*` names carry
    * it and [[graveSweepThresholdMs]] widens the floor per file.
    */
  private[graft] val GraveSweepMs: Long = 10 * DefaultTtlMs

  private val GraveTtlRe = raw"\.expired-t(\d+)-".r

  /** Per-file sweep staleness floor: 10x the ttl encoded in the grave's
    * name (never below [[GraveSweepMs]]); nameless legacy/release graves
    * use the default.
    */
  private[graft] def graveSweepThresholdMs(name: String): Long =
    GraveTtlRe.findFirstMatchIn(name)
      .flatMap(m => m.group(1).toLongOption)
      .fold(GraveSweepMs)(ttl => math.max(GraveSweepMs, 10L * ttl))

  /** Is `name` a lease grave file ([[GraveSweepMs]])? */
  private[graft] def isGraveName(name: String): Boolean =
    name.startsWith(LeaseName + ".expired-") || name.startsWith(LeaseName + ".released-")

  /** Delete stale grave files under `dir` (one listing). [[TableRepo]]'s
    * claim sweep covers table roots inline; lease roots that are not
    * table roots (the IVF index dir) call this from their own
    * maintenance ops.
    */
  private[graft] def sweepGraves(fs: FileSystem, dir: String): Unit = {
    val d = new Path(dir)
    if (!fs.exists(d)) return
    val now = System.currentTimeMillis()
    fs.listStatus(d).foreach { st =>
      if (!st.isDirectory && isGraveName(st.getPath.getName) &&
          now - st.getModificationTime > graveSweepThresholdMs(st.getPath.getName))
        fs.delete(st.getPath, false): Unit
    }
  }

  private[repo] def readContent(fs: FileSystem, p: Path): Option[String] =
    try {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8"))
      finally in.close()
    } catch { case _: java.io.FileNotFoundException => None }

  /** A held lease: heartbeat thread + release-with-loss-check. */
  private final class Held(fs: FileSystem, p: Path, id: String, ttlMs: Long, what: String) {
    private val beat = new FileHeartbeat(fs, p, id, ttlMs, s"graft-lease-heartbeat-${p.getName}")

    /** Stop the heartbeat, delete the lease if still ours, and fail
      * loudly on a detected takeover — unless the op already failed
      * (`suppressLossFailure`), where the body's own exception must
      * surface instead of being masked.
      *
      * The delete is CONDITIONAL via an atomic rename: a plain
      * read-check-then-delete could destroy a taker's fresh lease
      * written in the check→delete window (we'd have had to stall past
      * the ttl for a taker to exist, but a breached exclusion must
      * still never be compounded by silently unlocking the taker).
      */
    def release(suppressLossFailure: Boolean): Unit = {
      beat.stop()
      val grave = new Path(p.getParent,
        s"${p.getName}.released-${java.util.UUID.randomUUID()}")
      // pre-check before touching the file at all: after a takeover the
      // common state is a FOREIGN lease, and even a transient rename-away
      // of it would let a third acquirer slip in while it is absent (and
      // make the taker's own heartbeat read missing-as-lost)
      val mine = readContent(fs, p).contains(id) &&
        (try fs.rename(p, grave)
        catch { case scala.util.control.NonFatal(_) => false }) && {
          readContent(fs, grave) match {
            case Some(c) if c == id => fs.delete(grave, false); true
            case _ =>
              // the µs double-race: a taker replaced the lease between our
              // pre-check and the rename — put it back; if a newer lease
              // appeared meanwhile, drop the stolen copy (its holder fails
              // loudly at ITS release — loud, never silent). No-replace
              // restore: a plain local rename would clobber that newer
              // lease instead of yielding to it.
              if (!restoreNoReplace(fs, grave, p)) fs.delete(grave, false): Unit
              false
          }
        }
      if ((beat.lost || !mine) && !suppressLossFailure)
        throw new java.util.ConcurrentModificationException(
          s"$what under ${p.getParent}: the writer lease was LOST mid-operation " +
            "(this process stalled past the ttl and another writer took over) — " +
            "the operation's writes may have raced the taker's; inspect and retry")
    }
  }
}

/** Daemon heartbeat on a claim-style file: freshens the file's mtime
  * (`setTimes`, never a content write) every `ttlMs/4` while running, so
  * a LIVE holder's file never goes stale past the ttl. Shared by the
  * writer lease ([[Lease]]) and the version-claim protocol
  * (`TableRepo.commitNewVersionOnce`).
  *
  * Each stamp re-reads the id first: a mismatch (or a missing file) means
  * this holder stalled past the ttl and the file was legitimately taken
  * over / expired — the beat stops and [[lost]] reports it. Because a
  * stamp never writes content, it can never resurrect a renamed-away
  * claim or clobber a taker's ownership — at worst it touches the
  * successor file's mtime by one beat. [[stop]] shares the stamp monitor:
  * once it returns, no further stamp can land — callers sequence their
  * own commit-or-release rename strictly after the last possible stamp.
  */
private[repo] final class FileHeartbeat(
    fs: FileSystem, p: Path, id: String, ttlMs: Long, name: String) {
  @volatile private var lostFlag = false
  @volatile private var done = false
  @volatile private var contentRewriteStamp = false
  // no-op-setTimes detection state (fields declared BEFORE the beat
  // thread starts, so its first stamp never reads them uninitialized):
  // the mtime value that has not moved (-1 = none observed yet), and
  // the LOCAL nanoTime the evidence window opened — initialized at HOLD
  // time so a skipped first beat cannot defer the flip past the
  // staleness threshold
  private var unchangedMtime = -1L
  private var unchangedSince = System.nanoTime()

  private val t = new Thread(() => {
    while (!done && !lostFlag) {
      try Thread.sleep(math.max(1L, ttlMs / 4))
      catch { case _: InterruptedException => () }
      if (!done) stamp()
    }
  }, name)
  t.setDaemon(true)
  t.start()

  /** True once a stamp found foreign/missing content: the holder stalled
    * past the ttl and lost the file.
    */
  def lost: Boolean = lostFlag

  def stop(): Unit = synchronized {
    done = true
    t.interrupt()
  }

  private def stamp(): Unit = synchronized {
    if (done || lostFlag) return
    // a TRANSIENT read fault (FS hiccup, NameNode failover) must not kill
    // the beat or count as a takeover — only a readable file with foreign
    // content, or a provably MISSING file, means the holder lost it; any
    // other failure just skips this beat and retries at the next one
    val content =
      try Lease.readContent(fs, p)
      catch { case scala.util.control.NonFatal(_) => return }
    content match {
      case Some(c) if c == id =>
        // freshen via setTimes, NEVER a content rewrite: a rewrite racing
        // a takeover's replace (read-mine → taker swaps → write) would
        // clobber the taker's ownership and let both bodies run; touching
        // mtime at worst freshens the taker's own live file by one beat,
        // and the next read sees the foreign id and reports the loss.
        // VERIFIED, because Hadoop's base FileSystem.setTimes is a silent
        // no-op (object stores inherit it): if the mtime provably did not
        // advance, fall back to the content rewrite permanently for this
        // file — on such filesystems rename is not atomic either, so the
        // takeover protocol is already out of its portability envelope
        // and liveness (never going falsely stale) is the priority.
        try {
          if (contentRewriteStamp) rewrite()
          else {
            // "stamp landed" is judged by the observed mtime CHANGING —
            // never by comparing a server-side mtime against the local
            // clock, which clock skew would permanently misjudge (flipping
            // a working setTimes filesystem into content-rewrite mode and
            // reinstating the takeover-clobber race the setTimes design
            // closes). And never on a SINGLE beat: an mtime granularity
            // coarser than the beat interval (1-2 s FAT/NFS mounts) makes
            // consecutive stamps land on the same truncated value, so the
            // flip requires the mtime to sit UNCHANGED for one full beat
            // interval (ttl/4) of LOCAL elapsed time — skew-free by
            // construction, and immune to any granularity below ttl/4
            // (15 s at the default ttl; a filesystem coarser than that is
            // outside the mtime-mode envelope and flips harmlessly). The
            // clock starts at HOLD time, so the flip lands by age ~ttl/2
            // on a genuine no-op filesystem even with one whole beat
            // skipped (a transient stat fault, a GC pause) — a live
            // holder keeps a ≥ ttl/2 margin against ever looking stale.
            val before = fs.getFileStatus(p).getModificationTime
            val now = System.currentTimeMillis()
            fs.setTimes(p, now, -1)
            val after = fs.getFileStatus(p).getModificationTime
            if (after != before || before == now) {
              // stamp provably landed (or indistinguishable): restart the
              // evidence window at this observation
              unchangedMtime = after
              unchangedSince = System.nanoTime()
            } else if (unchangedMtime != -1L && unchangedMtime != after) {
              unchangedMtime = after
              unchangedSince = System.nanoTime()
            } else {
              unchangedMtime = after
              if (System.nanoTime() - unchangedSince > ttlMs * 250000L) { // ttl/4 in ns
                contentRewriteStamp = true
                rewrite()
              }
            }
          }
        } catch { case scala.util.control.NonFatal(_) => () } // next beat retries
      case _ => lostFlag = true
    }
  }

  /** Content-rewrite stamp for filesystems whose `setTimes` is a no-op. */
  private def rewrite(): Unit = {
    val out = fs.create(p, true)
    try out.write(id.getBytes("UTF-8"))
    finally out.close()
  }
}
