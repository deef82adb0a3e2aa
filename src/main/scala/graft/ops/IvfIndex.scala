package graft.ops

import java.net.URI

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.repo.TableRepo

object IvfIndex {

  /** The healthy-index reading of both at-rest drift signals, taken right
    * after training — the anchor the rebuild trigger compares against.
    * Thresholds are RATIOS of these, not absolutes: the drift study
    * (SCALE.md, `docs/ivfdrift_r14_*.jsonl`) shows the post-rebuild
    * cosine landing ABOVE the previous build's (retraining on drifted
    * data fits tighter cells), so each generation must re-anchor.
    */
  case class Baseline(maxClusterFrac: Double, meanAssignCos: Double)

  /** One consistent generation of the persisted IVF index: the COMMITTED
    * snapshot version of each half plus the k they were trained with. A
    * probe that plans from one manifest reads a centroid set and an
    * assignment table that were trained TOGETHER — never a mixed pair.
    * `baseline` carries that generation's build-time drift signals (None
    * only for manifests written by pre-baseline builds or by hand).
    */
  case class Manifest(centVersion: Int, asgVersion: Int, k: Int,
      baseline: Option[Baseline] = None)

  // Manifest commits are claim-then-commit (whole file under a dot temp
  // name, then rename), but Hadoop's LOCAL rename is POSIX rename(2) —
  // it OVERWRITES an existing destination and reports success — and the
  // temp name is versioned, so two racers for the same next version
  // could clobber each other's temp AND both "land". The racers that
  // can actually exist share one JVM (a stream's onCompact re-pin on
  // the driver vs a rebuild's flip on another driver thread), so a
  // per-root monitor serializes list -> re-check -> rename where it
  // matters; cross-PROCESS maintainers are excluded by the ENFORCED
  // writer lease on the index root (build/rebuild/compact hold it —
  // graft.repo.Lease; and on HDFS-like filesystems rename genuinely
  // refuses an existing destination).
  private val rootLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  // callers must pass a FILESYSTEM-QUALIFIED root: Path("file:/x") and
  // Path("/x") stringify differently, so keying on the raw spelling would
  // hand two handles to the same directory two different monitors —
  // voiding exactly the serialization the lock exists for (instances see
  // one monitor per physical root via [[IvfIndex.rootLock]])
  private[ops] def lockFor(qualifiedRoot: String): Object =
    rootLocks.computeIfAbsent(qualifiedRoot, _ => new Object)

  // The batch-vs-swap lock (per qualified root, like the manifest
  // monitor): ingestion batches hold the READ side for their whole
  // foreachBatch body — many batches/streams may interleave freely —
  // while a rebuild's table swap and an index-level compact hold the
  // WRITE side, so a swap can never run while a batch is mid-flight
  // (and vice versa). This closes the last serving race the manifest
  // alone could not: a batch that had already read generation G's
  // centroids landing its rows into (or being dropped by) generation
  // G+1's `replaceAll`. Both racers are driver threads in one JVM —
  // cross-process MAINTAINERS are excluded by the enforced writer
  // lease, same scope as the manifest monitor above.
  private val rootSwapLocks =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.locks.ReentrantReadWriteLock]()
  private[ops] def swapLockFor(qualifiedRoot: String): java.util.concurrent.locks.ReentrantReadWriteLock =
    rootSwapLocks.computeIfAbsent(qualifiedRoot,
      _ => new java.util.concurrent.locks.ReentrantReadWriteLock)
}

/** Manifest-pinned lifecycle wrapper over [[IvfRepo]] — closes the one
  * unsafe window the raw two-table layout leaves open: a K-CHANGING
  * rebuild swaps `cent` and `asg` as two independent per-table snapshot
  * commits, so a probe landing between them could see new centroids with
  * old assignments (or vice versa) — candidate sets keyed by the wrong
  * Voronoi generation.
  *
  * The fix is one tiny index-level manifest at the index root, the same
  * claim-then-commit discipline [[TableRepo]] uses for its own version
  * dirs: `_ivf_manifest-v<N>.json` names a consistent
  * (centroid-version, assignment-version, k) triple; readers resolve the
  * highest N; writers land a WHOLE file under an invisible dot-prefixed
  * temp name and atomically rename it into place — a reader sees the old
  * triple or the new one, never a torn or mixed state. [[rebuild]] swaps
  * both tables FIRST — centroids before assignments, an order that IS
  * load-bearing: [[compact]]'s recovery branch reads "assignment table
  * ahead, centroid table current" as a crashed compaction precisely
  * because every rebuild path bumps cent first — and flips the manifest
  * LAST;
  * until that flip every probe keeps planning from the superseded
  * versions, which survive as TableRepo grace snapshots (retention >= 1
  * guarantees exactly the swap window; pass `snapshotRetention` >= 2 to
  * also cover a rebuild that CRASHES after one table committed and is
  * re-run in full before any probe migrates).
  *
  * Probe-plan cost of the pin: one directory listing for the manifest
  * (driver metadata) plus [[TableRepo.getDfAt]] reads instead of
  * current-version reads — the partition-pruned scan, broadcast shapes
  * and top-k windows are byte-identical to [[IvfRepo.probe]]
  * ([[IvfRepo.probeFrames]] is the shared plan).
  *
  * Concurrent ingestion DURING a rebuild is covered by a second, per-root
  * READ-WRITE lock ([[IvfIndex.swapLockFor]]): every batch body —
  * [[append]] and each [[startAppendStream]] micro-batch — holds the
  * shared side for its whole execution, while [[build]]/[[rebuild]]'s
  * table swap and [[compact]] hold the exclusive side. An in-flight
  * batch that already read one generation's centroids therefore drains
  * BEFORE the swap begins (its rows land in the generation it was keyed
  * to, and a k-changing rebuild's input sees them); a batch arriving
  * mid-swap queues until the flip, where the per-batch fence fails a
  * k-change loudly with nothing landed. Both entry points additionally
  * refuse to ingest while the manifest lags the table versions (a
  * CRASHED swap, which no lock can cover). Cross-process MAINTAINERS
  * are excluded by the ENFORCED writer lease on the index root
  * ([[graft.repo.Lease]] — build/rebuild/compact hold it for their
  * whole run, a second process fails loudly, a crashed holder expires
  * after the ttl); the in-JVM locks close the intra-process story.
  */
class IvfIndex(val root: String, val spark: SparkSession,
    val snapshotRetention: Int = 1) {
  import IvfIndex.Manifest

  val cent: TableRepo =
    new TableRepo(s"$root/cent", spark, snapshotRetention = snapshotRetention)
  val asg: TableRepo = new TableRepo(s"$root/asg", spark,
    groupCols = Seq("centroid_id"), snapshotRetention = snapshotRetention)

  private def fs: FileSystem =
    FileSystem.get(URI.create(root), spark.sparkContext.hadoopConfiguration)

  /** The per-root manifest-commit monitor, keyed on the QUALIFIED path so
    * differently-spelled handles to one directory (`file:/x/ivf` vs
    * `/x/ivf`, relative vs absolute) share the monitor — otherwise two
    * in-JVM racers could hold "the" lock concurrently and local rename's
    * overwrite semantics would let both land.
    */
  private[ops] lazy val rootLock: Object =
    IvfIndex.lockFor(fs.makeQualified(new Path(root)).toString)

  /** The per-root batch-vs-swap read-write lock (see the companion's
    * scaladoc). Qualified-path keyed for the same reason as [[rootLock]].
    */
  private[ops] lazy val swapLock: java.util.concurrent.locks.ReentrantReadWriteLock =
    IvfIndex.swapLockFor(fs.makeQualified(new Path(root)).toString)

  /** Run `body` holding the SHARED side of the swap lock — ingestion
    * batches and stats reads, which may interleave with each other but
    * never with an exclusive table swap.
    */
  private def withSharedSwapLock[T](body: => T): T = {
    val l = swapLock.readLock(); l.lock()
    try body finally l.unlock()
  }

  /** Run `body` holding the EXCLUSIVE side: a rebuild's table swap or an
    * index-level compaction. Blocks until every in-flight batch drains;
    * batches arriving meanwhile queue behind it (and a k-changing swap
    * then fails them loudly at the per-batch fence).
    */
  private def withExclusiveSwapLock[T](body: => T): T = {
    val l = swapLock.writeLock(); l.lock()
    try body finally l.unlock()
  }

  /** The manifest-commit rename, alone in a method so specs can drive the
    * failure path (local-filesystem renames essentially never fail, but
    * production filesystems' do — and a swallowed failure here strands
    * the pin while compactions advance the table).
    */
  private[ops] def commitRename(src: Path, dst: Path): Boolean = fs.rename(src, dst)

  private val ManifestRe = "_ivf_manifest-v(\\d+)\\.json".r

  /** Committed manifest generations on disk, oldest first. */
  private def manifestVersions: Seq[Int] = {
    val rp = new Path(root)
    if (!fs.exists(rp)) return Nil
    fs.listStatus(rp).toSeq.filterNot(_.isDirectory)
      .flatMap(_.getPath.getName match {
        case ManifestRe(n) => Some(n.toInt)
        case _             => None
      }).sorted
  }

  /** The current consistent generation, or None before the first build. */
  def manifest: Option[Manifest] = manifestWithVersion.map(_._2)

  /** The current generation WITH its manifest file version — the version
    * is what guarded writers ([[writeManifestIfCurrent]]) key their
    * nothing-landed-since check on.
    */
  private def manifestWithVersion: Option[(Int, Manifest)] =
    manifestVersions.lastOption.map { v =>
      val in = fs.open(new Path(root, s"_ivf_manifest-v$v.json"))
      val raw = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      val m = TableRepo.parseFlatJson(raw)
      val base = (m.get("max_cluster_frac0"), m.get("mean_assign_cos0")) match {
        case (Some(f), Some(c)) => Some(IvfIndex.Baseline(f.toDouble, c.toDouble))
        case _                  => None
      }
      v -> Manifest(m("cent_version").toInt, m("asg_version").toInt, m("k").toInt, base)
    }

  /** Land `m` as the next manifest generation: whole file under a
    * dot-prefixed temp name (invisible to any reader), then one atomic
    * rename to a FRESH versioned name — readers resolving max-N see the
    * old triple or the new one, never a partial write. Exposed to specs
    * so mid-swap states can be driven step by step.
    */
  private[graft] def writeManifest(m: Manifest): Unit = {
    // unguarded writers never skip: the core returns true or throws
    writeManifestCore(m, expectLast = None): Unit
  }

  /** Guarded variant for hooks racing a rebuild's own manifest flip
    * (streamed compaction's re-pin): lands `m` ONLY if the newest
    * generation is still `expectLast` — both at entry and re-checked
    * right before the rename — and reports a skip instead of publishing
    * over (or past) a generation that landed since `expectLast` was
    * read. A skip (false) ONLY ever means lost-the-race; a rename that
    * fails AFTER the generation check passes is a genuine filesystem
    * failure and THROWS — conflating the two would let a hook's re-pin
    * silently fail every cycle while the table versions march past the
    * pin. In-JVM racers (the only kind the serving lifecycle produces:
    * the hook runs on the driver, and so does any rebuild's flip) are
    * fully serialized by the per-root monitor around the whole
    * list→re-check→rename sequence, so two same-version racers can
    * never both report success nor clobber each other's temp file —
    * local-filesystem rename OVERWRITES an existing destination, so the
    * rename alone would not exclude this (it does on HDFS-like
    * filesystems, which also covers the cross-process case the
    * single-maintainer contract already rules out).
    */
  private[graft] def writeManifestIfCurrent(m: Manifest, expectLast: Int): Boolean =
    writeManifestCore(m, expectLast = Some(expectLast))

  // No early `return`s inside: they would non-locally return through the
  // monitor's by-name block.
  private def writeManifestCore(m: Manifest, expectLast: Option[Int]): Boolean =
    rootLock.synchronized {
      fs.mkdirs(new Path(root))
      val last = manifestVersions.lastOption
      // benign skip #1: a newer generation landed before the lock was taken
      if (expectLast.exists(e => !last.contains(e))) false
      else {
        val next = last.getOrElse(-1) + 1
        // Double.toString round-trips exactly, so the baseline survives the
        // JSON hop bit-for-bit and Manifest equality holds across re-reads
        val baseKv = m.baseline.toSeq.flatMap(b => Seq(
          "max_cluster_frac0" -> b.maxClusterFrac.toString,
          "mean_assign_cos0" -> b.meanAssignCos.toString))
        val json = (Map("cent_version" -> m.centVersion.toString,
          "asg_version" -> m.asgVersion.toString, "k" -> m.k.toString) ++ baseKv)
          .map { case (k, v) => s"${TableRepo.jq(k)}: ${TableRepo.jq(v)}" }
          .mkString("{", ", ", "}")
        val tmp = new Path(root, s"._ivf_manifest-v$next.json.tmp")
        val out = fs.create(tmp, true)
        try out.write(json.getBytes("UTF-8")) finally out.close()
        // benign skip #2 (guarded writers only): a CROSS-PROCESS racer
        // landed between the lock and here — in-JVM ones are serialized by
        // the monitor; on HDFS-like filesystems this narrows the remaining
        // window to list→rename
        if (expectLast.nonEmpty && manifestVersions.lastOption != last) {
          fs.delete(tmp, false): Unit
          false
        } else if (!commitRename(tmp, new Path(root, s"_ivf_manifest-v$next.json"))) {
          // NOT a lost race — the generation check passed and we hold the
          // monitor, so a false rename is a genuine filesystem failure.
          // Swallowing it (returning false) would let a streamed
          // compaction's re-pin "skip" every cycle while table versions
          // advance past the pin, until GC deletes the pinned version and
          // probes start failing far from the root cause — so throw.
          fs.delete(tmp, false): Unit
          throw new java.io.IOException(
            s"manifest commit rename failed under $root (generation v$next)")
        } else {
          // keep the new generation plus one grace manifest for debuggability
          manifestVersions.dropRight(2).foreach(v =>
            fs.delete(new Path(root, s"_ivf_manifest-v$v.json"), false))
          true
        }
      }
    }

  /** Pin the CURRENT committed version pair as a new generation, with the
    * generation's own healthy-signal baseline (one occupancy listing +
    * one broadcast-join pass over the fresh assignment — a rounding
    * error next to the Lloyd iterations the build just ran).
    */
  private def commitManifest(k: Int): Manifest = {
    val s = IvfRepo.driftStats(cent, asg)
    val m = Manifest(cent.snapshotVersions.max, asg.snapshotVersions.max, k,
      Some(IvfIndex.Baseline(s.maxClusterFrac, s.meanAssignCos)))
    writeManifest(m)
    m
  }

  /** Train ([[Ivf.train]] — pinned-seed, deterministic) and land BOTH
    * halves as committed snapshot versions, then flip the manifest. Works
    * identically for the first build and any later retrain — k-changing
    * or not — because probes only ever follow the manifest: both
    * `replaceAll`s land invisible-to-probes fresh versions (old ones
    * survive as grace snapshots), and the atomic manifest rename is the
    * single instant the index generation changes.
    */
  def build(embs: => DataFrame, k: Int, iters: Int,
      trainOn: Option[DataFrame] = None): Manifest =
    // The single-MAINTAINER rule is enforced, not prose: the whole
    // retrain (training included — failing a racing maintainer fast,
    // before it burns Lloyd iterations, beats failing it at the swap)
    // holds the index root's writer lease, so a second process's
    // build/rebuild/compact fails loudly instead of interleaving table
    // swaps with this one. Ingestion (append / streaming batches) stays
    // lease-free — the swap lock below already orders it against the
    // swap, and appends are not lost-update-prone.
    graft.repo.Lease.withLease(fs, root, "IvfIndex.build/rebuild") {
      buildLeased(embs, k, iters, trainOn)
    }

  private def buildLeased(embs: => DataFrame, k: Int, iters: Int,
      trainOn: Option[DataFrame]): Manifest = {
    // The TRAINING snapshot materializes eagerly OUTSIDE the exclusive
    // lock: the Lloyd iterations are the long part of a rebuild, and
    // holding the swap lock across them would quiesce live ingestion for
    // the whole retrain. Training on a corpus snapshot that misses a
    // batch draining meanwhile only nudges the centroids; ASSIGNMENT
    // completeness is what correctness needs, and that is handled below.
    val t = Ckpt(trainOn.getOrElse(embs).select(col("vec_id"), col("embedding")))
    // train is eager by construction (each Lloyd round collects its k-row
    // update), so the full training cost is paid HERE, outside the
    // exclusive lock — the property the former Ckpt existed to pin
    val c = Ivf.train(t, k, iters)
    withExclusiveSwapLock {
      // `embs` is BY-NAME and re-evaluated HERE, inside the exclusive
      // lock — deliberately: a parquet read snapshots its file listing
      // when the plan is CONSTRUCTED, so a pre-lock corpus plan (or the
      // training checkpoint above) would silently drop any ingestion
      // batch that committed between construction and the swap. Every
      // batch holds the shared side for its whole body, so by the time
      // this expression constructs its plan all drained batches are
      // listed and none can land mid-swap. A caller whose `embs`
      // expression reads the live corpus (e.g. the index's own
      // assignment table) therefore gets zero-dropped-rows by
      // construction.
      cent.replaceAll(c)
      asg.replaceAll(Ivf.assign(embs.select(col("vec_id"), col("embedding")), c))
      commitManifest(k)
    }
  }

  /** Lifecycle alias of [[build]]: with the manifest, an in-place retrain
    * over the grown corpus IS just a build — no fresh roots, no probe
    * fencing, any k. `trainOn` bounds the Lloyd input as in
    * [[IvfRepo.build]] (sampled training, full assignment).
    */
  def rebuild(embs: => DataFrame, k: Int, iters: Int,
      trainOn: Option[DataFrame] = None): Manifest =
    build(embs, k, iters, trainOn)

  /** Manifest lag = a rebuild is mid-swap or died mid-swap: ingestion
    * must not land rows keyed by one generation into the other (and rows
    * appended to an unpinned version would be invisible to probes).
    * The one UNAMBIGUOUS lag shape — assignment table ahead, centroid
    * table current — cannot come from a rebuild (those bump cent FIRST);
    * it is a compaction that died between its table commit and the
    * manifest flip, recoverable by [[compact]], so the message says so.
    */
  private def requireCurrent(op: String): Manifest = {
    val m = manifest.getOrElse(throw new IllegalStateException(
      s"no IVF manifest under $root — build() before $op"))
    val centCur = m.centVersion == cent.snapshotVersions.max
    require(centCur && m.asgVersion == asg.snapshotVersions.max,
      s"$op refused: manifest pins (cent v${m.centVersion}, asg v${m.asgVersion}) but the " +
        s"tables are at (cent v${cent.snapshotVersions.max}, asg v${asg.snapshotVersions.max}) — " +
        (if (centCur)
          "a compaction committed but died before re-pinning; run compact() to re-pin"
        else
          "a rebuild is in flight or crashed mid-swap; re-run rebuild to re-pin first"))
    m
  }

  /** Content-preserving maintenance with the manifest kept honest: fold
    * the assignment table's accreted small files ([[append]] lands one
    * file per cluster per batch; at file-granularity serving the probe's
    * cost is file-OPEN count, not bytes — see SCALE.md's crossover
    * study) and RE-PIN the manifest at the compacted version in the same
    * call. Without the re-pin a raw `asg.compact` strands the index:
    * ingestion is fenced (manifest lags) and once later commits GC the
    * pinned version the probe's `getDfAt` fails — compaction at THIS
    * level is what "compaction is part of the serving contract" means.
    *
    * Probes planned before the flip read the pre-compact grace version
    * (intact files, `snapshotRetention >= 1`); the flip is the same
    * atomic manifest rename as [[build]]'s. The centroid half never
    * changes (k rows), so the pinned pair stays trained-together.
    *
    * Also the RECOVERY path for a compaction that committed its table
    * version but crashed before re-pinning (asg ahead, cent current —
    * distinguishable from any rebuild crash, which bumps cent first).
    * Recovery does NOT re-compact: the committed-but-unpinned version IS
    * the compacted content, and re-compacting would land yet another
    * version whose snapshot GC (retention 1) deletes the STILL-PINNED
    * grace version out from under any concurrent probe — recovery only
    * lands the manifest flip the crash lost, touching no table files.
    */
  def compact(targetRecordsPerFile: Long): Manifest =
    // same enforced single-maintainer lease as [[build]]; maintenance is
    // also where crash-stranded lease grave files get reclaimed (the
    // index root is not a table root, so TableRepo's claim sweep never
    // visits it)
    graft.repo.Lease.withLease(fs, root, "IvfIndex.compact") {
      graft.repo.Lease.sweepGraves(fs, root)
      compactLeased(targetRecordsPerFile)
    }

  private def compactLeased(targetRecordsPerFile: Long): Manifest = withExclusiveSwapLock {
    val m = manifest.getOrElse(throw new IllegalStateException(
      s"no IVF manifest under $root — build() before compact"))
    require(m.centVersion == cent.snapshotVersions.max,
      s"compact refused: manifest pins cent v${m.centVersion} but the table is at " +
        s"v${cent.snapshotVersions.max} — a rebuild is in flight or crashed mid-swap; " +
        "re-run rebuild to re-pin first")
    // Recovery (asg ahead, cent current) only claims the ONE shape a
    // crashed compaction leaves: exactly one unpinned assignment version.
    // Every rebuild path bumps cent FIRST ([[IvfRepo.rebuild]] and
    // [[build]] share the order), so with cent current the unpinned
    // version cannot be a half-landed rebuild; anything further ahead
    // than +1 is an unknown writer and must be inspected, not re-pinned.
    require(asg.snapshotVersions.max <= m.asgVersion + 1,
      s"compact refused: assignment table at v${asg.snapshotVersions.max} is more than one " +
        s"version past the pinned v${m.asgVersion} — not a lone crashed compaction; " +
        "inspect the unpinned versions (an external writer?) before re-pinning")
    if (m.asgVersion == asg.snapshotVersions.max) asg.compact(targetRecordsPerFile)
    // content-preserving either way, so the generation's baseline carries
    val next = Manifest(m.centVersion, asg.snapshotVersions.max, m.k, m.baseline)
    writeManifest(next)
    next
  }

  /** Ingest without retraining ([[IvfRepo.append]]): new vectors are
    * assigned against the pinned generation's centroids and appended INTO
    * the pinned assignment version — visible to the next probe at the
    * same pruned cost, no manifest flip needed.
    */
  def append(newVecs: DataFrame): Unit = withSharedSwapLock {
    requireCurrent("append"): Unit
    IvfRepo.append(newVecs, cent, asg)
  }

  /** Streaming ingestion ([[IvfRepo.startAppendStream]]) with the same
    * mid-swap fence as [[append]] at stream start, PLUS a per-batch
    * k-change fence: every micro-batch re-reads the manifest (one
    * directory listing, driver metadata) before anything is transformed
    * or written, and a pinned k different from the one the stream
    * started under FAILS the batch — so the stream dies as a
    * `StreamingQueryException` with nothing landed, instead of assigning
    * rows against a centroid generation the stream was never keyed to.
    * A k-changing rebuild mid-stream therefore no longer depends on
    * operator quiescing to be SAFE — the stream converts the violation
    * into a loud failure at its next batch, and the operator restarts it
    * against the new generation (the restart's start-fence sees a
    * current manifest and the checkpoint resumes exactly-once). A
    * same-k rebuild is still picked up gracefully at the next
    * micro-batch (centroids re-read per batch). Batches IN FLIGHT while
    * a rebuild swaps are excluded by construction: each micro-batch body
    * holds the shared side of the per-root swap lock (class doc), so the
    * rebuild's exclusive swap waits for the batch's ledger commit and no
    * batch can assign against one generation and be dropped by the
    * other's `replaceAll` — no operator quiescing required at all.
    *
    * `compactEvery` is safe HERE (unlike on the raw [[IvfRepo]] path):
    * each mid-stream compaction re-pins the manifest through the sink's
    * `onCompact` hook, in the same `foreachBatch` that ran the compact —
    * so probes planned after it follow the compacted version, ingestion
    * is never fenced by its own maintenance, and the pinned version can
    * not be GC'd out from under the manifest. A probe planned BEFORE a
    * compaction keeps the grace version's intact files; with
    * `snapshotRetention` = 1 it must finish within one compaction
    * interval (raise retention to lengthen that window).
    */
  def startAppendStream(stream: DataFrame, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      writerId: String = "", compactEvery: Int = 0): StreamingQuery = {
    val k0 = requireCurrent("startAppendStream").k
    IvfRepo.startAppendStream(stream, cent, asg, checkpointDir,
      trigger = trigger, writerId = writerId, compactEvery = compactEvery,
      // the WHOLE batch body (fence, assignment, ledger commit, in-batch
      // compaction) runs under the shared side of the swap lock: a
      // rebuild's exclusive table swap waits for the batch to drain, and
      // a batch arriving mid-swap queues until the flip completes — then
      // the k fence below converts a k-change into a loud failure. This
      // closes the in-flight-batch window that used to be the operator's
      // problem (quiesce-across-the-swap).
      around = f => withSharedSwapLock(f()),
      onBatch = () => {
        val m = manifest.getOrElse(throw new IllegalStateException(
          s"manifest vanished under $root during streamed ingestion"))
        if (m.k != k0) throw new IllegalStateException(
          s"streamed ingestion fenced: a k-changing rebuild (k=$k0 -> k=${m.k}) re-pinned " +
            s"the manifest under $root mid-stream — this batch would assign against a " +
            "generation the stream was not started under; restart the stream against the " +
            "new generation (the checkpoint resumes exactly-once)")
      },
      onCompact = () => {
        // centroids are untouched by compaction; keep the pinned pair
        // (and the generation's baseline — content-preserving). If a
        // same-k rebuild has swapped the tables but not yet flipped its
        // manifest, SKIP the re-pin: writing (old cent, new asg) would
        // publish the mixed pair the manifest exists to prevent, and the
        // rebuild's own flip — which reads asg.snapshotVersions.max —
        // will pin the compacted version anyway. The guarded write
        // closes most of the remaining check-then-write window: if a
        // rebuild's commitManifest lands a generation BETWEEN this read
        // and the re-pin's rename, the re-pin aborts as a no-op (the
        // rebuild's flip already pinned the compacted asg max) instead
        // of publishing a mixed pair over it.
        val (v0, m) = manifestWithVersion.getOrElse(throw new IllegalStateException(
          s"manifest vanished under $root during streamed compaction"))
        if (m.centVersion == cent.snapshotVersions.max)
          writeManifestIfCurrent(
            Manifest(m.centVersion, asg.snapshotVersions.max, m.k, m.baseline), v0): Unit
      })
  }

  /** Rebuild-trigger observables over the pinned generation — see
    * [[IvfRepo.driftStats]] for what the signals mean and SCALE.md for
    * the measured thresholds. Fenced like ingestion: when the manifest
    * lags the tables (a rebuild or compaction crashed mid-swap) the
    * current tables are NOT the pinned generation — joining old
    * assignments to new centroids (same id space, wrong Voronoi cells)
    * would return garbage signals that can suppress the recovery rebuild
    * itself — so this fails loudly with the recovery route instead.
    * When the fence passes, current == pinned, so the stats read exactly
    * the generation probes serve.
    */
  def driftStats: IvfRepo.DriftStats = withSharedSwapLock {
    requireCurrent("driftStats"): Unit
    IvfRepo.driftStats(cent, asg)
  }

  /** The measured rebuild trigger (SCALE.md drift study,
    * `docs/ivfdrift_r14_*.jsonl`), executable: fire when the fattest
    * cluster's occupancy share reaches `occFactor` × this generation's
    * build-time value OR the mean assignment cosine falls `cosDropFrac`
    * below it — EITHER signal, because which one moves first depends on
    * the k-vs-drift-density regime (at k=100 occupancy fired at the
    * first drifted batch while the cosine barely moved; at k=32 the
    * cosine fired first while occupancy lagged two batches). Both
    * signals are probe-free and retrain-free: an occupancy directory
    * listing plus one broadcast join over the embedding column.
    *
    * The comparison anchors on the BASELINE STORED IN THE MANIFEST, not
    * on constants: post-rebuild cosine lands above the previous build's
    * (retraining on drifted data fits tighter cells), so absolute
    * thresholds would mis-fire across generations — [[build]] re-anchors
    * automatically. Defaults are the study's operating point.
    */
  def needsRebuild(occFactor: Double = 2.5, cosDropFrac: Double = 0.05): Boolean = withSharedSwapLock {
    val m = requireCurrent("needsRebuild") // mid-swap stats would mix generations
    val b = m.baseline.getOrElse(throw new IllegalStateException(
      s"manifest under $root carries no drift baseline (written by a pre-baseline " +
        "build or by hand) — rebuild() once to anchor the trigger"))
    val s = IvfRepo.driftStats(cent, asg)
    s.maxClusterFrac >= occFactor * b.maxClusterFrac ||
      s.meanAssignCos <= (1.0 - cosDropFrac) * b.meanAssignCos
  }

  /** Serve top-k cosine neighbours from the MANIFEST generation: both
    * halves read at their pinned committed versions
    * ([[TableRepo.getDfAt]]), so the probe is consistent across any
    * concurrent rebuild — including k-changing ones — up to the atomic
    * manifest flip. Plan shape identical to [[IvfRepo.probe]].
    */
  def probe(queries: DataFrame, nprobe: Int, topK: Int): DataFrame = {
    val m = manifest.getOrElse(throw new IllegalStateException(
      s"no IVF manifest under $root — build() before probe"))
    IvfRepo.probeFrames(queries, cent.getDfAt(m.centVersion),
      asg.getDfAt(m.asgVersion), nprobe, topK)
  }
}
