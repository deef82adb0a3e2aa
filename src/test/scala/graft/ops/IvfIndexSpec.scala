package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The manifest contract: a probe against an [[IvfIndex]] must always
  * answer from ONE consistent (centroid-version, assignment-version)
  * generation — in particular ACROSS a k-changing rebuild, at every
  * intermediate table state, under either table-swap ordering. This is
  * the closure of the one documented unsafe window the raw [[IvfRepo]]
  * two-table layout left open (its rebuild doc: "a k-changing rebuild
  * has no cross-table atomicity").
  */
class IvfIndexSpec extends SparkSuite {

  // deterministic synthetic embeddings: 4 well-separated direction
  // clusters in 8-d (same generator as IvfRepoSpec) so k-means converges
  // to a stable index at k=4 AND still splits cleanly at k=8
  private def embs(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val c = i % 4
      val base = Array.fill(8)(0.05f * ((i * 7 + 3) % 5))
      base(c * 2) = 1.0f + 0.01f * (i % 11)
      (i.toLong, base.toSeq)
    }.toDF("vec_id", "embedding")
  }

  // 4 direction clusters each split into 2 ANGULAR subclusters (a 0.45
  // lean on dim 2c+1), plus per-vector jitter so no two vectors tie:
  // k=4 merges each subcluster pair, k=8 separates it. At n=64 a
  // subcluster holds 8 vectors (< topK=10), so the two generations
  // answer top-10 queries DIFFERENTLY — k=4 fills the tail with
  // cross-subcluster neighbours a k=8/nprobe=1 probe cannot reach —
  // which is exactly the observable the pinning assertions need.
  private def embs8(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val c = i % 4
      val s = (i / 4) % 2
      val base = Array.fill(8)(0.0f)
      base(2 * c) = 1.0f
      base(2 * c + 1) = 0.45f * s
      base((2 * c + 2) % 8) = 0.03f * ((i * 5 + 1) % 7)
      (i.toLong, base.toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def sortedRows(df: DataFrame): Seq[(Long, Long)] =
    df.select(col("q_id"), col("n_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("build pins a manifest and probes answer identically to the in-query path") {
    val e = embs(200)
    val idx = new IvfIndex(scratch("ivfidx-parity"), spark)
    val m = idx.build(e, 4, 2)
    assert(m.k == 4)
    assert(idx.manifest.contains(m), "manifest round-trip")
    assert(m.centVersion == idx.cent.snapshotVersions.max)
    assert(m.asgVersion == idx.asg.snapshotVersions.max)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    assertSameRows(
      idx.probe(q, 2, 10).orderBy("q_id", "n_id"),
      Ivf.probeTopK(e, 4, 2, 2, 5L, 10).orderBy("q_id", "n_id"))
  }

  test("a foreign maintainer's live lease makes build/rebuild/compact refuse loudly; stale is taken over") {
    // the single-MAINTAINER rule is enforced by the index root's writer
    // lease, the same mechanism as the keyed-upsert lease (the real
    // second-JVM shape is MultiProcessSpec territory; here the foreign
    // holder is simulated by planting its lease file)
    val e = embs(200)
    val root = scratch("ivfidx-lease")
    val idx = new IvfIndex(root, spark)
    idx.build(e, 4, 2)
    val fs = new org.apache.hadoop.fs.Path("/")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lease = graft.repo.Lease.pathIn(root)
    val out = fs.create(lease, true)
    out.write("foreign-maintainer:rebuild".getBytes("UTF-8")); out.close()
    intercept[java.util.ConcurrentModificationException] { idx.rebuild(e, 8, 2) }
    intercept[java.util.ConcurrentModificationException] { idx.compact(1000L) }
    assert(idx.manifest.exists(_.k == 4), "the refused maintenance must not have swapped")
    // a crashed maintainer (no heartbeat past the ttl) is taken over
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(fs.makeQualified(lease).toUri.getPath),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - graft.repo.Lease.DefaultTtlMs - 30000))
    val m = idx.rebuild(e, 8, 2)
    assert(m.k == 8)
    assert(!fs.exists(lease), "the taken-over lease is released")
  }

  /** Drive a k=4 -> k=8 rebuild STEP BY STEP with a probe after every
    * table commit: until the manifest flips, every probe must return the
    * old generation's exact answer (the superseded versions survive as
    * grace snapshots); after the flip, the new generation's.
    */
  private def kChangingSwap(tag: String, asgFirst: Boolean): Unit = {
    val e = embs8(64)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val idx = new IvfIndex(scratch(s"ivfidx-$tag"), spark)
    idx.build(e, 4, 2)
    val oldAnswer = sortedRows(idx.probe(q, 1, 10))
    // the k=8 target generation, trained identically (pinned seeds) to
    // what rebuild() will land — the expected post-flip answer comes from
    // an INDEPENDENT index so the assertion is not self-referential
    val twin = new IvfIndex(scratch(s"ivfidx-$tag-twin"), spark)
    twin.build(e, 8, 2)
    val newAnswer = sortedRows(twin.probe(q, 1, 10))
    assert(oldAnswer != newAnswer,
      "test needs k=4 and k=8 to answer differently to prove pinning")

    // now the mid-swap states, by hand (exactly what build() does, probed
    // between the steps build() performs back to back)
    val ec = Ckpt(e.select(col("vec_id"), col("embedding")))
    val newCent = Ckpt(Ivf.train(ec, 8, 2))
    val newAsg = Ivf.assign(ec, newCent)
    if (asgFirst) {
      idx.asg.replaceAll(newAsg)
      assert(sortedRows(idx.probe(q, 1, 10)) == oldAnswer,
        "probe after asg swap must still serve the pinned old pair")
      idx.cent.replaceAll(newCent)
    } else {
      idx.cent.replaceAll(newCent)
      assert(sortedRows(idx.probe(q, 1, 10)) == oldAnswer,
        "probe after cent swap must still serve the pinned old pair")
      idx.asg.replaceAll(newAsg)
    }
    assert(sortedRows(idx.probe(q, 1, 10)) == oldAnswer,
      "probe with BOTH tables swapped but manifest unflipped must still serve the old pair")
    idx.writeManifest(IvfIndex.Manifest(
      idx.cent.snapshotVersions.max, idx.asg.snapshotVersions.max, 8))
    assert(sortedRows(idx.probe(q, 1, 10)) == newAnswer,
      "probe after the atomic manifest flip must serve the new k=8 generation")
  }

  test("k-changing rebuild, assignment-first swap: probes pin one generation") {
    kChangingSwap("kswap-asgfirst", asgFirst = true)
  }

  test("k-changing rebuild, centroid-first swap: probes pin one generation") {
    kChangingSwap("kswap-centfirst", asgFirst = false)
  }

  test("rebuild() end-to-end lands the new generation atomically") {
    val e = embs8(64)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val idx = new IvfIndex(scratch("ivfidx-rebuild"), spark)
    idx.build(e, 4, 2)
    val m0 = idx.manifest.get
    val m1 = idx.rebuild(e, 8, 2)
    assert(m1.k == 8 && m1.centVersion > m0.centVersion && m1.asgVersion > m0.asgVersion)
    val twin = new IvfIndex(scratch("ivfidx-rebuild-twin"), spark)
    twin.build(e, 8, 2)
    assert(sortedRows(idx.probe(q, 1, 10)) == sortedRows(twin.probe(q, 1, 10)),
      "rebuild must serve exactly the fresh-built k=8 generation")
    // no torn temp files left behind; exactly one grace manifest retained
    val dir = new java.io.File(idx.root)
    val leftovers = dir.listFiles().map(_.getName).filter(_.contains(".tmp"))
    assert(leftovers.isEmpty, s"temp manifest leftovers: ${leftovers.toSeq}")
    val manifests = dir.listFiles().map(_.getName).filter(_.startsWith("_ivf_manifest"))
    assert(manifests.length == 2, s"keep current + one grace manifest, got ${manifests.toSeq}")
  }

  test("append and probe see the same pinned generation; mid-swap ingestion is fenced") {
    val e = embs(240)
    val head = e.filter(col("vec_id") < 180)
    val tail = e.filter(col("vec_id") >= 180)
    val idx = new IvfIndex(scratch("ivfidx-append"), spark)
    idx.build(head, 4, 2)
    idx.append(tail)
    // appended rows land in the PINNED assignment version: the next probe
    // serves them without any manifest flip
    val q = e.filter(col("vec_id") === 3L)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val neigh = idx.probe(q, 2, 20).collect().map(_.getLong(1)).toSet
    assert(neigh.exists(_ >= 180L), s"no appended vector among neighbours: $neigh")
    // fence: a table committed past the manifest must refuse ingestion
    // instead of landing rows across generations. asg-ahead-with-cent-
    // current is the crashed-COMPACTION shape (rebuilds bump cent first),
    // so the fence routes the operator to compact(), not rebuild
    idx.asg.replaceAll(Ivf.assign(Ckpt(e.select(col("vec_id"), col("embedding"))),
      idx.cent.getFullDf))
    val ex = intercept[IllegalArgumentException] { idx.append(tail) }
    assert(ex.getMessage.contains("compact()"), s"unexpected fence message: ${ex.getMessage}")
    // and a CENT-ahead lag (genuine rebuild crash shape) still says rebuild
    val idx2 = new IvfIndex(scratch("ivfidx-append-centlag"), spark)
    idx2.build(head, 4, 2)
    idx2.cent.replaceAll(Ivf.train(Ckpt(head.select(col("vec_id"), col("embedding"))), 4, 2))
    val ex2 = intercept[IllegalArgumentException] { idx2.append(tail) }
    assert(ex2.getMessage.contains("mid-swap"), s"unexpected fence message: ${ex2.getMessage}")
  }

  test("compact() folds files, answers identically, re-pins the manifest, keeps ingestion open") {
    val e = embs(240)
    val idx = new IvfIndex(scratch("ivfidx-compact"), spark)
    idx.build(e.filter(col("vec_id") < 120), 4, 2)
    // accrete per-batch small files the way serving ingestion does
    for (b <- 0 until 4)
      idx.append(e.filter(col("vec_id") >= 120 + 30 * b && col("vec_id") < 150 + 30 * b))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val before = sortedRows(idx.probe(q, 2, 10))
    val filesBefore = idx.asg.paths.size
    val m0 = idx.manifest.get
    val m1 = idx.compact(100000L)
    assert(m1.asgVersion > m0.asgVersion && m1.centVersion == m0.centVersion && m1.k == m0.k,
      s"compact must advance only the assignment pin: $m0 -> $m1")
    assert(idx.manifest.contains(m1), "manifest flip landed")
    assert(idx.asg.paths.size < filesBefore,
      s"compaction must fold the accreted files: $filesBefore -> ${idx.asg.paths.size}")
    assert(sortedRows(idx.probe(q, 2, 10)) == before,
      "compaction is content-preserving: probe answers must be identical")
    // ingestion keeps flowing — compact is maintenance, not a rebuild
    idx.append(embs(250).filter(col("vec_id") >= 240))
    assert(idx.asg.count() == 250)
  }

  test("a probe planned before compact() answers from the grace version's intact files") {
    val e = embs(240)
    val idx = new IvfIndex(scratch("ivfidx-compact-grace"), spark)
    idx.build(e.filter(col("vec_id") < 120), 4, 2)
    for (b <- 0 until 3)
      idx.append(e.filter(col("vec_id") >= 120 + 40 * b && col("vec_id") < 160 + 40 * b))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val planned = idx.probe(q, 2, 10)
    val expected = sortedRows(planned)
    idx.compact(100000L)
    // the pre-compact plan references the superseded version's files,
    // which survive as the grace snapshot — re-execution must not fail
    // or change answers (compaction is content-preserving)
    assert(sortedRows(planned) == expected,
      "pre-compact probe plan must keep answering from the grace version")
    assert(sortedRows(idx.probe(q, 2, 10)) == expected,
      "post-compact probe answers identically off the folded files")
  }

  test("a compaction that died before the re-pin is recovered by compact()") {
    val e = embs(200)
    val idx = new IvfIndex(scratch("ivfidx-compact-crash"), spark)
    idx.build(e, 4, 2)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val before = sortedRows(idx.probe(q, 2, 10))
    // the crash: table version committed, manifest flip never ran
    idx.asg.compact(100000L)
    val exF = intercept[IllegalArgumentException] {
      idx.append(embs(210).filter(col("vec_id") >= 200))
    }
    assert(exF.getMessage.contains("compact()"), exF.getMessage)
    // probes still serve the pinned (grace) version meanwhile
    assert(sortedRows(idx.probe(q, 2, 10)) == before)
    // recovery: compact() must ONLY re-pin — a re-compact would commit
    // another version whose GC (retention=1) deletes the STILL-PINNED
    // grace version out from under concurrent probes
    val vBefore = idx.asg.snapshotVersions.max
    val m = idx.compact(100000L)
    assert(idx.asg.snapshotVersions.max == vBefore,
      "recovery must not commit a new assignment version")
    assert(idx.manifest.contains(m))
    assert(sortedRows(idx.probe(q, 2, 10)) == before)
    idx.append(embs(210).filter(col("vec_id") >= 200))
    assert(idx.asg.count() == 210)
  }

  test("driftStats and needsRebuild are fenced mid-swap (mixed-generation stats are garbage)") {
    val e = embs(200)
    val idx = new IvfIndex(scratch("ivfidx-stats-fence"), spark)
    idx.build(e, 4, 2)
    // crashed rebuild shape: cent swapped, manifest not flipped — stats
    // over current tables would join old assignments to new centroids
    idx.cent.replaceAll(Ivf.train(Ckpt(e.select(col("vec_id"), col("embedding"))), 4, 2))
    val ex = intercept[IllegalArgumentException] { idx.driftStats }
    assert(ex.getMessage.contains("mid-swap"), ex.getMessage)
    val ex2 = intercept[IllegalArgumentException] { idx.needsRebuild() }
    assert(ex2.getMessage.contains("mid-swap"), ex2.getMessage)
  }

  test("streamed ingestion with compactEvery re-pins the manifest at every compaction") {
    val e = embs(240)
    val idx = new IvfIndex(scratch("ivfidx-stream-compact"), spark)
    idx.build(e.filter(col("vec_id") < 120), 4, 2)
    val m0 = idx.manifest.get
    val srcDir = scratch("ivfidx-st-src")
    val ckpt = scratch("ivfidx-st-ckpt")
    def stream = spark.readStream.schema(e.schema).parquet(srcDir)
    // three AvailableNow runs against one checkpoint, compactEvery=1:
    // every batch compacts and re-pins — after the third, the ORIGINAL
    // pinned version is GC'd (retention=1), so the probe below passing
    // proves the manifest followed the compactions (an un-re-pinned
    // manifest would point getDfAt at deleted files)
    for (b <- 0 until 3) {
      e.filter(col("vec_id") >= 120 + 40 * b && col("vec_id") < 160 + 40 * b)
        .write.mode("append").parquet(srcDir)
      val sq = idx.startAppendStream(stream, ckpt, compactEvery = 1)
      sq.processAllAvailable(); sq.stop()
    }
    val mN = idx.manifest.get
    assert(mN.asgVersion > m0.asgVersion && mN.centVersion == m0.centVersion,
      s"streamed compactions must advance the assignment pin: $m0 -> $mN")
    assert(idx.asg.count() == 240, "exactly-once across the compacting restarts")
    // the probe follows the latest pin and reaches the streamed vectors
    val q = e.filter(col("vec_id") === 2L)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val neigh = idx.probe(q, 2, 30).collect().map(_.getLong(1)).toSet
    assert(neigh.exists(_ >= 120L), s"no streamed vector among neighbours: $neigh")
    // and ingestion is never fenced by its own maintenance
    idx.append(embs(250).filter(col("vec_id") >= 240))
    assert(idx.asg.count() == 250)
  }

  test("driftStats: occupancy skew rises and assignment cosine falls under drifted appends") {
    val e = embs(200)
    val idx = new IvfIndex(scratch("ivfidx-drift"), spark)
    idx.build(e, 4, 2)
    val s0 = idx.driftStats
    assert(s0.clusters == 4 && s0.n == 200)
    assert(s0.maxClusterFrac < 0.35,
      s"4 balanced direction clusters should start near 0.25, got ${s0.maxClusterFrac}")
    assert(s0.meanAssignCos > 0.95,
      s"tight clusters assign near their centroid, got ${s0.meanAssignCos}")
    // drifted tail: a strong lean on dim 0 pulls every new vector into
    // the direction-0 cell and off every frozen centroid — both at-rest
    // signals must move, recall untouched by this spec
    val drifted = embs(260).filter(col("vec_id") >= 200)
      .withColumn("embedding", transform(col("embedding"),
        (x, i) => when(i === 0, x + lit(2.5)).otherwise(x).cast("float")))
    idx.append(drifted)
    val s1 = idx.driftStats
    assert(s1.n == 260)
    assert(s1.maxClusterFrac > s0.maxClusterFrac,
      s"drifted appends must skew occupancy: ${s0.maxClusterFrac} -> ${s1.maxClusterFrac}")
    assert(s1.meanAssignCos < s0.meanAssignCos,
      s"drifted appends must drop the assignment cosine: ${s0.meanAssignCos} -> ${s1.meanAssignCos}")
  }

  test("needsRebuild executes the measured either-signal trigger and re-anchors per generation") {
    val e = embs(200)
    val idx = new IvfIndex(scratch("ivfidx-needsrebuild"), spark)
    idx.build(e, 4, 2)
    val b0 = idx.manifest.get.baseline.get
    assert(b0.meanAssignCos > 0.9 && b0.maxClusterFrac < 0.35,
      s"tight balanced clusters anchor a healthy baseline, got $b0")
    assert(!idx.needsRebuild(), "a fresh index must not demand a rebuild")
    // drift off every trained direction: a strong lean on the ODD dims
    // (all four direction clusters live on even dims) drops each drifted
    // vector's cosine to its nearest frozen centroid — the cosine signal
    // fires while occupancy (80 of 280 rows in one cell) stays under
    // 2.5x, exercising the EITHER-side of the trigger
    val drifted = embs(280).filter(col("vec_id") >= 200)
      .withColumn("embedding", transform(col("embedding"),
        (x, i) => when(i % 2 === 1, x + lit(2.5)).otherwise(x).cast("float")))
    idx.append(drifted)
    assert(idx.needsRebuild(), "strong drift must fire the trigger")
    // rebuild over the drifted corpus: the new generation's baseline
    // re-anchors (driftStats ratios reset to 1.0 by construction), so
    // the trigger arms for the NEXT drift instead of latching
    idx.rebuild(e.unionByName(drifted), 4, 2)
    assert(idx.manifest.get.baseline.isDefined)
    assert(!idx.needsRebuild(), "rebuild re-anchors the baseline on the drifted corpus")
  }

  test("operator's day: streamed drift fires the trigger; a same-k rebuild under the live stream re-anchors it") {
    import org.apache.spark.sql.streaming.Trigger
    val e = embs(200)
    val idx = new IvfIndex(scratch("ivfidx-opday"), spark)
    idx.build(e, 4, 2)
    assert(!idx.needsRebuild())
    val srcDir = scratch("ivfidx-opday-src")
    val ckpt = scratch("ivfidx-opday-ckpt")
    // the drift arrives THROUGH the stream (odd-dim lean: the cosine
    // side of the trigger, occupancy stays under 2.5x); the source must
    // exist before readStream plans, so the first batch seeds it
    val drifted = embs(280).filter(col("vec_id") >= 200)
      .withColumn("embedding", transform(col("embedding"),
        (x, i) => when(i % 2 === 1, x + lit(2.5)).otherwise(x).cast("float")))
    drifted.write.mode("append").parquet(srcDir)
    val sq = idx.startAppendStream(
      spark.readStream.schema(e.schema).parquet(srcDir), ckpt,
      trigger = Trigger.ProcessingTime("50 milliseconds"))
    try {
      sq.processAllAvailable()
      assert(idx.asg.count() == 280, "drifted batch lands through the stream")
      assert(idx.needsRebuild(), "streamed drift must fire the monitoring trigger")
      // the scheduled same-k rebuild lands UNDER the live stream, over
      // exactly the landed corpus (no batch in flight across the swap)
      idx.rebuild(e.unionByName(drifted), 4, 2)
      assert(!idx.needsRebuild(), "rebuild re-anchors the trigger")
      // the stream survives the swap and its next batch assigns against
      // the REBUILT centroids
      val tail = embs(300).filter(col("vec_id") >= 280)
      tail.write.mode("append").parquet(srcDir)
      sq.processAllAvailable()
      assert(idx.asg.count() == 300, "post-rebuild batch lands normally")
      def asMap(df: DataFrame): Map[Long, Long] =
        df.select(col("vec_id"), col("centroid_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(asMap(idx.asg.getFullDf.filter(col("vec_id") >= 280)) ==
        asMap(Ivf.assign(tail, idx.cent.getFullDf)),
        "post-rebuild stream batches assign against the rebuilt generation")
      assert(!idx.needsRebuild(), "a clean tail keeps the re-anchored trigger quiet")
    } finally sq.stop()
  }

  test("a k-changing rebuild mid-stream fails the live stream at its next micro-batch") {
    import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
    val e = embs8(64)
    val idx = new IvfIndex(scratch("ivfidx-kfence"), spark)
    idx.build(e.filter(col("vec_id") < 32), 4, 2)
    val srcDir = scratch("ivfidx-kfence-src")
    val ckpt = scratch("ivfidx-kfence-ckpt")
    e.filter(col("vec_id") >= 32 && col("vec_id") < 48)
      .write.mode("append").parquet(srcDir)
    // a LIVE stream (not AvailableNow restarts): the start-fence passes
    // once at k=4, then the rebuild lands UNDER it
    val sq = idx.startAppendStream(
      spark.readStream.schema(e.schema).parquet(srcDir), ckpt,
      trigger = Trigger.ProcessingTime("50 milliseconds"))
    try {
      sq.processAllAvailable()
      assert(idx.asg.count() == 48, "pre-rebuild batch lands normally")
      // the k-changing rebuild re-pins the manifest mid-stream; the input
      // is the corpus ingested so far, exactly what a real retrain sees
      idx.rebuild(e.filter(col("vec_id") < 48), 8, 2)
      val landed = idx.asg.count()
      e.filter(col("vec_id") >= 48).write.mode("append").parquet(srcDir)
      val ex = intercept[StreamingQueryException] { sq.processAllAvailable() }
      val msgs = Iterator.iterate[Throwable](ex)(_.getCause)
        .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).toSeq
      assert(msgs.exists(_.contains("k-changing rebuild (k=4 -> k=8)")),
        s"stream must die on the k fence, got: $msgs")
      assert(idx.asg.count() == landed,
        "the fenced batch must land NOTHING — fence runs before the ledger commit")
    } finally sq.stop()
    // the documented recovery: restart the stream against the new
    // generation — the start-fence sees a current k=8 manifest and the
    // checkpoint resumes the failed batch exactly-once
    val sq2 = idx.startAppendStream(
      spark.readStream.schema(e.schema).parquet(srcDir), ckpt)
    sq2.processAllAvailable(); sq2.stop()
    assert(idx.asg.count() == 64, "restart lands the fenced batch exactly once")
  }

  test("a same-k rebuild mid-stream is picked up at the next micro-batch, not fenced") {
    import org.apache.spark.sql.streaming.Trigger
    val e = embs8(64)
    val idx = new IvfIndex(scratch("ivfidx-samek"), spark)
    idx.build(e.filter(col("vec_id") < 32), 4, 2)
    val srcDir = scratch("ivfidx-samek-src")
    val ckpt = scratch("ivfidx-samek-ckpt")
    e.filter(col("vec_id") >= 32 && col("vec_id") < 48)
      .write.mode("append").parquet(srcDir)
    val sq = idx.startAppendStream(
      spark.readStream.schema(e.schema).parquet(srcDir), ckpt,
      trigger = Trigger.ProcessingTime("50 milliseconds"))
    try {
      sq.processAllAvailable()
      assert(idx.asg.count() == 48, "pre-rebuild batch lands normally")
      // snapshot the old generation's centroids (k rows) before the swap
      val oldCent = {
        val df = idx.cent.getFullDf
        spark.createDataFrame(java.util.Arrays.asList(df.collect(): _*), df.schema)
      }
      // same k=4, but trained in a dim-rotated embedding space: centroid
      // j converges to direction j+1, so EVERY post-rebuild assignment id
      // differs from the old generation's — a stream still holding the
      // old centroids could not produce a single correct row
      val rotated = e.filter(col("vec_id") < 48).select(col("vec_id"),
        expr("concat(slice(embedding, 7, 2), slice(embedding, 1, 6))").as("embedding"))
      idx.rebuild(e.filter(col("vec_id") < 48), 4, 2, trainOn = Some(rotated))
      val m = idx.manifest.get
      e.filter(col("vec_id") >= 48).write.mode("append").parquet(srcDir)
      sq.processAllAvailable() // must NOT trip the k fence
      assert(idx.asg.count() == 64,
        "the post-rebuild batch lands into the rebuilt generation")
      assert(idx.manifest.contains(m),
        "appends land INTO the pinned generation — no manifest flip")
      def asMap(df: DataFrame): Map[Long, Long] =
        df.select(col("vec_id"), col("centroid_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toMap
      val landed = asMap(idx.asg.getFullDf.filter(col("vec_id") >= 48))
      val fresh = asMap(Ivf.assign(
        e.filter(col("vec_id") >= 48), idx.cent.getFullDf))
      assert(landed == fresh,
        "appended rows must carry the NEW generation's assignments")
      val stale = asMap(Ivf.assign(e.filter(col("vec_id") >= 48), oldCent))
      assert(landed.forall { case (v, c) => stale(v) != c },
        "rotation guarantees every id differs across generations — " +
          "a match means the observable went vacuous")
    } finally sq.stop()
  }

  test("writeManifestIfCurrent aborts as a no-op when a newer generation landed since its read") {
    val e = embs(200)
    val idx = new IvfIndex(scratch("ivfidx-guarded"), spark)
    idx.build(e, 4, 2)
    val m = idx.manifest.get
    // build landed manifest v0; a guarded re-pin that read v0 lands v1
    assert(idx.writeManifestIfCurrent(m, 0), "guarded write at the expected version lands")
    assert(idx.manifest.contains(m))
    // a guarded writer still holding v0 now races a landed v1: must abort
    // without publishing and without leaving temp junk behind
    assert(!idx.writeManifestIfCurrent(m.copy(asgVersion = m.asgVersion + 7), 0),
      "stale expected version must abort the write")
    assert(idx.manifest.contains(m), "aborted write publishes nothing")
    val leftovers = new java.io.File(idx.root)
      .listFiles().map(_.getName).filter(_.contains(".tmp"))
    assert(leftovers.isEmpty, s"temp manifest leftovers: ${leftovers.toSeq}")
  }

  test("two guarded re-pins racing for the same version: exactly one lands, winner's content survives") {
    import java.util.concurrent.{Callable, CyclicBarrier, Executors}
    val e = embs(200)
    val idx = new IvfIndex(scratch("ivfidx-race"), spark)
    idx.build(e, 4, 2)
    val base = idx.manifest.get
    // local-FS rename overwrites an existing destination and the temp
    // name is versioned, so WITHOUT the per-root monitor two racers for
    // v(next) could clobber each other's temp and both report success —
    // each round releases both attempts through a barrier and asserts
    // the loser reported a skip and did not overwrite the winner's content
    val pool = Executors.newFixedThreadPool(2)
    try {
      var v = 0
      for (round <- 1 to 20) {
        val barrier = new CyclicBarrier(2)
        val expect = v
        val attempts = Seq(1000 + round, 2000 + round).map { tag =>
          pool.submit(new Callable[(Int, Boolean)] {
            def call(): (Int, Boolean) = {
              barrier.await()
              (tag, idx.writeManifestIfCurrent(base.copy(asgVersion = tag), expect))
            }
          })
        }
        val results = attempts.map(_.get())
        assert(results.count(_._2) == 1,
          s"round $round: exactly one racer must land, got $results")
        val winner = results.find(_._2).get._1
        assert(idx.manifest.get.asgVersion == winner,
          s"round $round: the loser overwrote the winner's manifest")
        v += 1
      }
    } finally pool.shutdown()
  }

  test("compact recovery refuses an assignment table more than one version past the pin") {
    val e = embs(200)
    val idx = new IvfIndex(scratch("ivfidx-compact-2ahead"), spark)
    idx.build(e, 4, 2)
    val m = idx.manifest.get
    // two unpinned commits cannot come from a lone crashed compaction
    // (each compact() re-pins before another can run) — an external
    // writer shape that recovery must refuse to bless with a re-pin
    val full = Ckpt(e.select(col("vec_id"), col("embedding")))
    idx.asg.replaceAll(Ivf.assign(full, idx.cent.getFullDf))
    idx.asg.replaceAll(Ivf.assign(full, idx.cent.getFullDf))
    assert(idx.asg.snapshotVersions.max > m.asgVersion + 1)
    val ex = intercept[IllegalArgumentException] { idx.compact(100000L) }
    assert(ex.getMessage.contains("more than one"), ex.getMessage)
  }

  test("differently-spelled roots share one manifest-commit monitor") {
    import java.util.concurrent.{Callable, CyclicBarrier, Executors}
    val root = scratch("ivfidx-lockkey")
    val idx1 = new IvfIndex(root, spark)
    val idx2 = new IvfIndex("file:" + root, spark) // same directory, URI spelling
    // keying the monitor on the raw spelling would hand these two handles
    // different locks — and local rename's overwrite semantics would then
    // let two racers for the same next version both land
    assert(idx1.rootLock eq idx2.rootLock,
      "qualified-path lock keying: one physical root must mean one monitor")
    idx1.build(embs(200), 4, 2)
    val base = idx1.manifest.get
    assert(idx2.manifest.contains(base), "both spellings read the same manifest")
    // behavioral check: guarded re-pins racing ACROSS the two instances
    // still serialize — exactly one lands per round, winner's content kept
    val pool = Executors.newFixedThreadPool(2)
    try {
      for (round <- 1 to 10) {
        val barrier = new CyclicBarrier(2)
        val expect = round - 1
        val attempts = Seq(idx1 -> (1000 + round), idx2 -> (2000 + round)).map {
          case (idx, tag) =>
            pool.submit(new Callable[(Int, Boolean)] {
              def call(): (Int, Boolean) = {
                barrier.await()
                (tag, idx.writeManifestIfCurrent(base.copy(asgVersion = tag), expect))
              }
            })
        }
        val results = attempts.map(_.get())
        assert(results.count(_._2) == 1,
          s"round $round: exactly one cross-instance racer must land, got $results")
        val winner = results.find(_._2).get._1
        assert(idx1.manifest.get.asgVersion == winner,
          s"round $round: the loser overwrote the winner's manifest")
      }
    } finally pool.shutdown()
  }

  test("a failing manifest-commit rename throws instead of reporting a benign skip") {
    import org.apache.hadoop.fs.Path
    val e = embs(200)
    val root = scratch("ivfidx-renamefail")
    val idx = new IvfIndex(root, spark)
    idx.build(e, 4, 2)
    val m = idx.manifest.get
    // production filesystems' renames DO fail; a false here is not a lost
    // race (the generation check passed under the monitor), and swallowing
    // it would let a streamed compaction's re-pin "skip" every cycle while
    // table versions advance past the pin
    val failing = new IvfIndex(root, spark) {
      override private[ops] def commitRename(src: Path, dst: Path): Boolean = false
    }
    intercept[java.io.IOException] { failing.writeManifest(m) }
    intercept[java.io.IOException] { failing.writeManifestIfCurrent(m, 0): Unit }
    // a genuinely stale expected version is still the benign skip: it
    // aborts BEFORE the rename, so the failing rename is never consulted
    assert(!failing.writeManifestIfCurrent(m, 99),
      "stale expected version stays a benign skip, not an IO failure")
    assert(idx.manifest.contains(m), "nothing published by any failed attempt")
    val leftovers = new java.io.File(root)
      .listFiles().map(_.getName).filter(_.contains(".tmp"))
    assert(leftovers.isEmpty, s"temp manifest leftovers: ${leftovers.toSeq}")
  }

  test("probe without a build fails loudly") {
    val idx = new IvfIndex(scratch("ivfidx-empty"), spark)
    val q = embs(8).select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val ex = intercept[IllegalStateException] { idx.probe(q, 2, 5) }
    assert(ex.getMessage.contains("no IVF manifest"))
  }

  test("a rebuild fired mid-batch waits for the batch's ledger commit (swap-lock barrier)") {
    import java.util.concurrent.TimeUnit
    import org.apache.spark.sql.streaming.Trigger
    val e = embs8(40)
    val idx = new IvfIndex(scratch("ivfidx-barrier"), spark)
    idx.build(e.filter(col("vec_id") < 32), 4, 2)
    val m0 = idx.manifest.get
    val srcDir = scratch("ivfidx-barrier-src")
    val ckptDir = scratch("ivfidx-barrier-ckpt")
    new java.io.File(srcDir).mkdirs() // readStream refuses a missing path
    // a stream whose batch TASKS block on a latch: the foreachBatch body
    // holds the shared side of the swap lock for its whole execution, so
    // while the tasks are stalled the batch is provably mid-flight
    IvfIndexSpec.resetBarrier()
    val gate = udf { (id: Long) =>
      IvfIndexSpec.batchStarted.countDown()
      IvfIndexSpec.batchRelease.await(120, TimeUnit.SECONDS)
      true
    }
    val sq = idx.startAppendStream(
      spark.readStream.schema(e.schema).parquet(srcDir).filter(gate(col("vec_id"))),
      ckptDir, trigger = Trigger.ProcessingTime("50 milliseconds"))
    var rebuildThread: Thread = null
    try {
      e.filter(col("vec_id") >= 32).write.mode("append").parquet(srcDir)
      assert(IvfIndexSpec.batchStarted.await(60, TimeUnit.SECONDS),
        "the gated batch must start executing")
      // mid-batch: fire a same-k rebuild whose corpus is the LIVE table —
      // the swap must wait for the batch to drain, then include its rows
      @volatile var rebuildErr: Throwable = null
      rebuildThread = new Thread(() => {
        try idx.rebuild(idx.asg.getFullDf.select(col("vec_id"), col("embedding")), 4, 2)
        catch { case t: Throwable => rebuildErr = t }
      })
      rebuildThread.start()
      // while the batch is stalled, the swap must not land: the manifest
      // stays at generation 0 however long we watch. (If training is
      // still running when the window closes the check is vacuous but
      // never false — only a genuine mid-batch swap can fail it.)
      val deadline = System.nanoTime() + 3000L * 1000 * 1000
      while (System.nanoTime() < deadline) {
        assert(idx.manifest.contains(m0),
          "the rebuild's swap landed while a batch was mid-flight")
        Thread.sleep(50)
      }
      IvfIndexSpec.batchRelease.countDown()
      sq.processAllAvailable()
      rebuildThread.join(120000)
      assert(!rebuildThread.isAlive, "rebuild must complete once the batch drains")
      assert(rebuildErr == null, s"rebuild failed: $rebuildErr")
    } finally {
      IvfIndexSpec.batchRelease.countDown() // idempotent; frees a failed run
      sq.stop()
      if (rebuildThread != null) rebuildThread.join(120000)
    }
    // zero dropped rows: the batch committed BEFORE the swap, so the
    // rebuild's under-lock corpus read saw its rows — all 40 survive,
    // each exactly once, carrying the REBUILT generation's assignments
    assert(!idx.manifest.contains(m0), "the rebuild re-pinned a new generation")
    val landed = idx.asg.getFullDf.select(col("vec_id"), col("centroid_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(landed.map(_._1).sorted == (0L until 40L), s"expected all 40 rows once, got ${landed.size}")
    val fresh = Ivf.assign(e, idx.cent.getFullDf)
      .select(col("vec_id"), col("centroid_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(landed.forall { case (v, c) => fresh(v) == c },
      "every row carries the rebuilt generation's assignment")
  }

  test("zero dropped rows across 20 rounds of append racing a k-alternating rebuild") {
    val n = 32 + 20 * 4
    val all = embs8(n)
    val idx = new IvfIndex(scratch("ivfidx-race20"), spark)
    idx.build(all.filter(col("vec_id") < 32), 4, 2)
    val rnd = new scala.util.Random(20)
    for (r <- 0 until 20) {
      val lo = 32 + r * 4
      val batch = all.filter(col("vec_id") >= lo && col("vec_id") < lo + 4)
      val k = if (r % 2 == 0) 5 else 4 // alternate so every rebuild is k-changing
      @volatile var err: Throwable = null
      val appender = new Thread(() => {
        try { Thread.sleep(rnd.nextInt(120).toLong); idx.append(batch) }
        catch { case t: Throwable => err = t }
      })
      val rebuilder = new Thread(() => {
        try {
          Thread.sleep(rnd.nextInt(120).toLong)
          idx.rebuild(idx.asg.getFullDf.select(col("vec_id"), col("embedding")), k, 2)
        } catch { case t: Throwable => err = t }
      })
      appender.start(); rebuilder.start()
      appender.join(180000); rebuilder.join(180000)
      assert(!appender.isAlive && !rebuilder.isAlive, s"round $r wedged")
      if (err != null) throw new AssertionError(s"round $r failed", err)
      // the serialization invariant: whichever order the lock imposed,
      // every row ingested so far is present exactly once — the rebuild
      // either waited for the append (live-table corpus includes it) or
      // preceded it (the append lands into the rebuilt generation)
      val ids = idx.asg.getFullDf.select(col("vec_id"))
        .collect().map(_.getLong(0)).toSeq
      assert(ids.sorted == (0L until (lo + 4).toLong),
        s"round $r: expected ${lo + 4} distinct rows, got ${ids.size} (${ids.distinct.size} distinct)")
    }
    // rows appended after the final rebuild were assigned against the
    // final centroids, rebuilt rows by the final replaceAll — so the
    // whole table must agree with a fresh assignment
    val fresh = Ivf.assign(all, idx.cent.getFullDf)
      .select(col("vec_id"), col("centroid_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val landed = idx.asg.getFullDf.select(col("vec_id"), col("centroid_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(landed.forall { case (v, c) => fresh(v) == c },
      "no row may carry a superseded generation's assignment")
  }
}

object IvfIndexSpec {
  // latches for the swap-lock barrier test: static so the blocking udf's
  // executor-side tasks (same JVM under local[*]) can reach them
  @volatile var batchStarted: java.util.concurrent.CountDownLatch = _
  @volatile var batchRelease: java.util.concurrent.CountDownLatch = _
  def resetBarrier(): Unit = {
    batchStarted = new java.util.concurrent.CountDownLatch(1)
    batchRelease = new java.util.concurrent.CountDownLatch(1)
  }
}
