package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.repo.TableRepo

/** The persisted-IVF serving contract: a probe against the at-rest index
  * must (1) answer value-identically to the in-query [[Ivf.probeTopK]]
  * path, and (2) scan ONLY the probed clusters' directories — the
  * partition-pruning property the 100 TB story depends on. q_ivf_probe_repo
  * oracles the end-to-end math; this spec proves the file-subset claim.
  */
class IvfRepoSpec extends SparkSuite {

  // deterministic synthetic embeddings: 4 well-separated direction
  // clusters in 8-d so k-means converges to a stable, probe-friendly index
  private def embs(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val c = i % 4
      val base = Array.fill(8)(0.05f * ((i * 7 + 3) % 5))
      base(c * 2) = 1.0f + 0.01f * (i % 11)
      (i.toLong, base.toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def builtRepos(tag: String, e: DataFrame): (TableRepo, TableRepo) = {
    val cent = new TableRepo(scratch(s"ivf-cent-$tag"), spark)
    val asg = new TableRepo(scratch(s"ivf-asg-$tag"), spark, groupCols = Seq("centroid_id"))
    IvfRepo.build(e, 4, 2, cent, asg)
    (cent, asg)
  }

  test("repo probe is value-identical to the in-query probeTopK path") {
    val e = embs(200)
    val (cent, asg) = builtRepos("parity", e)
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    assertSameRows(
      IvfRepo.probe(queries, cent, asg, 2, 10).orderBy("q_id", "n_id"),
      Ivf.probeTopK(e, 4, 2, 2, 5L, 10).orderBy("q_id", "n_id"))
  }

  test("candidate scan partition-prunes to the probed centroid directories") {
    val e = embs(400)
    val (_, asg) = builtRepos("prune", e)
    val allIds = asg.getFullDf.select("centroid_id").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(allIds.size == 4, s"expected 4 populated clusters, got $allIds")
    val probed = allIds.take(2)
    val cand = IvfRepo.candidates(asg, probed)
    cand.collect()

    val planStr = cand.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters"), s"no PartitionFilters in:\n$planStr")
    assert(planStr.contains("centroid_id"), "prune must target the partition column")

    def scanOf(p: org.apache.spark.sql.execution.SparkPlan): Option[FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => scanOf(a.executedPlan)
        case f: FileSourceScanExec    => Some(f)
        case other => other.children.view.flatMap(scanOf).headOption
      }
    val scan = scanOf(cand.queryExecution.executedPlan)
      .getOrElse(fail("no FileSourceScanExec in the candidate plan"))
    val scannedFiles = scan.metrics("numFiles").value
    val probedDirFiles = asg.paths.count(p => probed.exists(id => p.contains(s"centroid_id=$id")))
    val totalFiles = asg.paths.size
    assert(scannedFiles == probedDirFiles,
      s"scan must touch exactly the probed dirs' files: scanned=$scannedFiles probed=$probedDirFiles")
    assert(scannedFiles < totalFiles,
      s"pruning must skip the unprobed dirs: scanned=$scannedFiles total=$totalFiles")

    // and the pruned scan equals the full-scan filter exactly
    assertSameRows(
      cand.orderBy("n_id"),
      asg.getFullDf.filter(col("centroid_id").isin(probed: _*))
        .select(col("vec_id").as("n_id"), col("centroid_id"), col("embedding").as("n_emb"))
        .orderBy("n_id"))
  }

  test("append assigns new vectors against the persisted centroids — no retrain") {
    val e = embs(200)
    val head = e.filter(col("vec_id") < 150)
    val tail = e.filter(col("vec_id") >= 150)
    val cent = new TableRepo(scratch("ivf-cent-app"), spark)
    val asg = new TableRepo(scratch("ivf-asg-app"), spark, groupCols = Seq("centroid_id"))
    IvfRepo.build(head, 4, 2, cent, asg)
    IvfRepo.append(tail, cent, asg)
    // the repo now holds exactly the full corpus assigned against the
    // HEAD-trained centroids (append never re-trains)
    assertSameRows(
      asg.getFullDf.select("vec_id", "centroid_id").orderBy("vec_id"),
      Ivf.assign(e, cent.getFullDf).select("vec_id", "centroid_id").orderBy("vec_id"))
    // and probes see appended vectors at the same pruned cost: vec 151 is
    // vec 3's near-twin by construction (same direction cluster), so a
    // post-append probe must surface appended ids among the neighbours
    val queries = e.filter(col("vec_id") === 3L)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val neigh = IvfRepo.probe(queries, cent, asg, 2, 20).collect().map(_.getLong(1)).toSet
    assert(neigh.exists(_ >= 150L), s"no appended vector among neighbours: $neigh")
  }

  test("rebuild retrains over the full corpus and swaps snapshot versions in place") {
    val e = embs(200)
    val head = e.filter(col("vec_id") < 120)
    val cent = new TableRepo(scratch("ivf-cent-rb"), spark)
    val asg = new TableRepo(scratch("ivf-asg-rb"), spark, groupCols = Seq("centroid_id"))
    IvfRepo.build(head, 4, 2, cent, asg)
    val headVersions = asg.snapshotVersions.size
    IvfRepo.rebuild(e, 4, 2, cent, asg)
    assert(asg.snapshotVersions.size > headVersions, "rebuild must land a new snapshot version")
    assert(asg.count() == 200, s"rebuilt assignment covers the full corpus, got ${asg.count()}")
    // post-rebuild probes equal the in-query path trained on the SAME data
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    assertSameRows(
      IvfRepo.probe(queries, cent, asg, 2, 10).orderBy("q_id", "n_id"),
      Ivf.probeTopK(e, 4, 2, 2, 5L, 10).orderBy("q_id", "n_id"))
  }

  test("rebuild with trainOn trains on the sample but reassigns the full corpus") {
    val e = embs(200)
    val cent = new TableRepo(scratch("ivf-cent-rbto"), spark)
    val asg = new TableRepo(scratch("ivf-asg-rbto"), spark, groupCols = Seq("centroid_id"))
    IvfRepo.build(e.filter(col("vec_id") < 120), 4, 2, cent, asg)
    // sampled Lloyd input: the seeds plus every 3rd id — the production
    // rebuild shape at corpus scale (train bounded, assignment full)
    val sample = e.filter(col("vec_id") < 4 || col("vec_id") % 3 === 0)
    IvfRepo.rebuild(e, 4, 2, cent, asg, Some(sample))
    assert(asg.count() == 200, s"assignment must cover the FULL corpus, got ${asg.count()}")
    // the landed centroids are exactly a train over the sample alone
    assertSameRows(
      cent.getFullDf.orderBy("centroid_id"),
      Ivf.train(sample, 4, 2).orderBy("centroid_id"))
    // and a sample missing seed rows fails fast, same as build's contract
    val err = intercept[IllegalArgumentException] {
      IvfRepo.rebuild(e, 4, 2, cent, asg,
        Some(e.filter(col("vec_id") >= 2 && col("vec_id") % 3 === 0)))
    }
    assert(err.getMessage.contains("seed"), err.getMessage)
  }

  test("streamed ingestion equals batch append and restarts exactly-once") {
    // the streaming face of append: micro-batches assigned against the
    // persisted centroids inside foreachBatch, landed through the commit
    // ledger — the same batch/stream-twin discipline the dedup family
    // proves, applied to the ANN index
    val e = embs(240)
    val head = e.filter(col("vec_id") < 120)
    val mid = e.filter(col("vec_id") >= 120 && col("vec_id") < 180)
    val tail = e.filter(col("vec_id") >= 180)
    val cent = new TableRepo(scratch("ivf-cent-st"), spark)
    val asg = new TableRepo(scratch("ivf-asg-st"), spark, groupCols = Seq("centroid_id"))
    IvfRepo.build(head, 4, 2, cent, asg)

    val srcDir = scratch("ivf-st-src")
    val ckpt = scratch("ivf-st-ckpt")
    def stream = spark.readStream.schema(e.schema).parquet(srcDir)
    mid.write.parquet(srcDir)
    val q1 = IvfRepo.startAppendStream(stream, cent, asg, ckpt)
    q1.processAllAvailable(); q1.stop()

    // RESTART from the same checkpoint with a second drop: only the new
    // files may land — a replay of the first drop would double-assign
    tail.write.mode("append").parquet(srcDir)
    val q2 = IvfRepo.startAppendStream(stream, cent, asg, ckpt)
    q2.processAllAvailable(); q2.stop()

    // batch twin: build on the same head, append the same two batches
    val centT = new TableRepo(scratch("ivf-cent-st-twin"), spark)
    val asgT = new TableRepo(scratch("ivf-asg-st-twin"), spark, groupCols = Seq("centroid_id"))
    IvfRepo.build(head, 4, 2, centT, asgT)
    IvfRepo.append(mid, centT, asgT)
    IvfRepo.append(tail, centT, asgT)
    assertSameRows(
      asg.getFullDf.select("vec_id", "centroid_id").orderBy("vec_id"),
      asgT.getFullDf.select("vec_id", "centroid_id").orderBy("vec_id"))
    assert(asg.count() == 240, s"exactly-once: got ${asg.count()}")
    // and probes reach the streamed vectors through the pruned serving path
    val queries = e.filter(col("vec_id") === 2L)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val neigh = IvfRepo.probe(queries, cent, asg, 2, 30).collect()
      .map(_.getLong(1)).toSet
    assert(neigh.exists(_ >= 120L), s"no streamed vector among neighbours: $neigh")
  }

  test("streamed ingestion drops the crash-window replay (ledger ahead of checkpoint)") {
    // THE exactly-once window: the assignment landed through the commit
    // ledger but the streaming checkpoint never recorded the batch, so a
    // restart replays it — the ledger must drop the replay, assignments
    // landing exactly once
    val e = embs(200)
    val head = e.filter(col("vec_id") < 150)
    val mid = e.filter(col("vec_id") >= 150 && col("vec_id") < 180)
    val tail = e.filter(col("vec_id") >= 180)
    val cent = new TableRepo(scratch("ivf-cent-cw"), spark)
    val asg = new TableRepo(scratch("ivf-asg-cw"), spark, groupCols = Seq("centroid_id"))
    IvfRepo.build(head, 4, 2, cent, asg)

    // simulate the crash: batch 0's transformed rows are ledger-committed
    // under the sink's writer identity, checkpoint knows nothing
    asg.extendExactlyOnce(
      Ivf.assign(mid.select(col("vec_id"), col("embedding")), cent.getFullDf),
      "w-ivf", 0L): Unit
    assert(asg.count() == 180)

    val srcDir = scratch("ivf-cw-src")
    val ckpt = scratch("ivf-cw-ckpt")
    def stream = spark.readStream.schema(e.schema).parquet(srcDir)
    mid.write.parquet(srcDir)
    // restart: the engine replays batch 0 from scratch; the ledger drops it
    val q1 = IvfRepo.startAppendStream(stream, cent, asg, ckpt, writerId = "w-ivf")
    q1.processAllAvailable(); q1.stop()
    assert(asg.count() == 180, s"crash-window replay double-landed: ${asg.count()}")
    // and the stream continues normally past the replayed batch
    tail.write.mode("append").parquet(srcDir)
    val q2 = IvfRepo.startAppendStream(stream, cent, asg, ckpt, writerId = "w-ivf")
    q2.processAllAvailable(); q2.stop()
    assert(asg.count() == 200, s"post-replay batch must land: ${asg.count()}")
    assert(asg.getFullDf.groupBy("vec_id").count().filter(col("count") > 1).count() == 0,
      "no vec_id may land twice")
  }

  test("a probe planned before a rebuild answers from the grace version") {
    // substantiates IvfRepo.rebuild's swap contract: a probe whose candidate
    // scan was planned against the OLD index must complete with the OLD
    // answer after replaceAll lands the new snapshot versions, because the
    // superseded version survives as TableRepo's grace version
    val e = embs(200)
    val (cent, asg) = builtRepos("grace", e)
    val queries = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val expected = IvfRepo.probe(queries, cent, asg, 2, 10).collect().toSeq
    // plan (file indexes resolved, centroid phase executed) but don't collect
    val planned = IvfRepo.probe(queries, cent, asg, 2, 10)
    // grow the corpus and swap the index in place — new centroids, new
    // assignment table, same k
    IvfRepo.rebuild(e.union(embs(260).filter(col("vec_id") >= 200)), 4, 2, cent, asg)
    assert(planned.collect().toSeq.sortBy(_.getLong(1)) ==
      expected.sortBy(_.getLong(1)),
      "pre-swap probe plan must keep answering from the grace version's files")
    // and a probe planned AFTER the swap serves the rebuilt corpus: the
    // appended near-twins (vec_id >= 200 share direction clusters by
    // construction) must be reachable among the neighbours
    val fresh = IvfRepo.probe(queries, cent, asg, 2, 20).collect()
      .map(_.getLong(1)).toSet
    assert(fresh.exists(_ >= 200L), s"post-rebuild probe missed appended ids: $fresh")
  }

  test("probe touches no unprobed-cluster files end to end") {
    val e = embs(300)
    val (cent, asg) = builtRepos("e2e", e)
    val queries = e.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val out = IvfRepo.probe(queries, cent, asg, 1, 5)
    val rows = out.collect()
    assert(rows.length == 5, s"topK=5 for one query, got ${rows.length}")
    // nprobe=1: every neighbour must come from ONE cluster
    val asgMap = asg.getFullDf.select("vec_id", "centroid_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val clusters = rows.map(r => asgMap(r.getLong(1))).distinct
    assert(clusters.length == 1, s"nprobe=1 neighbours spanned clusters $clusters")
  }

  test("a training sample missing seed rows fails fast instead of under-seeding") {
    // a trainOn sample without all of vec_id ∈ [0, k) would silently seed
    // fewer than k centroids (manifest still recording the requested k) —
    // Ivf.train enforces the seed contract at build time
    val e = embs(100)
    val cent = new TableRepo(scratch("ivf-cent-underseed"), spark)
    val asg = new TableRepo(scratch("ivf-asg-underseed"), spark,
      groupCols = Seq("centroid_id"))
    val err = intercept[IllegalArgumentException] {
      IvfRepo.build(e, 4, 2, cent, asg,
        trainOn = Some(e.filter(col("vec_id") >= 2)))
    }
    assert(err.getMessage.contains("seed"), err.getMessage)
    // and a DUPLICATED seed id masking a missing one (4 rows, 3 distinct)
    // must fail the same way, not seed a duplicate centroid
    val dup = e.filter(col("vec_id") < 3)
      .unionByName(e.filter(col("vec_id") === 1))
      .unionByName(e.filter(col("vec_id") >= 4))
    val err2 = intercept[IllegalArgumentException] {
      IvfRepo.build(e, 4, 2,
        new TableRepo(scratch("ivf-cent-dupseed"), spark),
        new TableRepo(scratch("ivf-asg-dupseed"), spark, groupCols = Seq("centroid_id")),
        trainOn = Some(dup))
    }
    assert(err2.getMessage.contains("distinct"), err2.getMessage)
  }
}
