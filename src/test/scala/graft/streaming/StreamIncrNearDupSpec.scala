package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.SparkSuite
import graft.repo.TableRepo

/** Restart-safe streaming NEAR-dup against the persisted band index +
  * text repo: the three-write ledger ordering of [[StreamIncrNearDup]]
  * resolves every crash/replay window to exactly-once on all repos.
  */
class StreamIncrNearDupSpec extends SparkSuite {
  import spark.implicits._

  private val A = "the quick brown fox jumps over the lazy dog tonight"
  private val ANear = A + " again" // high-jaccard near-dup of A
  private val B = "completely different words about parquet footer statistics pruning"

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def mk(tag: String): (TableRepo, TableRepo, TableRepo) = (
    new TableRepo(scratch(s"sind-$tag-bands"), spark),
    new TableRepo(scratch(s"sind-$tag-texts"), spark),
    new TableRepo(scratch(s"sind-$tag-verdicts"), spark))

  test("micro-batches near-dedup against the durable index; replay is a no-op") {
    val (bands, texts, verdicts) = mk("base")
    assert(StreamIncrNearDup.processBatch(
      docs((1L, A), (2L, B)), bands, texts, verdicts, "w", 0L))
    assert(verdicts.count() == 0 && texts.count() == 2)
    val bandCount = bands.count()
    assert(bandCount == 8, s"2 docs x 4 bands, got $bandCount")
    assert(StreamIncrNearDup.processBatch(
      docs((7L, ANear)), bands, texts, verdicts, "w", 1L))
    val got = verdicts.getFullDf.collect()
      .map(r => (r.getAs[Long]("batch_doc"), r.getAs[Long]("dup_of"))).toSet
    assert(got == Set((7L, 1L)), s"got $got")
    assert(texts.count() == 3 && bands.count() == 12)
    // full replay after commit: inert everywhere
    assert(!StreamIncrNearDup.processBatch(
      docs((7L, ANear)), bands, texts, verdicts, "w", 1L))
    assert(verdicts.count() == 1 && texts.count() == 3 && bands.count() == 12)
  }

  test("crash after verdict and text commits resolves exactly-once on all three repos") {
    val (bands, texts, verdicts) = mk("crash")
    StreamIncrNearDup.processBatch(docs((1L, A), (2L, B)), bands, texts, verdicts, "w", 0L)
    // crashed attempt of batch 1: steps 1 (verdict) and 2 (texts) landed,
    // step 3 (bands — the replay guard) did not
    val b1 = docs((7L, ANear))
    val (v, _) = graft.ops.Queries.incrNearVerdictAndBands(bands, b1, texts)
    verdicts.extendExactlyOnce(v, "w-verdicts", 1L)
    texts.extendExactlyOnce(b1, "w-texts", 1L)
    assert(verdicts.count() == 1 && texts.count() == 3 && bands.count() == 8)
    // replay through the real code path: steps 1-2 no-op on their
    // ledgers (the union'd shingle source makes the recompute identical
    // even with the batch texts already landed), step 3 completes
    assert(StreamIncrNearDup.processBatch(b1, bands, texts, verdicts, "w", 1L))
    assert(verdicts.count() == 1, "verdict must not double-land")
    assert(texts.count() == 3, "texts must not double-land")
    assert(bands.count() == 12, "bands must land exactly once")
    val got = verdicts.getFullDf.collect()
      .map(r => (r.getAs[Long]("batch_doc"), r.getAs[Long]("dup_of"))).toSet
    assert(got == Set((7L, 1L)))
  }

  test("seeded three-write crash gauntlet matches a clean serial run") {
    // random crash prefixes of the verdicts -> texts -> bands protocol,
    // with compactions of either durable repo landing inside the crash
    // windows, all replayed through the real processBatch; a CLEAN twin
    // runs the same batches serially and the two must converge to
    // identical verdicts and repo counts (replay determinism + the
    // read-committed ledger guarantees).
    val rng = new scala.util.Random(90210)
    val (bD, tD, vD) = mk("gauntlet-dirty")
    val (bC, tC, vC) = mk("gauntlet-clean")
    val vocab = Array("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima")
    val texts = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    var nextId = 0L
    def mkBatch(): Seq[(Long, String)] = (0 until 4).map { _ =>
      val id = nextId; nextId += 1
      val t =
        if (texts.nonEmpty && rng.nextInt(3) == 0) {
          // near-dup of an earlier doc: one token appended
          val (_, base) = texts(rng.nextInt(texts.size))
          base + " " + vocab(rng.nextInt(vocab.length))
        } else
          (0 until 10).map(_ => vocab(rng.nextInt(vocab.length))).mkString(" ") + s" uid$id"
      texts += ((id, t))
      (id, t)
    }
    for (b <- 0 until 8) {
      val rows = mkBatch()
      val batch = docs(rows: _*)
      assert(StreamIncrNearDup.processBatch(batch, bC, tC, vC, "w", b.toLong))
      rng.nextInt(3) match {
        case 0 => ()
        case 1 => // crash after the verdict write
          val (v, _) = graft.ops.Queries.incrNearVerdictAndBands(bD, batch.select("doc_id", "text"), tD)
          vD.extendExactlyOnce(v, "w-verdicts", b.toLong): Unit
          if (rng.nextBoolean()) tD.compact(targetRecordsPerFile = 3)
        case 2 => // crash after verdict + texts
          val (v, _) = graft.ops.Queries.incrNearVerdictAndBands(bD, batch.select("doc_id", "text"), tD)
          vD.extendExactlyOnce(v, "w-verdicts", b.toLong): Unit
          tD.extendExactlyOnce(batch.select("doc_id", "text"), "w-texts", b.toLong): Unit
          if (rng.nextBoolean()) bD.compact(targetRecordsPerFile = 8)
      }
      assert(StreamIncrNearDup.processBatch(batch, bD, tD, vD, "w", b.toLong))
      assert(!StreamIncrNearDup.processBatch(batch, bD, tD, vD, "w", b.toLong),
        s"committed batch $b must replay as a no-op")
    }
    def verdictSet(r: TableRepo) = r.getFullDf.collect()
      .map(x => (x.getAs[Long]("batch_doc"), x.getAs[Long]("dup_of"))).toSet
    assert(verdictSet(vD) == verdictSet(vC), "dirty and clean runs must emit identical verdicts")
    assert(tD.count() == tC.count() && bD.count() == bC.count(),
      s"repo counts diverged: texts ${tD.count()}/${tC.count()} bands ${bD.count()}/${bC.count()}")
    assert(tD.count() == texts.size, "every ingested doc exactly once")
  }

  test("compactEvery bounds repo file counts mid-stream without changing results") {
    val bands = new TableRepo(scratch("sind-cpt-bands"), spark,
      maxRecordsPerFile = 2, clusterCols = Seq("bh"))
    val texts = new TableRepo(scratch("sind-cpt-texts"), spark,
      maxRecordsPerFile = 2, clusterCols = Seq("doc_id"))
    val verdicts = new TableRepo(scratch("sind-cpt-verdicts"), spark)
    val srcDir = scratch("sind-cpt-src")
    new java.io.File(srcDir).mkdirs()
    val rows = (0 until 4).map { i =>
      Seq((10L * i + 1, A + s" tail$i"), (10L * i + 2, B + s" tail$i"))
    }
    rows.zipWithIndex.foreach { case (rs, i) =>
      val lines = rs.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
      java.nio.file.Files.write(java.nio.file.Paths.get(srcDir, s"f$i.json"),
        lines.mkString("", "\n", "\n").getBytes("UTF-8")): Unit
    }
    // maxFilesPerTrigger=1 -> four micro-batches under AvailableNow;
    // compactEvery=2 fires after batches 1 and 3
    val stream = spark.readStream.schema(docs((0L, "x")).schema)
      .option("maxFilesPerTrigger", 1).json(srcDir)
    val q = StreamIncrNearDup.start(stream, bands, texts, verdicts,
      scratch("sind-cpt-ckpt"), writerId = "c", pruned = true,
      compactEvery = 2, compactTargetRecords = 1000L)
    q.awaitTermination()
    assert(texts.count() == 8 && bands.count() == 32, "compaction must not drop rows")
    // 4 appended micro-batches at 2-row files would leave >= 8 files per
    // repo; the post-batch-3 compaction folds everything into ~1
    assert(texts.nFiles <= 3, s"texts not compacted: ${texts.nFiles} files")
    assert(bands.nFiles <= 3, s"bands not compacted: ${bands.nFiles} files")
    // identical verdicts to an uncompacted twin driven batch-by-batch
    val (b2, t2, v2) = mk("cpt-twin")
    rows.zipWithIndex.foreach { case (rs, i) =>
      StreamIncrNearDup.processBatch(docs(rs: _*), b2, t2, v2, "c", i.toLong, pruned = true)
    }
    def vs(r: TableRepo) = r.getFullDf.collect()
      .map(x => (x.getAs[Long]("batch_doc"), x.getAs[Long]("dup_of"))).toSet
    assert(vs(verdicts) == vs(v2))
  }

  test("end-to-end stream with the pruned band probe, then the batch round drives the same index") {
    val bands = new TableRepo(scratch("sind-e2e-bands"), spark,
      maxRecordsPerFile = 2, clusterCols = Seq("bh"))
    val texts = new TableRepo(scratch("sind-e2e-texts"), spark)
    val verdicts = new TableRepo(scratch("sind-e2e-verdicts"), spark)
    val srcDir = scratch("sind-e2e-src")
    docs((1L, A), (2L, B), (3L, ANear)).coalesce(1).write.json(srcDir)
    val stream = spark.readStream.schema(docs((0L, "x")).schema).json(srcDir)
    val q = StreamIncrNearDup.start(stream, bands, texts, verdicts,
      scratch("sind-e2e-ckpt"), writerId = "s", pruned = true)
    q.awaitTermination()
    val got = verdicts.getFullDf.collect()
      .map(r => (r.getAs[Long]("batch_doc"), r.getAs[Long]("dup_of"))).toSet
    assert(got == Set((3L, 1L)), s"got $got")
    // the BATCH round continues against the stream-built index, using the
    // stream's own text repo as the shingle source
    val more = docs((9L, B + " now"))
    val verdict = graft.ops.Queries.incrDedupRound(bands, texts, more)
    assert(verdict.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((9L, 2L)))
  }
}
