package graft.streaming

import graft.SparkSuite
import graft.repo.{HashBucketLayout, TableRepo}

/** Streaming micro-batch ingestion into a repo: a file-source stream drains
  * into the same schema-harmonized append path as batch writes.
  */
class RepoSinkSpec extends SparkSuite {
  import spark.implicits._

  test("windowed streaming aggregation over events matches the batch result") {
    import org.apache.spark.sql.functions._
    // the file stream source needs a directory, not a single file
    val src = scratch("stream-events")
    new java.io.File(src).mkdirs()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$src/events.parquet"))
    val batch = spark.read.parquet(s"$src/events.parquet")
      .withColumn("ts2", expr("cast(ts as timestamp)"))
    val expected = batch
      .groupBy(date_trunc("hour", col("ts2")).as("h"), col("event_type"))
      .count().collect().map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    val stream = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .parquet(src)
      .withColumn("ts2", expr("cast(ts as timestamp)"))
      .withWatermark("ts2", "1 hour")
      .groupBy(window(col("ts2"), "1 hour"), col("event_type"))
      .count()
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("winagg").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("winagg")
      .select(col("window.start").as("h"), col("event_type"), col("count"))
      .collect().map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  test("replacing sink upserts micro-batches into a hash-bucketed repo") {
    val repo = new TableRepo(scratch("stream-b-repo"), spark, keyCols = Seq("id"),
      hashBucket = Some(HashBucketLayout("id", 4)))
    val src = scratch("stream-b-src")
    val ckpt = scratch("stream-b-ckpt")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").write.parquet(src)
    def stream = spark.readStream.schema("id LONG, v STRING").parquet(src)
    val q = RepoSink.start(stream, repo, ckpt, replace = true)
    q.processAllAvailable(); q.stop()
    assert(repo.count() == 3)
    // a later micro-batch updates one key: bucket-scoped upsert, no dup
    Seq((2L, "B2")).toDF("id", "v").write.mode("append").parquet(src)
    val q2 = RepoSink.start(stream, repo, ckpt, replace = true)
    q2.processAllAvailable(); q2.stop()
    assert(repo.count() == 3)
    assert(repo.getFullDf.filter($"id" === 2L).select("v").as[String].head() == "B2")
  }

  test("JSONL drop dir streams into a pinned-schema repo: exactly-once across " +
      "restart, schema drift harmonized, equal to the batch ingest") {
    import org.apache.spark.sql.types._
    val drop = scratch("landing-drop")
    new java.io.File(drop).mkdirs()
    def dropFile(name: String, lines: String*): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(drop, name),
        lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    val pinned = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType), StructField("w", LongType)))
    val repo = new TableRepo(scratch("landing-repo"), spark, fixedSchema = Some(pinned))
    val ckpt = scratch("landing-ckpt")
    def stream = spark.readStream.schema(pinned)
      .option("multiLine", "false").json(drop)

    dropFile("d1.jsonl", """{"id":1,"v":"a","w":10}""", """{"id":2,"v":"b","w":20}""")
    val q1 = RepoSink.start(stream, repo, ckpt)
    q1.processAllAvailable(); q1.stop()
    assert(repo.count() == 2)

    // mid-stream schema drift: d2 misses `w` (null-backfilled), d3 carries
    // an unknown `extra` (dropped by the pinned read schema) — the same
    // harmonization contract as the batch path
    dropFile("d2.jsonl", """{"id":3,"v":"c"}""")
    dropFile("d3.jsonl", """{"id":4,"v":"d","w":40,"extra":"zzz"}""")
    // RESTART from the same checkpoint: only the new files may land —
    // re-landing d1 would double ids 1 and 2
    val q2 = RepoSink.start(stream, repo, ckpt)
    q2.processAllAvailable(); q2.stop()

    val got = repo.getFullDf
    assert(got.count() == 4, "restart must not re-land already-committed files")
    assert(got.groupBy($"id").count().filter($"count" > 1).count() == 0)
    assert(got.filter($"id" === 3L).select("w").head().isNullAt(0))
    assert(got.columns.toSeq == Seq("id", "v", "w"))
    // the streamed landing equals the batch FileSources ingest of the
    // same drop files into a twin repo
    val twin = new TableRepo(scratch("landing-twin"), spark, fixedSchema = Some(pinned))
    graft.sources.FileSources.ingest(twin,
      graft.sources.FileSources.jsonl(spark, drop, Some(pinned)))
    assertSameRows(got.orderBy("id"), twin.getFullDf.orderBy("id"))
  }

  test("foreachBatch sink appends micro-batches into the repo") {
    val srcDir = scratch("stream-src")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(srcDir)
    val repo = new TableRepo(scratch("stream-repo"), spark)
    val stream = spark.readStream
      .schema("id LONG, v STRING")
      .parquet(srcDir)
    val q = RepoSink.start(stream, repo, scratch("stream-ckpt"))
    q.processAllAvailable()
    q.stop()
    assert(repo.count() == 2)
    assert(repo.getFullDf.columns.toSeq == Seq("id", "v"))
  }

  test("compactEvery folds per-batch small files; rows and replays unaffected") {
    val repo = new TableRepo(scratch("cpt-repo"), spark, maxRecordsPerFile = 2)
    val drop = scratch("cpt-src")
    new java.io.File(drop).mkdirs()
    (0 until 4).foreach { i =>
      val lines = (0 until 6).map(j => s"""{"id":${i * 10 + j},"v":"r$i"}""")
      java.nio.file.Files.write(java.nio.file.Paths.get(drop, s"f$i.jsonl"),
        lines.mkString("", "\n", "\n").getBytes("UTF-8")): Unit
    }
    def stream = spark.readStream.schema("id LONG, v STRING")
      .option("maxFilesPerTrigger", 1).json(drop)
    val ckpt = scratch("cpt-ckpt")
    val q = RepoSink.start(stream, repo, ckpt, exactlyOnce = true,
      compactEvery = 2, compactTargetRecords = 100L)
    q.processAllAvailable(); q.stop()
    assert(repo.count() == 24, "compaction must not drop or duplicate rows")
    // 4 batches at 2-row files would leave >= 12 files; the batch-3
    // compaction folds everything into ~1
    assert(repo.nFiles <= 3, s"not compacted: ${repo.nFiles} files")
    // restart on the same checkpoint: ledger makes the replay a no-op
    val q2 = RepoSink.start(stream, repo, ckpt, exactlyOnce = true,
      compactEvery = 2, compactTargetRecords = 100L)
    q2.processAllAvailable(); q2.stop()
    assert(repo.count() == 24)
  }

  test("two exactly-once sinks with same-leaf checkpoint dirs do not share a ledger") {
    // the default writerId hashes the FULL normalized checkpoint path;
    // a leaf-name-only identity would make stream B's batch 0 look like
    // a replay of stream A's batch 0 and silently drop it
    val repo = new TableRepo(scratch("samelleaf-repo"), spark)
    val srcA = scratch("samelleaf-a-src"); val srcB = scratch("samelleaf-b-src")
    Seq((1L, "a")).toDF("id", "v").write.parquet(srcA)
    Seq((2L, "b")).toDF("id", "v").write.parquet(srcB)
    val ckA = scratch("samelleaf-a") + "/ckpt"
    val ckB = scratch("samelleaf-b") + "/ckpt"
    def run(src: String, ck: String): Unit = {
      val st = spark.readStream.schema("id LONG, v STRING").parquet(src)
      val q = RepoSink.start(st, repo, ck, exactlyOnce = true)
      q.processAllAvailable(); q.stop()
    }
    run(srcA, ckA)
    run(srcB, ckB)
    assert(repo.count() == 2,
      "stream B's batch was dropped as a replay of stream A's (shared ledger)")
  }

  test("default writerId resumes an existing bare-leaf ledger (migration)") {
    // a repo written by a pre-leaf+hash stream carries _graft_ledger/<leaf>;
    // resuming under a NEW identity would replay the crash-window batch the
    // ledger guards (committed to the old ledger, absent from the streaming
    // checkpoint) and land it twice — so the bare-leaf identity is kept
    val repo = new TableRepo(scratch("widmig-repo"), spark)
    val ck = scratch("widmig") + "/ckpt"
    val leaf = "ckpt"
    // fresh repo (no ledger): collision-safe leaf+hash default
    val fresh = RepoSink.resolveWriterId(repo, ck, "")
    assert(fresh.startsWith(leaf + "-") && fresh.length == leaf.length + 9, fresh)
    // simulate the pre-migration stream: batch 0 committed under bare leaf
    repo.extendExactlyOnce(Seq((1L, "a")).toDF("id", "v"), leaf, 0L)
    assert(repo.hasLedger(leaf))
    // same checkpoint dir now resolves to the EXISTING bare-leaf identity…
    assert(RepoSink.resolveWriterId(repo, ck, "") == leaf)
    // …so the crash-window replay of batch 0 is a no-op, not a double-land
    val replayed = repo.extendExactlyOnce(
      Seq((1L, "a")).toDF("id", "v"), RepoSink.resolveWriterId(repo, ck, ""), 0L)
    assert(!replayed && repo.count() == 1)
    // explicit writerId always wins; non-exactly-once paths keep leaf+hash
    assert(RepoSink.resolveWriterId(repo, ck, "mine") == "mine")
    assert(RepoSink.resolveWriterId(repo, ck, "", exactlyOnce = false) == fresh)
  }
}
