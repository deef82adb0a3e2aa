package graft.repo

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** File-granularity upsert pruning: only files whose footer key range
  * intersects an update key are rewritten; every other file stays
  * byte-identical on disk.
  */
class FilePrunedUpsertSpec extends SparkSuite {
  import spark.implicits._

  private def md5(uri: String): String = {
    // strip the scheme WITHOUT URI-decoding: Hive-escaped dir names
    // contain literal '%' chars a URI round-trip would corrupt
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(uri.stripPrefix("file:")))
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString
  }

  test("only key-range-intersecting files are rewritten; others stay byte-identical") {
    // maxRecordsPerFile forces file rolls even after AQE coalesces the
    // small range shuffle; the within-partition sort keeps rolled files'
    // key ranges disjoint
    val repo = new TableRepo(scratch("pruned-upsert"), spark,
      keyCols = Seq("id"), clusterCols = Seq("id"), maxRecordsPerFile = 1000L)
    repo.extend((0L until 4000L).map(i => (i, s"v$i")).toDF("id", "payload"))
    assert(repo.nFiles >= 3, s"need several range files, got ${repo.nFiles}")
    val before = repo.paths.map(p => p -> md5(p)).toMap

    // two updates in one narrow key range + one brand-new key
    repo.replaceRecordsPruned(
      Seq((10L, "NEW10"), (11L, "NEW11"), (99999L, "NEW99999")).toDF("id", "payload"))

    val after = repo.paths.map(p => p -> md5(p)).toMap
    val untouched = before.keySet.intersect(after.keySet)
    val replaced = before.keySet -- after.keySet
    // ids 10 and 11 live in ONE range file; 99999 is beyond every range
    assert(replaced.size == 1, s"expected exactly one rewritten file, got $replaced")
    assert(untouched.size == before.size - 1)
    untouched.foreach(p => assert(before(p) == after(p), s"file $p changed bytes"))

    // merge contract: one row per key, updates win, new keys appended
    val out = repo.getFullDf
    assert(out.count() == 4001)
    assert(out.groupBy(col("id")).count().filter(col("count") > 1).count() == 0)
    val got = out.filter(col("id").isin(10L, 11L, 99999L, 12L))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(10L -> "NEW10", 11L -> "NEW11", 99999L -> "NEW99999", 12L -> "v12"))
  }

  test("an all-new-key batch appends without touching any existing file") {
    val repo = new TableRepo(scratch("pruned-append"), spark,
      keyCols = Seq("id"), clusterCols = Seq("id"))
    repo.extend((0L until 1000L).map(i => (i, s"v$i")).toDF("id", "payload"))
    val before = repo.paths.map(p => p -> md5(p)).toMap

    repo.replaceRecordsPruned(
      (5000L until 5005L).map(i => (i, s"n$i")).toDF("id", "payload"))

    val after = repo.paths.map(p => p -> md5(p)).toMap
    before.foreach { case (p, h) => assert(after.get(p).contains(h), s"file $p changed") }
    assert(repo.count() == 1005)
  }

  test("pruned merge result matches the unpruned replaceRecords merge") {
    val base = (0L until 2000L).map(i => (i, s"v$i")).toDF("id", "payload")
    val upd = (Seq(1L, 500L, 1500L, 1999L).map(i => (i, s"U$i")) ++
      Seq((7777L, "U7777"))).toDF("id", "payload")
    val pruned = new TableRepo(scratch("pruned-twin-a"), spark,
      keyCols = Seq("id"), clusterCols = Seq("id"))
    val plain = new TableRepo(scratch("pruned-twin-b"), spark, keyCols = Seq("id"))
    pruned.extend(base); plain.extend(base)
    pruned.replaceRecordsPruned(upd); plain.replaceRecords(upd)
    assertSameRows(pruned.getFullDf.orderBy("id"), plain.getFullDf.orderBy("id"))
  }

  test("string keys prune on binary footer stats") {
    val repo = new TableRepo(scratch("pruned-str"), spark,
      keyCols = Seq("k"), clusterCols = Seq("k"), maxRecordsPerFile = 700L)
    repo.extend((0 until 2600).map(i => (f"k$i%04d", i)).toDF("k", "n"))
    assert(repo.nFiles >= 3)
    val before = repo.paths.map(p => p -> md5(p)).toMap
    repo.replaceRecordsPruned(Seq(("k0001", -1), ("k0002", -2)).toDF("k", "n"))
    val after = repo.paths.map(p => p -> md5(p)).toMap
    assert((before.keySet -- after.keySet).size == 1)
    before.keySet.intersect(after.keySet).foreach(p => assert(before(p) == after(p)))
    assert(repo.getFullDf.filter(col("k") === "k0001").head().getInt(1) == -1)
  }

  test("grouped repos without byGroups are rejected (key may live outside the updates' dirs)") {
    val repo = new TableRepo(scratch("pruned-grouped"), spark,
      groupCols = Seq("g"), keyCols = Seq("id"))
    repo.extend(Seq((1L, "a", "x")).toDF("id", "g", "v"))
    intercept[IllegalArgumentException] {
      repo.replaceRecordsPruned(Seq((1L, "a", "y")).toDF("id", "g", "v"))
    }
  }

  test("composite keys prune on the per-column range box intersection") {
    val repo = new TableRepo(scratch("pruned-composite"), spark,
      keyCols = Seq("a", "b"), clusterCols = Seq("a", "b"), maxRecordsPerFile = 800L)
    repo.extend((0L until 3200L).map(i => (i / 40L, i % 40L, s"v$i")).toDF("a", "b", "payload"))
    assert(repo.nFiles >= 3, s"need several range files, got ${repo.nFiles}")
    val before = repo.paths.map(p => p -> md5(p)).toMap

    repo.replaceRecordsPruned(
      Seq((2L, 3L, "NEW"), (900L, 900L, "APPEND")).toDF("a", "b", "payload"))

    val after = repo.paths.map(p => p -> md5(p)).toMap
    val replaced = before.keySet -- after.keySet
    assert(replaced.size == 1, s"expected one rewritten file, got $replaced")
    before.keySet.intersect(after.keySet)
      .foreach(p => assert(before(p) == after(p), s"file $p changed bytes"))
    val out = repo.getFullDf
    assert(out.count() == 3201)
    assert(out.groupBy(col("a"), col("b")).count().filter(col("count") > 1).count() == 0)
    assert(out.filter(col("a") === 2L && col("b") === 3L).head().getString(2) == "NEW")
  }

  test("byGroups composes dir pruning with footer pruning on a grouped repo") {
    val repo = new TableRepo(scratch("pruned-bygroups"), spark,
      groupCols = Seq("g"), keyCols = Seq("id"), clusterCols = Seq("id"),
      maxRecordsPerFile = 500L)
    // one input partition per group -> files within a dir carry disjoint
    // key ranges (sortWithinPartitions + maxRecordsPerFile rolls)
    repo.extend((0L until 3000L).map(i => (i, s"g${i % 3}", s"v$i"))
      .toDF("id", "g", "v").repartition(col("g")))
    val before = repo.paths.map(p => p -> md5(p)).toMap
    assert(before.size >= 6, s"need several files across dirs, got ${before.size}")

    // updates hit group g0 only, two ids in one narrow range
    repo.replaceRecordsPruned(Seq((0L, "g0", "N0"), (3L, "g0", "N3")).toDF("id", "g", "v"),
      byGroups = true)

    val after = repo.paths.map(p => p -> md5(p)).toMap
    val replaced = before.keySet -- after.keySet
    assert(replaced.size == 1, s"expected one rewritten file, got $replaced")
    assert(replaced.head.contains("g=g0"), s"rewritten file outside g0: $replaced")
    before.keySet.intersect(after.keySet)
      .foreach(p => assert(before(p) == after(p), s"file $p changed bytes"))
    val out = repo.getFullDf
    assert(out.count() == 3000)
    assert(out.filter(col("id") === 0L).head().getAs[String]("v") == "N0")
    assert(out.filter(col("id") === 3L).head().getAs[String]("v") == "N3")
  }

  test("hash-bucketed repos prune bucket dirs first, then footers within") {
    val repo = new TableRepo(scratch("pruned-bucketed"), spark,
      keyCols = Seq("id"), hashBucket = Some(HashBucketLayout("id", 8)),
      clusterCols = Seq("id"), maxRecordsPerFile = 400L)
    repo.extend((0L until 2400L).map(i => (i, s"v$i")).toDF("id", "v"))
    val before = repo.paths.map(p => p -> md5(p)).toMap

    repo.replaceRecordsPruned(Seq((42L, "NEW42")).toDF("id", "v"))

    val after = repo.paths.map(p => p -> md5(p)).toMap
    val replaced = before.keySet -- after.keySet
    assert(replaced.nonEmpty && replaced.size < before.size / 2,
      s"expected a small rewrite set, got ${replaced.size} of ${before.size}")
    val bucketDirs = replaced.map(_.split("/").find(_.startsWith("__graft_hash_")).getOrElse(""))
    assert(bucketDirs.size == 1, s"rewrites crossed bucket dirs: $bucketDirs")
    before.keySet.intersect(after.keySet)
      .foreach(p => assert(before(p) == after(p), s"file $p changed bytes"))
    assert(repo.getFullDf.filter(col("id") === 42L).head().getString(1) == "NEW42")
    assert(repo.count() == 2400)
  }

  test("group values Spark Hive-escapes in dir names still prune to the real dir") {
    // ':' and '=' are %-encoded by Spark's partition writer; a raw
    // s"g=$v" path would miss the dir, classify every update key as new,
    // and silently append duplicates
    val repo = new TableRepo(scratch("pruned-escaped"), spark,
      groupCols = Seq("g"), keyCols = Seq("id"), clusterCols = Seq("id"),
      maxRecordsPerFile = 300L)
    repo.extend((0L until 1200L).map(i => (i, if (i % 2 == 0) "a:b" else "c=d", s"v$i"))
      .toDF("id", "g", "v").repartition(col("g")))
    val before = repo.paths.map(p => p -> md5(p)).toMap
    assert(before.keySet.exists(_.contains("%")), s"expected escaped dirs, got ${before.keySet}")

    repo.replaceRecordsPruned(Seq((0L, "a:b", "N0"), (2L, "a:b", "N2")).toDF("id", "g", "v"),
      byGroups = true)

    val out = repo.getFullDf
    assert(out.count() == 1200, "escaped-dir miss would have appended duplicates")
    assert(out.groupBy(col("id"), col("g")).count().filter(col("count") > 1).count() == 0)
    assert(out.filter(col("id") === 0L).head().getAs[String]("v") == "N0")
    // and the pruning still held: files in the other group stayed put
    val after = repo.paths.map(p => p -> md5(p)).toMap
    before.keySet.intersect(after.keySet).filter(_.contains("c%3Dd"))
      .foreach(p => assert(before(p) == after(p), s"file $p in untouched group changed"))
  }

  test("non-renderable layout value types fall back to the partition-level merge") {
    // timestamp dirs are session-formatted; path-based pruning must not
    // trust a hand-rendered value, so the call routes to replaceRecords
    val repo = new TableRepo(scratch("pruned-ts-group"), spark,
      groupCols = Seq("day"), keyCols = Seq("id"))
    val ts0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val ts1 = java.sql.Timestamp.valueOf("2026-01-02 12:30:45")
    repo.extend(Seq((1L, ts0, "x"), (2L, ts1, "y")).toDF("id", "day", "v"))
    repo.replaceRecordsPruned(Seq((1L, ts0, "NEW")).toDF("id", "day", "v"), byGroups = true)
    val out = repo.getFullDf
    assert(out.count() == 2)
    assert(out.filter(col("id") === 1L).head().getAs[String]("v") == "NEW")
  }

  test("NaN update keys disable pruning but keep the one-row-per-key contract") {
    val repo = new TableRepo(scratch("pruned-nan"), spark,
      keyCols = Seq("k"), clusterCols = Seq("k"))
    repo.extend(Seq((1.0, "one"), (2.0, "two"), (Double.NaN, "oldnan")).toDF("k", "v"))
    repo.replaceRecordsPruned(Seq((Double.NaN, "newnan")).toDF("k", "v"))
    val out = repo.getFullDf
    assert(out.count() == 3, "NaN update must replace the existing NaN row, not duplicate it")
    val nanRows = out.filter(isnan(col("k"))).collect()
    assert(nanRows.length == 1 && nanRows.head.getString(1) == "newnan")
  }

  test("a crash between append and deletes is invisible to readers and repaired by the next write") {
    val root = scratch("pruned-crash")
    val repo = new TableRepo(root, spark, keyCols = Seq("id"), clusterCols = Seq("id"),
      maxRecordsPerFile = 500L)
    repo.extend((0L until 1500L).map(i => (i, s"v$i")).toDF("id", "payload"))
    val victim = repo.paths.head
    // simulate the crash window: replacement rows for the victim's keys
    // are committed (here: the file's own rows re-appended verbatim), the
    // manifest names the victim, but the delete never ran
    val rows = spark.read.parquet(victim).localCheckpoint(true)
    rows.write.mode("append").parquet(s"$root/data")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "_graft_pending_delete"),
      victim.getBytes("UTF-8"))
    // readers exclude the manifest file: no duplicate keys
    assert(repo.getFullDf.count() == 1500)
    assert(repo.getFullDf.groupBy(col("id")).count().filter(col("count") > 1).count() == 0)
    // the next mutating op replays the delete and clears the manifest
    repo.extend(Seq((9999L, "late")).toDF("id", "payload"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(root, "_graft_pending_delete")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(new java.net.URI(victim))), "victim file must be deleted on replay")
    assert(repo.getFullDf.count() == 1501)
  }
}
