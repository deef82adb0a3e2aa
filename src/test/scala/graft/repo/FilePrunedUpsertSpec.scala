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
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(new java.net.URI(uri)))
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

  test("grouped repos are rejected (they prune via replaceRecords)") {
    val repo = new TableRepo(scratch("pruned-grouped"), spark,
      groupCols = Seq("g"), keyCols = Seq("id"))
    repo.extend(Seq((1L, "a", "x")).toDF("id", "g", "v"))
    intercept[IllegalArgumentException] {
      repo.replaceRecordsPruned(Seq((1L, "a", "y")).toDF("id", "g", "v"))
    }
  }
}
