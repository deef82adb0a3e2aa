package graft.repo

import graft.SparkSuite

/** Snapshot-isolated full rewrites: every replaceAll/compact lands in a
  * fresh committed version dir, the superseded version survives as the
  * grace version for in-flight readers, and older versions are GC'd.
  */
class SnapshotVersionSpec extends SparkSuite {
  import spark.implicits._

  private def dirs(root: String): Set[String] = {
    val f = new java.io.File(root)
    if (!f.exists()) Set.empty
    else f.listFiles().filter(_.isDirectory).map(_.getName).toSet
  }

  test("full rewrites cycle version dirs with one grace version") {
    val root = scratch("snap-cycle")
    val repo = new TableRepo(root, spark, keyCols = Seq("id"))
    repo.extend(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    assert(dirs(root).contains("data")) // append-only layout: legacy dir

    repo.replaceAll(Seq((1L, "x")).toDF("id", "v"))
    // first rewrite: v0 committed, legacy kept as the grace version
    assert(dirs(root).contains("data-v0") && dirs(root).contains("data"))
    assert(repo.count() == 1 && repo.getFullDf.head().getString(1) == "x")

    repo.replaceAll(Seq((1L, "y"), (2L, "z")).toDF("id", "v"))
    // second rewrite: v1 committed, legacy GC'd, v0 is the grace version
    assert(dirs(root).contains("data-v1") && dirs(root).contains("data-v0"))
    assert(!dirs(root).contains("data"))
    assert(repo.count() == 2)

    repo.compact(1000)
    // third rewrite: v2 committed, v0 GC'd, v1 grace
    assert(dirs(root).contains("data-v2") && dirs(root).contains("data-v1"))
    assert(!dirs(root).contains("data-v0"))
    assert(repo.count() == 2)
  }

  test("a reader planned before a compaction still scans intact files") {
    val repo = new TableRepo(scratch("snap-reader"), spark, keyCols = Seq("id"))
    repo.extend((0L until 500L).map(i => (i, s"v$i")).toDF("id", "v"))
    val planned = repo.getFullDf // file index resolved against the current version
    repo.compact(100)           // swaps to a new version dir
    // the grace version keeps the old files on disk: the pre-swap plan
    // completes instead of failing on yanked paths
    assert(planned.count() == 500)
    assert(repo.count() == 500)
  }

  test("an uncommitted version dir (failed job leftover) is invisible") {
    val root = scratch("snap-uncommitted")
    val repo = new TableRepo(root, spark, keyCols = Seq("id"))
    repo.extend(Seq((1L, "a")).toDF("id", "v"))
    repo.replaceAll(Seq((1L, "b")).toDF("id", "v")) // -> data-v0
    // simulate a failed rewrite: dir exists, no _GRAFT_COMMIT marker
    new java.io.File(s"$root/data-v1/ignored").mkdirs()
    assert(repo.count() == 1 && repo.getFullDf.head().getString(1) == "b")
    // and the next successful rewrite claims v1 for itself
    repo.replaceAll(Seq((1L, "c")).toDF("id", "v"))
    assert(repo.getFullDf.head().getString(1) == "c")
  }

  test("time travel reads the grace snapshot; GC bounds the history") {
    val root = scratch("snap-travel")
    val repo = new TableRepo(root, spark, keyCols = Seq("id"))
    repo.extend(Seq((1L, "a")).toDF("id", "v"))
    assert(repo.snapshotVersions.isEmpty) // legacy append-only dir: no commits
    assertThrows[IllegalArgumentException](repo.getDfAt(0))

    repo.replaceAll(Seq((1L, "b"), (2L, "b")).toDF("id", "v")) // -> v0
    repo.replaceAll(Seq((1L, "c")).toDF("id", "v"))            // -> v1, grace v0
    assert(repo.snapshotVersions == Seq(0, 1))
    assert(repo.getDfAt(0).orderBy("id").collect().map(_.getString(1)).toSeq == Seq("b", "b"))
    assert(repo.getDfAt(1).collect().map(_.getString(1)).toSeq == Seq("c"))

    repo.replaceAll(Seq((1L, "d")).toDF("id", "v")) // -> v2, v0 GC'd
    assert(repo.snapshotVersions == Seq(1, 2))
    assertThrows[IllegalArgumentException](repo.getDfAt(0))
    assert(repo.getDfAt(1).collect().map(_.getString(1)).toSeq == Seq("c"))
  }

  test("time travel across an evolution backfill keeps the per-version schema " +
      "(diff_cols.py:15-30)") {
    val repo = new TableRepo(scratch("snap-evo"), spark,
      keyCols = Seq("id"), allowSchemaExtension = true)
    repo.extend(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    repo.compact(targetRecordsPerFile = 10) // -> v0, sealed pre-evolution
    val pre = repo.snapshotVersions.last
    // evolution: the new column triggers a widening backfill rewrite -> v1
    repo.extend(Seq((3L, "c", 9L)).toDF("id", "v", "w"))
    assert(repo.getFullDf.columns.toSeq == Seq("id", "v", "w"))
    assert(repo.snapshotVersions.size == 2)
    // the pre-evolution snapshot genuinely LACKS the widened column —
    // harmonizing history to today's schema would fake a null column
    // into data that never had it
    assert(repo.getDfAt(pre).columns.toSeq == Seq("id", "v"),
      s"pre-evolution snapshot must not show the later column")
    assert(repo.getDfAt(pre).count() == 2)
    // the post-evolution (current) version carries it, null-backfilled
    val cur = repo.snapshotVersions.last
    assert(repo.getDfAt(cur).columns.toSeq == Seq("id", "v", "w"))
    assert(repo.getDfAt(cur).where($"w".isNull).count() == 2)
  }

  test("snapshotDiff emits only the changed subset, null-safely") {
    val repo = new TableRepo(scratch("snap-diff"), spark, keyCols = Seq("id"))
    repo.extend(Seq((1L, "a")).toDF("id", "v"))
    assertThrows[IllegalArgumentException] { // unkeyed repo contract
      new TableRepo(scratch("snap-diff2"), spark).snapshotDiff(0, 1)
    }
    // v0: unchanged null, changed null->value, value->null, value, delete
    repo.replaceAll(Seq(
      (1L, null), (2L, null), (3L, "x"), (4L, "x"), (5L, "gone")
    ).toDF("id", "v"))
    repo.replaceAll(Seq(
      (1L, null), (2L, "now"), (3L, null), (4L, "x"), (6L, "new")
    ).toDF("id", "v"))
    val d = repo.snapshotDiff(repo.snapshotVersions.head, repo.snapshotVersions.last)
      .orderBy("id").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // ids 1 (null==null) and 4 (x==x) are unchanged and must NOT appear
    assert(d == Seq(("update", 2L), ("update", 3L), ("delete", 5L), ("insert", 6L)))
  }

  test("purge removes every version dir") {
    val root = scratch("snap-purge")
    val repo = new TableRepo(root, spark, keyCols = Seq("id"))
    repo.extend(Seq((1L, "a")).toDF("id", "v"))
    repo.replaceAll(Seq((1L, "b")).toDF("id", "v"))
    repo.replaceAll(Seq((1L, "c")).toDF("id", "v"))
    repo.purge()
    assert(dirs(root).forall(d => !d.startsWith("data")))
    assert(!repo.exists)
  }
}
