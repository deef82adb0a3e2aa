package graft.repo

import graft.SparkSuite

/** Configurable snapshot retention: `snapshotRetention` grace versions
  * survive each full rewrite's GC (widening [[TableRepo.getDfAt]]'s
  * time-travel reach), and [[TableRepo.vacuum]] trims the history early
  * without waiting for the next rewrite.
  */
class SnapshotRetentionSpec extends SparkSuite {
  import spark.implicits._

  private def dirs(root: String): Set[String] = {
    val f = new java.io.File(root)
    if (!f.exists()) Set.empty
    else f.listFiles().filter(_.isDirectory).map(_.getName).toSet
  }

  test("retention > 1 keeps a deeper grace chain and time travel reaches it") {
    val root = scratch("ret-deep")
    val repo = new TableRepo(root, spark, snapshotRetention = 2)
    repo.extend(Seq((1L, "a")).toDF("id", "v"))
    repo.replaceAll(Seq((1L, "b")).toDF("id", "v")) // v0
    repo.replaceAll(Seq((1L, "c")).toDF("id", "v")) // v1
    // two graces allowed: legacy `data` and v0 both survive
    assert(Set("data", "data-v0", "data-v1").subsetOf(dirs(root)))
    repo.replaceAll(Seq((1L, "d")).toDF("id", "v")) // v2: legacy falls off
    assert(!dirs(root).contains("data"))
    assert(dirs(root).contains("data-v0") && dirs(root).contains("data-v1"))
    // time travel reaches BOTH graces — twice the default reach
    assert(repo.getDfAt(0).head().getString(1) == "b")
    assert(repo.getDfAt(1).head().getString(1) == "c")
    assert(repo.getFullDf.head().getString(1) == "d")
  }

  test("vacuum trims early; the current version is never deleted") {
    val root = scratch("ret-vacuum")
    val repo = new TableRepo(root, spark, snapshotRetention = 3)
    repo.extend(Seq((1L, "a")).toDF("id", "v"))
    (0 until 3).foreach(i => repo.replaceAll(Seq((1L, s"r$i")).toDF("id", "v")))
    assert(repo.snapshotVersions == Seq(0, 1, 2))
    assert(dirs(root).contains("data")) // retention 3: legacy still a grace
    repo.vacuum(keepLast = 2) // keep v1 (grace) + v2 (current)
    assert(!dirs(root).contains("data") && !dirs(root).contains("data-v0"))
    assert(dirs(root).contains("data-v1") && dirs(root).contains("data-v2"))
    assert(repo.getDfAt(1).head().getString(1) == "r1")
    intercept[IllegalArgumentException](repo.getDfAt(0))
    repo.vacuum(keepLast = 1) // only the current survives
    assert(!dirs(root).contains("data-v1") && dirs(root).contains("data-v2"))
    assert(repo.getFullDf.head().getString(1) == "r2")
    // vacuum on an append-only (unversioned) repo is a no-op on the data
    val flat = new TableRepo(scratch("ret-flat"), spark)
    flat.extend(Seq((9L, "z")).toDF("id", "v"))
    flat.vacuum(keepLast = 1)
    assert(flat.count() == 1)
  }

  test("default retention stays the single grace version") {
    val root = scratch("ret-default")
    val repo = new TableRepo(root, spark)
    repo.extend(Seq((1L, "a")).toDF("id", "v"))
    repo.replaceAll(Seq((1L, "b")).toDF("id", "v"))
    repo.replaceAll(Seq((1L, "c")).toDF("id", "v"))
    assert(!dirs(root).contains("data"))
    assert(dirs(root).contains("data-v0") && dirs(root).contains("data-v1"))
  }
}
