package graft.repo

import org.apache.hadoop.fs.Path

import graft.SparkSuite

/** Cross-process ownership of the footer-rewrite marker. A marker is
  * only repairable when it is provably a crash leftover: our own process
  * token (a live embed in this JVM would hold the write monitor), or a
  * foreign token whose heartbeat mtime went stale. A FRESH foreign
  * marker is a LIVE embed in another process — "repairing" it would race
  * that embed's stage-aside rename pair and then delete the marker out
  * from under it, silently losing the rows of any file it later crashes
  * on. Reads must leave it alone; mutating ops must refuse loudly (a
  * full rewrite planned while rows hide under `.kvbak` would lose them).
  */
class FooterMarkerSpec extends SparkSuite {
  import spark.implicits._

  private def fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** A repo with one data file staged aside under its `.kvbak` name and
    * the marker up under `token` — the mid-embed (or crashed-embed)
    * on-disk shape as seen from a process that is NOT the embedder.
    */
  private def midEmbedState(name: String, token: String): (TableRepo, Path, Path, Path) = {
    val repo = new TableRepo(scratch(name), spark, maxRecordsPerFile = 40)
    repo.extend((1L to 100L).map(i => (i, s"v$i")).toDF("id", "payload"))
    val f = new Path(repo.paths.head)
    val bak = new Path(f.getParent, s".${f.getName}.kvbak")
    assert(fs.rename(f, bak))
    val marker = new Path(s"${repo.root}/_graft_footer_rewrites")
    val out = fs.create(marker, true)
    try out.write(token.getBytes("UTF-8"))
    finally out.close()
    (repo, f, bak, marker)
  }

  private def ageMarker(marker: Path, byMs: Long): Unit = {
    val local = java.nio.file.Paths.get(fs.makeQualified(marker).toUri.getPath)
    java.nio.file.Files.setLastModifiedTime(local,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - byMs))
  }

  test("a fresh FOREIGN marker: reads proceed un-repaired, the in-flight state survives") {
    val (repo, f, bak, marker) = midEmbedState("fm-fresh", "foreign-jvm-token")
    // the staged-aside file's rows are invisible for the moment — that is
    // the live embed's documented per-file window, not silent loss
    assert(repo.count() < 100, "mid-embed reads see the un-staged remainder")
    assert(fs.exists(bak) && !fs.exists(f),
      "a read must NOT 'restore' a live foreign embed's in-flight backup")
    assert(fs.exists(marker), "a read must NOT clear a live foreign embed's marker")
  }

  test("a fresh FOREIGN marker fails mutating ops loudly (a rewrite would lose staged rows)") {
    val (repo, _, _, _) = midEmbedState("fm-strict", "foreign-jvm-token")
    val e = intercept[java.util.ConcurrentModificationException] {
      repo.extend(Seq((1000L, "extra")).toDF("id", "payload"))
    }
    assert(e.getMessage.contains("heartbeat"))
    intercept[java.util.ConcurrentModificationException] { repo.compact(1000L) }
    // embedMetadata itself refuses too: two embeds racing each other's
    // swaps is the worst case of all
    repo.setMetadata(Map("k" -> "v"))
    intercept[java.util.ConcurrentModificationException] { repo.embedMetadata() }
  }

  test("a STALE foreign marker is a crash leftover: the next read repairs and clears it") {
    val (repo, f, bak, marker) = midEmbedState("fm-stale", "foreign-jvm-token")
    ageMarker(marker, TableRepo.FooterMarkerStaleMs + 10000)
    assert(repo.count() == 100, "the stale leftover's hidden rows come back")
    assert(fs.exists(f) && !fs.exists(bak))
    assert(!fs.exists(marker))
  }

  test("a STALE foreign marker unblocks mutating ops (repair, then proceed)") {
    val (repo, f, bak, marker) = midEmbedState("fm-stale-mut", "foreign-jvm-token")
    ageMarker(marker, TableRepo.FooterMarkerStaleMs + 10000)
    repo.extend(Seq((1000L, "extra")).toDF("id", "payload"))
    assert(repo.count() == 101)
    assert(fs.exists(f) && !fs.exists(bak) && !fs.exists(marker))
  }

  test("an OWN-token marker is repaired immediately (this JVM's embed threw; no live owner)") {
    val (repo, f, bak, marker) = midEmbedState("fm-own", TableRepo.ProcessToken)
    assert(repo.count() == 100)
    assert(fs.exists(f) && !fs.exists(bak) && !fs.exists(marker))
  }

  test("a live embed's heartbeat keeps the marker fresh across files") {
    // drive a real embed over several files and confirm the marker's
    // mtime advances (the liveness signal foreign processes key on),
    // then that a clean finish clears it
    val repo = new TableRepo(scratch("fm-heartbeat"), spark, maxRecordsPerFile = 20)
    repo.extend((1L to 200L).map(i => (i, s"v$i")).toDF("id", "payload"))
    assert(repo.paths.size >= 5)
    repo.setMetadata(Map("owner" -> "graft"))
    repo.embedMetadata()
    assert(!fs.exists(new Path(s"${repo.root}/_graft_footer_rewrites")))
    assert(repo.count() == 200)
  }
}
