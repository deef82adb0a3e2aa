package graft.repo

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The guarded rewrite's FORMER residual window — the instants between
  * its pre-marker re-list and its commit marker — driven
  * deterministically through the gap hook: a file landing exactly there
  * must be caught by the post-commit verify (the marker is revoked, the
  * attempt retries, the late rows are carried into the version that
  * finally commits). Before this closure a file landing in that ~ms gap
  * was silently absent from the committed version forever.
  */
class GuardedRewriteSpec extends SparkSuite {
  import spark.implicits._

  private def fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Write one extra schema-compatible parquet file OUTSIDE the repo and
    * return it, ready to be renamed into a data dir — the on-disk shape
    * of a concurrent process's append landing.
    */
  private def strayFile(tag: String): Path = {
    val dir = scratch(s"gap-stray-$tag")
    (9000L to 9009L).map(i => (i, s"late$i")).toDF("id", "payload")
      .coalesce(1).write.parquet(dir)
    new Path(new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath)
  }

  test("a file landing between the re-list and the marker is caught by the post-commit verify") {
    val repo = new TableRepo(scratch("gap-compact"), spark, maxRecordsPerFile = 25)
    repo.extend((1L to 100L).map(i => (i, s"v$i")).toDF("id", "payload"))
    val dataDir = new Path(repo.paths.head).getParent
    val stray = strayFile("compact")
    val pre = TableRepo.guardedAbortsPostCommit.get()
    TableRepo.testGapHook = Some(() => {
      // the simulated appender: its file hits the source dir after the
      // pre-marker re-list passed, before the marker lands — the exact
      // interleaving that silently lost rows before the closure
      assert(fs.rename(stray, new Path(dataDir, stray.getName)))
    })
    repo.compact(1000L)
    assert(TableRepo.testGapHook.isEmpty, "the hook must have fired")
    assert(TableRepo.guardedAbortsPostCommit.get() == pre + 1,
      "the post-marker verify must have revoked the first attempt")
    assert(repo.count() == 110, "the gap-landed rows are in the finally-committed version")
    assert(repo.getFullDf.filter(col("id") >= 9000L).count() == 10)
    // the committed version publishes WHAT it carried: the stray file must
    // be in its manifest — this is the proof a superseded appender reads
    val cur = new Path(repo.paths.head).getParent
    val in = fs.open(new Path(cur, "_GRAFT_CARRIED"))
    val carried = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    assert(carried.contains(stray.getName),
      "the finally-committed rewrite's carried manifest must name the gap-landed file")
  }

  test("a superseded append proves itself carried (guarded compact) or lost (unguarded replace)") {
    // the decision a suspended appender's post-job check faces once its
    // target version was superseded mid-check: a guarded rewrite that
    // snapshotted the appender's files CARRIED them (reporting "lost"
    // would make the documented blind retry duplicate the rows); an
    // unguarded replaceAll deliberately dropped them (the loud typed
    // failure is correct and retry is safe)
    val repo = new TableRepo(scratch("append-visibility"), spark, maxRecordsPerFile = 25)
    repo.extend((1L to 60L).map(i => (i, s"v$i")).toDF("id", "payload"))
    val appendTarget = new Path(repo.paths.head).getParent.toString
    repo.compact(1000L) // guarded: snapshots + carries the appended files
    // the suspended appender wakes AFTER the commit: must report success
    repo.verifyAppendVisibility(appendTarget, "append")
    val compacted = new Path(repo.paths.head).getParent.toString
    assert(compacted != appendTarget)
    repo.replaceAll((1L to 10L).map(i => (i, "r")).toDF("id", "payload"))
    // the same wake-up against an UNGUARDED replace: rows are gone — loud
    intercept[java.util.ConcurrentModificationException] {
      repo.verifyAppendVisibility(compacted, "append")
    }
  }

  test("the EXACT verdict: carried ⇒ success; a second appender's foreign files cannot mask it") {
    // the round-17 residual in miniature, without child JVMs: batch A is
    // carried by a guarded compact, then a foreign file (appender B)
    // lands in the superseded dir. A's exact verdict must still say
    // SUCCESS (the old whole-dir proof failed here: B's file made the
    // dir listing a non-subset of the carried manifest).
    val repo = new TableRepo(scratch("exact-carried"), spark, maxRecordsPerFile = 25)
    repo.extend((1L to 60L).map(i => (i, s"v$i")).toDF("id", "payload"))
    val target = new Path(repo.paths.head).getParent
    val tQual = fs.makeQualified(target).toString
    val aRels = repo.paths.map(_.stripPrefix(tQual + "/")) // batch A = everything on disk
    repo.compact(1000L) // guarded: carries A
    // appender B's file lands in the now-superseded dir (post-verify)
    val strayB = strayFile("maskerB")
    assert(fs.rename(strayB, new Path(target, strayB.getName)))
    repo.verifyAppendVisibilityExact(target.toString, "append", aRels) // must NOT throw
  }

  test("the EXACT verdict withdraws an uncarried batch before failing: the typed retry can never duplicate") {
    val repo = new TableRepo(scratch("exact-withdrawn"), spark)
    repo.extend((1L to 30L).map(i => (i, s"v$i")).toDF("id", "payload"))
    val target = new Path(repo.paths.head).getParent
    repo.replaceAll((1L to 5L).map(i => (i, "r")).toDF("id", "payload")) // unguarded: carries nothing
    // the suspended appender's batch: a file still sitting in the grace dir
    val stray = strayFile("uncarried")
    val landed = new Path(target, stray.getName)
    assert(fs.rename(stray, landed))
    intercept[java.util.ConcurrentModificationException] {
      repo.verifyAppendVisibilityExact(target.toString, "append", Seq(stray.getName))
    }
    assert(!fs.exists(landed),
      "the failing verdict must WITHDRAW the batch's files from the superseded dir — " +
        "a late revoke can then never resurrect them behind the retry")
  }

  test("the EXACT verdict walks the carry CHAIN: a batch carried once then superseded again still reports success") {
    // the double-cycle shape: the appender suspends, rewrite R1 carries
    // its batch, rewrite R2 supersedes R1 (R2's manifest names R1's
    // files, not the batch's). A single-manifest check would misreport
    // "not carried, retry-safe" and the retry would duplicate — the
    // chain walk follows R2's manifest back to R1's and proves the carry.
    val repo = new TableRepo(scratch("exact-chain"), spark, maxRecordsPerFile = 25)
    repo.extend((1L to 60L).map(i => (i, s"v$i")).toDF("id", "payload"))
    val target = new Path(repo.paths.head).getParent
    val tQual = fs.makeQualified(target).toString
    val rels = repo.paths.map(_.stripPrefix(tQual + "/"))
    repo.compact(1000L) // R1: carries the batch
    repo.compact(500L)  // R2: carries R1's content (manifest names R1's files)
    repo.verifyAppendVisibilityExact(target.toString, "append", rels) // must NOT throw
  }

  test("an unreadable carry chain fails LOUDLY without the retry contract (never a retry-safe lie)") {
    // three rewrite cycles: the dir R1 (which carried the batch) is GC'd
    // past the grace retention, so the chain is unprovable — the verdict
    // must fail WITHOUT claiming "no rows are visible; retry" (the rows
    // ARE in the current content via the R1→R2→R3 carry chain)
    val repo = new TableRepo(scratch("exact-chain-broken"), spark, maxRecordsPerFile = 25)
    repo.extend((1L to 60L).map(i => (i, s"v$i")).toDF("id", "payload"))
    val target = new Path(repo.paths.head).getParent
    val tQual = fs.makeQualified(target).toString
    val rels = repo.paths.map(_.stripPrefix(tQual + "/"))
    repo.compact(1000L) // R1 carries
    repo.compact(500L)  // R2; R1 becomes grace
    repo.compact(800L)  // R3; R1 GC'd — chain broken
    val e = intercept[java.util.ConcurrentModificationException] {
      repo.verifyAppendVisibilityExact(target.toString, "append", rels)
    }
    assert(e.getMessage.contains("PARTIAL or unprovable"),
      s"an unprovable chain must not carry the retry contract: ${e.getMessage}")
    assert(!e.getMessage.contains("retry against the new version"))
  }

  test("the schema-evolution backfill rewrite gets the same gap closure") {
    val repo = new TableRepo(scratch("gap-evolve"), spark, allowSchemaExtension = true)
    repo.extend((1L to 50L).map(i => (i, s"v$i")).toDF("id", "payload"))
    val dataDir = new Path(repo.paths.head).getParent
    val stray = strayFile("evolve")
    val pre = TableRepo.guardedAbortsPostCommit.get()
    TableRepo.testGapHook = Some(() =>
      assert(fs.rename(stray, new Path(dataDir, stray.getName))): Unit)
    // widening extend triggers the guarded backfill rewrite of history
    repo.extend(Seq((200L, "new", 1.5)).toDF("id", "payload", "score"))
    assert(TableRepo.guardedAbortsPostCommit.get() == pre + 1)
    assert(repo.count() == 61, "50 originals + 10 gap-landed + 1 widened row")
    assert(repo.getFullDf.filter(col("id") >= 9000L).count() == 10,
      "late rows survive the backfill, null-backfilled into the widened schema")
  }

  test("an unguarded full replace ignores the hook machinery (no false aborts)") {
    val repo = new TableRepo(scratch("gap-replace"), spark)
    repo.extend((1L to 20L).map(i => (i, s"v$i")).toDF("id", "payload"))
    val pre = TableRepo.guardedAbortsPostCommit.get()
    repo.replaceAll((1L to 5L).map(i => (i, "r")).toDF("id", "payload"))
    assert(repo.count() == 5)
    assert(TableRepo.guardedAbortsPostCommit.get() == pre)
  }
}
