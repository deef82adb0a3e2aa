package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The durable floor record's provenance contract (round-20 hardening):
  *
  *  - `foldRecord` prunes against the INVENTORY, not the run's successful
  *    set — a query that exists but failed one run keeps its prior floor
  *    (r19's fold erased it, silently shrinking `best_floor_total` and
  *    making the headline incomparable across records);
  *  - folding is keyed by run id (`sweep_ts[0]`), so re-folding the same
  *    run — live, then again via `--merge` of its archived artifact — is
  *    a no-op for the `runs` counter AND the record bytes;
  *  - `--merge` honors the -1 failed-query sentinel: an artifact's raw
  *    rep times for a query that crashed in that run (which include
  *    timings of the crashing reps) never fold into the floor.
  *
  * No Spark session: these drive the record logic directly on a scratch
  * docs dir.
  */
class BenchRecordSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def scratchDir(name: String): String = {
    val d = Paths.get(s"target/test-scratch/$name-${System.nanoTime()}")
    Files.createDirectories(d)
    d.toString
  }

  private def readRec(dir: String, sfDir: String) =
    mapper.readTree(Files.readAllBytes(Paths.get(Bench.recordPath(sfDir, dir))))

  test("a query that exists but FAILED a run keeps its prior floor; only inventory removal drops it") {
    val dir = scratchDir("rec-inventory")
    val sf = "/tmp/sfX"
    val inv = Set("a", "b", "c")
    Bench.foldRecord(sf, "4", "fp", "run1", Map("a" -> 1.0, "b" -> 2.0, "c" -> 3.0), inv, dir)
    // run2: b failed (absent from runMins) but is still in the inventory
    val (total2, runs2) =
      Bench.foldRecord(sf, "4", "fp", "run2", Map("a" -> 0.5, "c" -> 4.0), inv, dir)
    assert(runs2 == 2)
    val r2 = readRec(dir, sf)
    assert(r2.path("queries_min").path("a").asDouble() == 0.5)
    assert(r2.path("queries_min").path("b").asDouble() == 2.0,
      "a transient failure must not erase b's cross-run floor")
    assert(r2.path("queries_min").path("c").asDouble() == 3.0)
    assert(math.abs(total2 - 5.5) < 1e-9)
    // run3: b REMOVED from the inventory — now it drops
    val (total3, runs3) =
      Bench.foldRecord(sf, "4", "fp", "run3", Map("a" -> 0.6, "c" -> 2.9), Set("a", "c"), dir)
    assert(runs3 == 3)
    val r3 = readRec(dir, sf)
    assert(!r3.path("queries_min").has("b"), "a query removed from the inventory drops out")
    assert(math.abs(total3 - (0.5 + 2.9)) < 1e-9)
  }

  test("re-folding the same run id does not inflate the runs counter") {
    val dir = scratchDir("rec-refold")
    val sf = "/tmp/sfY"
    val inv = Set("a")
    val (_, r1) = Bench.foldRecord(sf, "4", "fp", "runA", Map("a" -> 1.0), inv, dir)
    val (_, r2) = Bench.foldRecord(sf, "4", "fp", "runA", Map("a" -> 0.9), inv, dir)
    assert(r1 == 1 && r2 == 1, "same run id folded twice counts once")
    val (_, r3) = Bench.foldRecord(sf, "4", "fp", "runB", Map("a" -> 1.1), inv, dir)
    assert(r3 == 2)
  }

  private def writeArtifact(dir: String, name: String, sf: String, cpus: String,
      sweepTs0: Long, rawA: Seq[Double], minA: Double, rawB: Seq[Double], minB: Double): String = {
    val raw = s"""{"a":[${rawA.mkString(",")}],"b":[${rawB.mkString(",")}]}"""
    val line = s"""{"metric":"total","value":9.9,"unit":"sec","cpus":"$cpus",""" +
      s""""queries":{"a":$minA,"b":$minB},"rep_times_raw":$raw,""" +
      s""""queries_min":{"a":$minA,"b":$minB},"sweep_ts":[$sweepTs0,${sweepTs0 + 5}],"sf":"$sf"}"""
    val p = Paths.get(dir, name)
    Files.write(p, (line + "\n").getBytes("UTF-8"))
    p.toString
  }

  test("--merge is idempotent: a live-folded run's artifact is skipped, and re-merging changes no bytes") {
    val dir = scratchDir("rec-merge")
    val sf = "/tmp/sfZ"
    val inv = Set("a", "b")
    // the live official run folds itself with runId = sweep_ts[0]
    Bench.foldRecord(sf, "4", "fp", "1000", Map("a" -> 1.0, "b" -> 2.0), inv, dir)
    val liveArtifact = writeArtifact(dir, "run1.json", sf, "4", 1000L,
      Seq(1.2, 1.0), 1.0, Seq(2.3, 2.0), 2.0)
    val before = Files.readAllBytes(Paths.get(Bench.recordPath(sf, dir))).toSeq
    Bench.mergeMain(Seq(liveArtifact), dir)
    assert(Files.readAllBytes(Paths.get(Bench.recordPath(sf, dir))).toSeq == before,
      "merging an already-live-folded artifact must leave the record byte-identical")
    // a genuinely NEW run folds once; merging it again is a byte no-op
    val newArtifact = writeArtifact(dir, "run2.json", sf, "4", 2000L,
      Seq(0.8, 0.9), 0.8, Seq(2.5, 2.6), 2.5)
    Bench.mergeMain(Seq(newArtifact), dir)
    val afterFirst = Files.readAllBytes(Paths.get(Bench.recordPath(sf, dir))).toSeq
    val rec = readRec(dir, sf)
    assert(rec.path("runs").asInt() == 2)
    assert(rec.path("queries_min").path("a").asDouble() == 0.8)
    assert(rec.path("queries_min").path("b").asDouble() == 2.0)
    Bench.mergeMain(Seq(newArtifact, newArtifact), dir)
    assert(Files.readAllBytes(Paths.get(Bench.recordPath(sf, dir))).toSeq == afterFirst,
      "re-merging the same artifact (even twice in one call) must change nothing")
    assert(readRec(dir, sf).path("runs").asInt() == 2)
  }

  test("--merge honors the -1 failed-query sentinel: crashing reps' raw timings never become floors") {
    val dir = scratchDir("rec-sentinel")
    val sf = "/tmp/sfW"
    Bench.foldRecord(sf, "4", "fp", "1000", Map("a" -> 1.0, "b" -> 2.0), Set("a", "b"), dir)
    // artifact from a run where `a` FAILED: queries_min carries -1 but
    // rep_times_raw still holds a suspiciously fast pre-crash timing
    val p = Paths.get(dir, "failed.json")
    Files.write(p, (s"""{"metric":"total","value":9.9,"unit":"sec","cpus":"4",""" +
      s""""queries":{"a":-1.0,"b":1.8},"rep_times_raw":{"a":[0.01],"b":[1.9,1.8]},""" +
      s""""queries_min":{"a":-1,"b":1.8},"sweep_ts":[3000],"sf":"$sf"}\n""").getBytes("UTF-8"))
    Bench.mergeMain(Seq(p.toString), dir)
    val rec = readRec(dir, sf)
    assert(rec.path("queries_min").path("a").asDouble() == 1.0,
      "a's 0.01 s crash-rep timing must not fold into the floor")
    assert(rec.path("queries_min").path("b").asDouble() == 1.8)
    assert(rec.path("runs").asInt() == 2)
  }

  test("--merge refuses artifacts from a different core count without consuming their run id") {
    val dir = scratchDir("rec-cpus")
    val sf = "/tmp/sfV"
    Bench.foldRecord(sf, "4", "fp", "1000", Map("a" -> 1.0), Set("a"), dir)
    val other = writeArtifact(dir, "c8.json", sf, "8", 4000L, Seq(0.5), 0.5, Seq(0.5), 0.5)
    val before = Files.readAllBytes(Paths.get(Bench.recordPath(sf, dir))).toSeq
    Bench.mergeMain(Seq(other), dir)
    assert(Files.readAllBytes(Paths.get(Bench.recordPath(sf, dir))).toSeq == before)
  }
}
