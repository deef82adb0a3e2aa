package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
/** Benchmark main: times every SparkEntry query at the given SF dir.
  *
  * Each query runs REPS times in one session and reports the MEDIAN —
  * single-shot numbers on a shared VM are noise-dominated (round 4's
  * "regressions" were indistinguishable from VM jitter). The full JSON
  * line goes to stdout AND to target/bench.json, because the driver's
  * stdout capture has truncated mid-line two rounds running.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (codegen, file index, committer init) so the first
    // timed query doesn't absorb one-time startup cost
    spark.range(1000).selectExpr("sum(id)").collect()
    // warm on whichever table the dir actually has (stress dirs built by
    // graft.ScaleUp carry only documents)
    val warm = Seq("region", "documents").find(t => Files.exists(Paths.get(s"$sfDir/$t.parquet")))
    warm.foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    // optional comma-separated subset, for targeted perf iteration
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val queries = only.fold(SparkEntry.queries)(f => SparkEntry.queries.filter(kv => f(kv._1)))
    // Reps are interleaved ROUND-ROBIN (q1 q2 … qN, q1 q2 … qN, …) so a
    // transient VM stall degrades one rep of many queries — recoverable by
    // the median — instead of poisoning all reps of one query (the round-7
    // artifact carried 2-9x single-query spikes from exactly that).
    // Many queries end in localCheckpoint; their executor blocks otherwise
    // accumulate across 99×reps runs with only async ContextCleaner
    // reclaim, bleeding interference into later queries — so persisted
    // RDDs are dropped after every query (untimed) and a GC closes each
    // sweep.
    val queryList = queries.toSeq
    val times = Array.fill(queryList.size)(scala.collection.mutable.ArrayBuffer.empty[Double])
    val fails = Array.fill[Option[Throwable]](queryList.size)(None)
    // Experiment knobs for decomposing harness cost from plan cost
    // (SCALE.md "Measurement noise"): mode=consecutive re-runs each
    // query's reps back-to-back (the pre-r8 warm-block subsidy);
    // nockpt=1 disables the Ckpt barriers, paying recomputation of
    // shared stages instead of materialization — quantifying what the
    // checkpoint floor costs at this SF.
    val consecutive = sys.env.get("SPARK_GRAFT_BENCH_MODE").contains("consecutive")
    val noCkpt = sys.env.get("SPARK_GRAFT_BENCH_NOCKPT").contains("1")
    def runOnce(qi: Int, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        timed: Boolean = true): Unit = {
      val t0 = System.nanoTime()
      try {
        if (noCkpt) graft.ops.Ckpt.withDisabled(fn(spark, sfDir).count())
        else fn(spark, sfDir).count()
      } catch { case e: Throwable => fails(qi) = fails(qi).orElse(Some(e)) }
      if (timed) times(qi) += (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    // One UNTIMED warm rep per query before any timed sweep: the first
    // execution of a query pays its codegen compile, broadcast-thread and
    // shuffle-service warmup — r11's official artifact carried 5-10x
    // first-rep inflation (q_minhash_est [11.98, 2.65, 1.62]) that three
    // clean re-runs at the same HEAD didn't reproduce. Paying one extra
    // sweep keeps the MEDIAN honest with only 3 timed reps.
    val warmRep = !sys.env.get("SPARK_GRAFT_BENCH_NOWARM").contains("1")
    // Per-sweep box-state samples make the artifact self-adjudicating
    // against external load (round 15 needed cross-run archaeology to
    // clear a 19% "regression" that was an external load cycle): each
    // round-robin sweep records its start timestamp and the 1-min
    // loadavg, so a stalled sweep is attributable in the JSON itself.
    val sweepTs = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sweepLoad = scala.collection.mutable.ArrayBuffer.empty[Double]
    def sampleSweep(): Unit = {
      sweepTs += System.currentTimeMillis() / 1000
      sweepLoad += java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
    }
    if (warmRep) {
      sampleSweep()
      queryList.zipWithIndex.foreach { case ((_, fn), qi) => runOnce(qi, fn, timed = false) }
      System.gc()
    }
    if (consecutive) {
      sampleSweep()
      queryList.zipWithIndex.foreach { case ((_, fn), qi) =>
        for (_ <- 1 to reps) runOnce(qi, fn); System.gc()
      }
    } else
      for (_ <- 1 to reps) {
        sampleSweep()
        queryList.zipWithIndex.foreach { case ((_, fn), qi) => runOnce(qi, fn) }
        System.gc()
      }
    // STALL RERUN: the harness already detects a box stall (one raw rep
    // >= 3x the query's fastest) — but with 5 reps the dropminmax median
    // still absorbs only ONE outlier, and the round-16 official artifact
    // paid 37 s of headline for nine stalled queries. Each stalled query
    // gets exactly one extra rep (bounded: one pass, logged, its own
    // sweep sample), then the SAME official metric — dropminmax median —
    // runs over the final rep set. The closing `stalls` scalar is
    // computed on that final set, so a query that stays stalled is still
    // reported; `stall_reruns` records how many re-runs happened.
    // ONE stall predicate for both the re-run filter and the closing
    // `stalls` scalar — the artifact's contract is that the scalar
    // re-applies the exact criterion that triggered the re-runs
    def isStalled(qi: Int): Boolean = {
      val ts = times(qi)
      fails(qi).isEmpty && ts.nonEmpty && ts.min > 0 && ts.max / ts.min >= 3.0
    }
    val rerun = queryList.indices.filter(isStalled)
    val stallReruns = rerun.size
    if (rerun.nonEmpty) {
      System.err.println(s"BENCH STALL RERUN: ${rerun.size} queries with raw rep " +
        s"span >= 3x get one extra rep: ${rerun.map(queryList(_)._1).mkString(", ")}")
      sampleSweep()
      rerun.foreach(qi => runOnce(qi, queryList(qi)._2))
      System.gc()
    }
    sampleSweep() // end-of-run state closes the bracket
    // With >= 4 reps the single highest and single lowest rep are DROPPED
    // before the median: even with the warm rep, one rep per sweep can
    // still land in a box I/O stall (r12's official artifact carried 9/51
    // queries at max/min >= 3 from exactly that), and the dropped-extremes
    // median is immune to one stalled AND one anomalously-cached rep per
    // query. rep_times below carries the KEPT reps (ascending); the raw
    // un-dropped arrays stay in rep_times_raw for self-diagnosis.
    def kept(qi: Int): Seq[Double] = {
      val ts = times(qi).sorted.toSeq
      if (ts.length >= 4) ts.drop(1).dropRight(1) else ts
    }
    val results = queryList.zipWithIndex.map { case ((name, _), qi) =>
      // a crashing query must NOT masquerade as a fast one: any failed rep
      // poisons the whole entry to the -1 sentinel (and stderr says why)
      fails(qi).foreach(e => System.err.println(s"BENCH FAIL $name: $e"))
      val ts = kept(qi)
      name -> (if (fails(qi).isEmpty) ts(ts.length / 2) else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // per-rep times make the artifact self-diagnosing: a single-rep VM
    // stall shows up as one outlier in its array instead of demanding a
    // cross-run adjudication (the round-8 76-vs-59s ambiguity)
    val perRep = queryList.zipWithIndex.map { case ((name, _), qi) =>
      "\"" + name + "\":" + kept(qi).map(t => f"$t%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val perRepRaw = queryList.zipWithIndex.map { case ((name, _), qi) =>
      "\"" + name + "\":" + times(qi).map(t => f"$t%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // the per-query MIN of the raw reps: the load-insensitive floor.
    // tools/compare_bench.py's noise verdict compares floors across
    // rounds — a headline delta whose floors are flat is environment.
    val qsMin = queryList.zipWithIndex.map { case ((name, _), qi) =>
      val ts = times(qi)
      "\"" + name + "\":" + (if (fails(qi).isEmpty && ts.nonEmpty) f"${ts.min}%.3f" else "-1")
    }.mkString("{", ",", "}")
    val sweepTsJson = sweepTs.mkString("[", ",", "]")
    val sweepLoadJson = sweepLoad.map(l => f"$l%.2f").mkString("[", ",", "]")
    // two scalars that survive ANY truncation (they close the line):
    // the floor total (sum of per-query raw minima — load-insensitive)
    // and the stall count (queries whose raw reps span >= 3x). Together
    // they adjudicate a noisy headline even when every map is cut.
    val floorTotal = queryList.indices
      .filter(fails(_).isEmpty).flatMap(qi => times(qi).minOption).sum
    val stallCount = queryList.indices.count(isStalled)
    val okTimes = results.map(_._2).filter(_ >= 0)
    val total = if (okTimes.nonEmpty) okTimes.sum else 0.0
    val nFail = results.map(_._2).count(_ < 0)
    // consecutive mode runs all reps inside ONE sweep block, so its
    // sweep_ts/sweep_load carry only warm/start/end samples — the mode
    // string says so, or compare_bench would present them as per-sweep
    // stall attribution like roundrobin's
    val mode = (if (consecutive) "consecutive(sweeps=warm,start,end)" else "roundrobin") +
      (if (warmRep) "+warm" else "") + (if (reps >= 4) "+dropminmax" else "") +
      (if (noCkpt) "+nockpt" else "")
    // field order matters downstream: the driver's stdout capture keeps
    // only the LAST ~2000 chars, so the compact self-adjudication fields
    // (queries_min, sweep_ts, sweep_load) sit at the END of the line —
    // they survive truncation while the fat rep maps get cut
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"cpus":"$cpus","mode":"$mode","failed":$nFail,"queries":$qs,"rep_times":$perRep,"rep_times_raw":$perRepRaw,"queries_min":$qsMin,"sweep_ts":$sweepTsJson,"sweep_load":$sweepLoadJson,"stall_reruns":$stallReruns,"floor_total":${f"$floorTotal%.2f"},"stalls":$stallCount,"sf":"$sfDir"}"""
    // target/ is gitignored and the driver's stdout capture truncates, so
    // ALSO write to a committed path — docs/bench_last.json is the durable
    // all-queries artifact each round
    Files.createDirectories(Paths.get("target"))
    Files.write(Paths.get("target/bench.json"), (line + "\n").getBytes("UTF-8"))
    // only a FULL run in the production harness mode may replace the
    // committed artifact — a targeted subset or experiment run must not
    // clobber the round's all-queries record
    if (only.isEmpty && !consecutive && !noCkpt) {
      Files.createDirectories(Paths.get("docs"))
      Files.write(Paths.get("docs/bench_last.json"), (line + "\n").getBytes("UTF-8"))
    }
    println(line)
    spark.stop()
  }
}
