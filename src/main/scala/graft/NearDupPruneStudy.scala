package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Queries
import graft.repo.TableRepo

/** PRUNE study — measured evidence for the candidate-pruned exact-Jaccard
  * verify in the incremental near-dup family (round 10's refactor): the
  * verify's text-repo scan must track the CANDIDATE COUNT, not the corpus
  * size. Seeds a band index (bh-clustered) and companion text repo
  * (doc_id-clustered) with most of `documents`, then drives the remaining
  * docs through `incrDedupRoundPruned` in N batches; per batch it records
  * the candidate pairs, distinct dup_of needles, and the files/bytes the
  * pruned `readWhereIn` text read touches vs the text repo's total. The
  * batch rounds (`q_incr_dedup`, `q_incr_dedup_lsh_pruned`) and the
  * streaming twin ([[graft.streaming.StreamIncrNearDup]]) share this
  * engine ([[Queries.incrNearVerdictAndBands]]), so one measurement
  * covers both paths.
  *
  * Usage: runMain graft.NearDupPruneStudy [sfDir] [nBatches] [batch|stream]
  * Emits a markdown table (for SCALE.md) + one JSON summary line.
  */
object NearDupPruneStudy {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = if (args.length > 1) args(1).toInt else 20
    // "batch" drives rounds through incrDedupRoundPruned (the q_incr_dedup
    // engines); "stream" drives the SAME batches through
    // StreamIncrNearDup.processBatch (ledgered three-write micro-batch),
    // proving the candidate-pruned verify holds on the streaming path too
    val mode = if (args.length > 2) args(2) else "batch"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = sys.env.getOrElse("GRAFT_SCRATCH", "/root/repo/target/scratch") +
      s"/prunestudy-${ProcessHandle.current().pid()}"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val index = new TableRepo(s"$root/bands", spark,
      maxRecordsPerFile = 2000, clusterCols = Seq("bh"))
    val texts = new TableRepo(s"$root/texts", spark,
      maxRecordsPerFile = 200, clusterCols = Seq("doc_id"))
    val verdicts = new TableRepo(s"$root/verdicts", spark)

    // seed = the first 80% of doc_ids; batches = CONTIGUOUS id slices of
    // the rest — the realistic ingest shape (new docs get new increasing
    // ids), under which each appended text file covers a narrow fresh
    // id range and stays prunable. A modulo split would make every
    // appended file span the whole id domain and defeat footer pruning —
    // a layout lesson, not an engine property.
    // rank-based slicing (id domains can be sparse — the ScaleUp corpus
    // shifts replica ids): seed = first 80% of docs by id order, batches
    // = equal contiguous-id slices of the rest
    val ranked = docs.withColumn("__r",
      org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))).cast("long") - 1)
      .localCheckpoint(true)
    val nDocs = ranked.count()
    val seedN = nDocs * 8 / 10
    val batchW = math.max(1L, (nDocs - seedN) / nBatches)
    val seed = ranked.filter(col("__r") < seedN).drop("__r")
    Queries.incrDedupSeed(index, texts, seed)

    val fs = org.apache.hadoop.fs.FileSystem.get(
      java.net.URI.create(root), spark.sparkContext.hadoopConfiguration)
    def bytesOf(paths: Seq[String]): Long =
      paths.map(p => fs.getFileStatus(new org.apache.hadoop.fs.Path(p)).getLen).sum

    println("| batch | batch docs | candidates | needles | corpus docs | repo files | files scanned | repo MB | MB scanned | scan frac |")
    println("|---|---|---|---|---|---|---|---|---|---|")
    var maxFrac = 0.0
    val rows = (0 until nBatches).map { i =>
      val lo = seedN + batchW * i
      val hi = if (i == nBatches - 1) nDocs else seedN + batchW * (i + 1)
      val batch = ranked.filter(col("__r") >= lo && col("__r") < hi).drop("__r")
      val bDocs = batch.count()
      val (cand, _) = Queries.incrNearCandAndBands(index, batch, pruned = true)
      val dupIds = cand.select(col("dup_of").as("doc_id")).distinct()
      val nCand = cand.count()
      val nNeedle = dupIds.count()
      val repoFiles = texts.paths
      val scanFiles = texts.prunedFilesFor(dupIds, "doc_id")
      val repoB = bytesOf(repoFiles)
      val scanB = bytesOf(scanFiles)
      val corpusN = texts.count()
      val frac = if (repoB == 0) 0.0 else scanB.toDouble / repoB
      maxFrac = math.max(maxFrac, frac)
      println(f"| $i | $bDocs | $nCand | $nNeedle | $corpusN | ${repoFiles.size} | ${scanFiles.size} | ${repoB / 1e6}%.2f | ${scanB / 1e6}%.2f | $frac%.3f |")
      // run the real round so the next batch dedups against this one too
      if (mode == "stream")
        graft.streaming.StreamIncrNearDup.processBatch(
          batch, index, texts, verdicts, "study", i.toLong, pruned = true)
      else
        Queries.incrDedupRoundPruned(index, texts, batch).count()
      // the operational knob: periodic compaction re-clusters appended
      // text files into disjoint doc_id ranges, keeping the pruned read
      // sharp as the repo grows (watch the frac drop after each compact)
      if ((i + 1) % 5 == 0) texts.compact(targetRecordsPerFile = 200)
      (nCand, nNeedle, scanB, repoB)
    }
    val totScan = rows.map(_._3).sum
    // final = after the LAST batch (post any compaction); peak = max over
    // batches — the scan-fraction evidence normalizes against per-batch
    // sizes, so reporting both keeps the summary honest about compaction.
    val finalRepo = rows.last._4
    val peakRepo = rows.map(_._4).max
    println(s"""{"study":"prune","sf_dir":"$dir","mode":"$mode","batches":$nBatches,""" +
      s""""max_scan_frac":$maxFrac,"total_scanned_bytes":$totScan,""" +
      s""""final_repo_bytes":$finalRepo,"peak_repo_bytes":$peakRepo}""")
    spark.stop()
  }
}
