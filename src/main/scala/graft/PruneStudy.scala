package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.repo.TableRepo

/** Footer-prune effectiveness study for the incremental-dedup index
  * probe ([[graft.repo.TableRepo.readWhereIn]]): seeds a fingerprint
  * index CLUSTERED by fp from each given corpus dir, probes it with the
  * SAME fixed batch (derived from the first dir), and reports total vs
  * scanned file counts. The scale claim on file in SCALE.md: with the
  * batch held fixed, a 10× index grows `files_total` 10× while
  * `files_scanned` stays bounded by the batch's distinct fingerprints —
  * the probe's scan cost follows the BATCH, not the index. The full-scan
  * probe (`q_incr_dedup_exact`'s shape) reads `files_total` by
  * construction; the gap between the two columns is the 100 TB argument.
  *
  * The interesting regime is needles ≪ files (a micro-batch probing a
  * big index): uniform md5 fingerprints hit ≈ min(needles, files)
  * distinct file ranges, so with needles ≥ files every file is touched
  * no matter the layout — which is also why the full-scan twin is FINE
  * until the index outgrows the batch by orders of magnitude.
  *
  * Usage: runMain graft.PruneStudy [batchDir] [indexDir1,...] [batchSize] [recsPerFile]
  */
object PruneStudy {
  def main(args: Array[String]): Unit = {
    val batchDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val indexDirs = (if (args.length > 1) args(1)
      else s"$batchDir,/root/repo/target/sf1").split(",").toSeq
    val batchSize = if (args.length > 2) args(2).toInt else 16
    val recsPerFile = if (args.length > 3) args(3).toLong else 500L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // fixed probe batch: the first `batchSize` documents of the batch corpus
    val batch = spark.read.parquet(s"$batchDir/documents.parquet")
      .orderBy(col("doc_id")).limit(batchSize)
      .select(col("doc_id"), TextFns.fingerprint(col("text")).as("fp"))
      .localCheckpoint(true)
    val batchN = batch.count()

    indexDirs.foreach { dir =>
      val root = s"target/scratch/prune-study-${System.nanoTime()}"
      val index = new TableRepo(root, spark,
        maxRecordsPerFile = recsPerFile, clusterCols = Seq("fp"))
      val corpus = spark.read.parquet(s"$dir/documents.parquet")
      index.extend(corpus.select(col("doc_id"), TextFns.fingerprint(col("text")).as("fp")))
      val total = index.nFiles
      val scanned = index.prunedFilesFor(batch.select(col("fp")), "fp").size
      val hits = index.readWhereIn(batch.select(col("fp")), "fp").count()
      println(s"""{"index_dir":"$dir","batch_fps":$batchN,"files_total":$total,""" +
        s""""files_scanned":$scanned,"scan_frac":${scanned.toDouble / total},"hits":$hits}""")
      index.purge()
    }
    spark.stop()
  }
}
