package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Ivf, IvfRepo}
import graft.repo.TableRepo

/** STREAM-INGEST study — measured evidence for the streaming face of the
  * persisted-IVF index ([[IvfRepo.startAppendStream]]): per-micro-batch
  * ingest cost must track the BATCH SIZE, not the index size (assignment
  * is a broadcast of k centroids against the batch — nothing in it reads
  * the at-rest assignment table), `compactEvery` must keep the per-batch
  * small files folded, and the probe path's directory pruning must hold
  * unchanged on an index that was half built, half streamed.
  *
  * Protocol: build on the first half of the corpus at k=√n_seed (the
  * operating point from the recall sweep), then stream the second half in
  * N micro-batches — each batch a fresh `AvailableNow` run against the
  * SAME checkpoint, i.e. N restarts of the exactly-once ledger path, the
  * crash-adjacent shape rather than one cosy long-lived stream. Per batch
  * it records wall time, assignment-repo file count and rows; afterwards
  * it asserts the streamed table equals the batch-twin
  * ([[IvfRepo.append]] of the same slices) and measures the probe's
  * per-query scan fraction on the mixed-provenance index.
  *
  * Usage: runMain graft.IvfStreamStudy [sfDir] [nBatches] [compactEvery]
  * Emits a markdown table (for SCALE.md) + one JSON summary line.
  */
object IvfStreamStudy {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = if (args.length > 1) args(1).toInt else 10
    val compactEvery = if (args.length > 2) args(2).toInt else 5
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = sys.env.getOrElse("GRAFT_SCRATCH", "/root/repo/target/scratch") +
      s"/ivfstream-${ProcessHandle.current().pid()}"
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val ranked = embs.withColumn("__r",
      row_number().over(Window.orderBy(col("vec_id"))).cast("long") - 1)
      .localCheckpoint(true)
    val n = ranked.count()
    val seedN = n / 2
    val k = math.max(4, math.sqrt(seedN.toDouble).toInt)
    val seed = ranked.filter(col("__r") < seedN).drop("__r")

    val cent = new TableRepo(s"$root/cent", spark)
    val asg = new TableRepo(s"$root/asg", spark, groupCols = Seq("centroid_id"))
    val t0 = System.nanoTime()
    IvfRepo.build(seed, k, 3, cent, asg)
    val buildS = (System.nanoTime() - t0) / 1e9

    // one parquet file per micro-batch slice, dropped just before its run
    val dropDir = s"$root/drop"
    val ckpt = s"$root/ckpt"
    val batchW = math.max(1L, (n - seedN) / nBatches)
    def stream = spark.readStream.schema(embs.schema).parquet(dropDir)

    println("| batch | rows | wall s | asg files | asg rows |")
    println("|---|---|---|---|---|")
    val walls = (0 until nBatches).map { i =>
      val lo = seedN + batchW * i
      val hi = if (i == nBatches - 1) n else seedN + batchW * (i + 1)
      ranked.filter(col("__r") >= lo && col("__r") < hi).drop("__r")
        .coalesce(1).write.mode("append").parquet(dropDir)
      val b0 = System.nanoTime()
      val q = IvfRepo.startAppendStream(stream, cent, asg, ckpt,
        compactEvery = compactEvery)
      q.processAllAvailable(); q.stop()
      val wall = (System.nanoTime() - b0) / 1e9
      val files = asg.paths.size
      val rows = asg.count()
      println(f"| $i | ${hi - lo} | $wall%.2f | $files | $rows |")
      wall
    }

    // batch-stream equivalence: the streamed table must equal the
    // batch-twin append of the same tail against the same centroids
    val tail = ranked.filter(col("__r") >= seedN).drop("__r")
    val expect = Ivf.assign(seed.unionByName(tail), cent.getFullDf)
      .select(col("vec_id"), col("centroid_id"))
    val got = asg.getFullDf.select(col("vec_id"), col("centroid_id"))
    val diff = got.exceptAll(expect).count() + expect.exceptAll(got).count()
    require(diff == 0, s"stream/batch divergence: $diff rows")

    // probe pruning on the mixed-provenance index: per-query scan bytes
    // over the probed directories vs the repo total (nprobe=2)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      java.net.URI.create(root), spark.sparkContext.hadoopConfiguration)
    def bytesOf(paths: Seq[String]): Long =
      paths.map(p => fs.getFileStatus(new org.apache.hadoop.fs.Path(p)).getLen).sum
    val allPaths = asg.paths
    val totB = bytesOf(allPaths)
    val queries = ranked.filter(col("__r") >= n - 20).drop("__r")
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .localCheckpoint(true)
    // nearest-2 centroids per query — the same broadcast-cross math as
    // IvfRepo.probe's qc frame, collected once for all queries
    val c = cent.getFullDf.select(col("centroid_id"), col("c_emb"),
      sqrt(graft.functions.VectorFns.dotHof(col("c_emb"), col("c_emb"))).as("c_nrm"))
    val cw = Window.partitionBy(col("q_id")).orderBy(col("csim").desc, col("centroid_id"))
    val qc = broadcast(queries
        .withColumn("q_nrm", graft.functions.VectorFns.norm2(col("q_emb"))))
      .crossJoin(broadcast(c))
      .withColumn("csim", graft.functions.VectorFns.dotHof(col("q_emb"), col("c_emb")) /
        (col("q_nrm") * col("c_nrm")))
      .withColumn("__rn", row_number().over(cw)).filter(col("__rn") <= 2)
      .select(col("q_id"), col("centroid_id"))
    val probedPerQ = qc.collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.get(1)).toIndexedSeq).toMap
    val perQ = probedPerQ.values.map { probed =>
      bytesOf(allPaths.filter(p =>
        probed.exists(id => p.contains(s"centroid_id=$id/")))).toDouble / totB
    }.toSeq
    val meanFrac = perQ.sum / perQ.length

    println(s"""{"study":"ivfstream","sf_dir":"$dir","n":$n,"k":$k,""" +
      s""""batches":$nBatches,"compact_every":$compactEvery,""" +
      s""""build_s":${f"$buildS%.2f"},""" +
      s""""batch_wall_s":[${walls.map(w => f"$w%.2f").mkString(",")}],""" +
      s""""final_asg_files":${asg.paths.size},"stream_batch_diff":$diff,""" +
      s""""mean_probe_scan_frac":${f"$meanFrac%.4f"},""" +
      s""""contract_frac":${f"${2.0 / k}%.4f"}}""")
    spark.stop()
  }
}
