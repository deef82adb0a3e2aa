package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Ivf, IvfRepo}
import graft.repo.TableRepo

/** SERVE-cost study for the persisted-IVF path: q_ivf_probe_repo pays the
  * whole build (train + assignment write) inside the query, so its bench
  * time says nothing about what a probe costs once the index EXISTS —
  * the number a serving story actually needs. This builds once at
  * k ≈ √n, then times probe-only executions and reports the at-rest
  * evidence: files/bytes under the probed directories vs the whole
  * assignment repo (directory listing — the same bytes a cluster scan
  * would read), alongside the brute-force top-k wall time on the same
  * queries for scale.
  *
  * A `replicas` argument > 1 grows the corpus in-memory with the same
  * orthogonal sign-flip replication [[ScaleUp]] uses for its stress dirs
  * (within-replica cosines exact, cross-replica similarity scrambled —
  * natural neighbour density at r× the rows), which is how the
  * IVF-vs-brute CROSSOVER is measured: brute force is O(n·queries) while
  * the probe scans ~nprobe/k of the corpus, so past some n the index
  * pays for itself — the study puts a number on where.
  *
  * A `trainN` argument > 0 trains on the first trainN vectors (by id)
  * while still assigning the whole corpus — [[IvfRepo.build]]'s sampled-
  * training mode, the only affordable shape once Lloyd over the corpus
  * would dominate the build.
  *
  * A `compactTo` argument > 0 re-runs the probe sweep after
  * `asg.compact(compactTo)` (records per file): the at-file-granularity
  * probe cost is dominated by file-OPEN count, not bytes — r13's n=500k
  * nprobe=4 row opened 9 583 small streamed/appended files — so the
  * second sweep measures what folding the per-cluster fragments buys,
  * putting a number on "compaction is part of the serving contract".
  *
  * Usage: runMain graft.IvfServeStudy [sfDir] [nQueries] [reps] [replicas] [trainN] [compactTo]
  * Emits one JSON line per nprobe in {1, 2, 4} (twice when compactTo > 0,
  * tagged "compacted": false/true).
  */
object IvfServeStudy {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nQ = if (args.length > 1) args(1).toInt else 100
    val reps = if (args.length > 2) args(2).toInt else 3
    val replicas = if (args.length > 3) args(3).toInt else 1
    val trainN = if (args.length > 4) args(4).toInt else 0
    val compactTo = if (args.length > 5) args(5).toLong else 0L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = sys.env.getOrElse("GRAFT_SCRATCH", "/root/repo/target/scratch") +
      s"/ivfserve-${ProcessHandle.current().pid()}"
    val embsBase = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val embs = (if (replicas <= 1) embsBase
      else (0 until replicas).map { r =>
        embsBase.select(
          (col("vec_id") + lit(r.toLong * 100000000L)).as("vec_id"),
          transform(col("embedding"), (x, j) =>
            when(pmod(hash(lit(r), j), lit(2)) === 0 && lit(r) =!= 0, -x).otherwise(x)
          ).as("embedding"))
      }.reduce(_ unionByName _)).localCheckpoint(true)
    val n = embs.count()
    val k = math.max(8, math.round(math.sqrt(n.toDouble)).toInt)
    val cent = new TableRepo(s"$root/cent", spark)
    val asg = new TableRepo(s"$root/asg", spark, groupCols = Seq("centroid_id"))

    val trainOn =
      if (trainN > 0) Some(embs.orderBy(col("vec_id")).limit(trainN)) else None
    val tBuild0 = System.nanoTime()
    IvfRepo.build(embs, k, 3, cent, asg, trainOn)
    val buildS = (System.nanoTime() - tBuild0) / 1e9

    val queries = embs.orderBy(col("vec_id")).limit(nQ)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .localCheckpoint(true)

    // brute-force reference: one broadcast-queries pass over the corpus
    def bruteOnce(): Long = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
      broadcast(queries)
        .join(embs.select(col("vec_id").as("n_id"), col("embedding").as("n_emb")),
          col("n_id") =!= col("q_id"))
        .withColumn("sim", graft.functions.VectorFns.cosine(col("q_emb"), col("n_emb")))
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") <= 5)
        .count()
    }
    val bruteS = (1 to reps).map { _ =>
      val t0 = System.nanoTime(); bruteOnce(); (System.nanoTime() - t0) / 1e9
    }.min

    def sizeOf(p: String): Long = new java.io.File(p.stripPrefix("file:")).length

    def sweep(compacted: Boolean, compactS: Double): Unit = {
      val allPaths = asg.paths
      val totalBytes = allPaths.map(sizeOf).sum
      for (nprobe <- Seq(1, 2, 4)) {
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          IvfRepo.probe(queries, cent, asg, nprobe, 5).count()
          (System.nanoTime() - t0) / 1e9
        }
        // at-rest evidence: which directories the union of these probes
        // touches (per-query it is nprobe dirs; the union over the sample
        // bounds the one-shot batch-probe read) — recomputed here exactly
        // as IvfRepo.probe selects them
        val perQuery: Map[Long, Seq[Long]] = {
          val c = cent.getFullDf.select(col("centroid_id"), col("c_emb"))
          import org.apache.spark.sql.expressions.Window
          val cw = Window.partitionBy(col("q_id")).orderBy(col("csim").desc, col("centroid_id"))
          queries.crossJoin(broadcast(c))
            .withColumn("csim", graft.functions.VectorFns
              .dotHof(col("q_emb"), col("c_emb")) /
              (graft.functions.VectorFns.norm2(col("q_emb")) *
                sqrt(graft.functions.VectorFns.dotHof(col("c_emb"), col("c_emb")))))
            .withColumn("__rn", row_number().over(cw)).filter(col("__rn") <= nprobe)
            .select(col("q_id"), col("centroid_id")).collect()
            .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSeq).toMap
        }
        val probedIds = perQuery.values.flatten.toSet
        val dirBytes: Map[Long, Long] = probedIds.map(id =>
          id -> allPaths.filter(_.contains(s"centroid_id=$id/")).map(sizeOf).sum).toMap
        // a SINGLE query's probe reads only its own nprobe directories —
        // the serve-latency scan cost; the batch rows above are the union
        val perQueryFrac = perQuery.values
          .map(ids => ids.map(dirBytes).sum.toDouble / totalBytes)
        val meanPerQueryFrac = perQueryFrac.sum / perQueryFrac.size
        val probedFiles = allPaths.filter(p => probedIds.exists(id => p.contains(s"centroid_id=$id/")))
        val probedBytes = probedFiles.map(sizeOf).sum
        println(s"""{"study":"ivf_serve","dir":"$dir","n":$n,"k":$k,"train_n":$trainN,"nprobe":$nprobe,""" +
          s""""queries":$nQ,"build_s":${f"$buildS%.2f"},"probe_s_min":${f"${times.min}%.2f"},""" +
          s""""brute_s_min":${f"$bruteS%.2f"},"probed_dirs":${probedIds.size},""" +
          s""""probed_files":${probedFiles.size},"total_files":${allPaths.size},""" +
          s""""probed_bytes":$probedBytes,"total_bytes":$totalBytes,""" +
          s""""union_scan_frac":${f"${probedBytes.toDouble / totalBytes}%.4f"},""" +
          s""""mean_per_query_scan_frac":${f"$meanPerQueryFrac%.4f"},""" +
          s""""compacted":$compacted,"compact_s":${f"$compactS%.2f"}}""")
      }
    }

    sweep(compacted = false, compactS = 0.0)
    if (compactTo > 0) {
      val tC0 = System.nanoTime()
      asg.compact(compactTo)
      val compactS = (System.nanoTime() - tC0) / 1e9
      sweep(compacted = true, compactS = compactS)
    }
    spark.stop()
  }
}
