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
  * A `router` argument = 1 adds the BUCKET-GROUPED serve comparison
  * (SCALE.md's throughput-serving claim, measured): the probe's routing
  * phase (queries × broadcast centroids → per-query nprobe cluster ids)
  * is corpus-independent and driver-cheap, so a router can serve the
  * same query batch three ways — one all-queries batch call, one call
  * per PROBED CLUSTER (each bucket call scans exactly that cluster's
  * directories once for all its queries, partial top-k merged
  * driver-side), and one call per QUERY (the latency baseline) — and
  * the study times all three on identical queries, records scan bytes
  * per mode from the directory listing, and asserts the bucketed
  * merge answers bit-identically to the batch call.
  *
  * Usage: runMain graft.IvfServeStudy [sfDir] [nQueries] [reps] [replicas] [trainN] [compactTo] [router]
  * Emits one JSON line per nprobe in {1, 2, 4} (twice when compactTo > 0,
  * tagged "compacted": false/true), then one "ivf_router" line per nprobe
  * when router >= 1 (router = 2 skips the per-query wall measurement —
  * the large-nQ bucket-fill regime, where nQ sequential probe calls
  * would dwarf the rest of the study).
  */
object IvfServeStudy {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nQ = if (args.length > 1) args(1).toInt else 100
    val reps = if (args.length > 2) args(2).toInt else 3
    val replicas = if (args.length > 3) args(3).toInt else 1
    val trainN = if (args.length > 4) args(4).toInt else 0
    val compactTo = if (args.length > 5) args(5).toLong else 0L
    val router = if (args.length > 6) args(6).toInt else 0
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
    // same already-replicated-input guard as IvfDriftStudy: stacking this
    // stride on a ScaleUp stress dir's existing offsets would collide ids
    if (replicas > 1) {
      val maxIdRow = embsBase.agg(max(col("vec_id"))).head()
      require(!maxIdRow.isNullAt(0) && maxIdRow.getLong(0) < 100000000L,
        s"replicas=$replicas needs a base corpus with vec_ids below 1e8 — " +
          "replicate the base, not an already-replicated stress dir")
    }
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
        // bounds the one-shot batch-probe read) — the probe's OWN routing
        // plan (Ivf.route is the single copy IvfRepo.probe plans from)
        val perQuery: Map[Long, Seq[Long]] =
          Ivf.route(queries, cent.getFullDf, nprobe)
            .select(col("q_id"), col("centroid_id")).collect()
            .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSeq).toMap
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

    // ---- bucket-grouped router comparison (post-compaction state when
    // compactTo > 0 — the serving contract's operating shape); router=2
    // additionally skips the per-query wall (fill-regime runs) ----
    if (router >= 1) {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.VectorFns
      val topK = 5
      val allPaths = asg.paths
      val totalBytes = allPaths.map(sizeOf).sum
      for (nprobe <- Seq(1, 2, 4)) {
        // ROUTING phase, shared by the bucketed and per-query modes: one
        // driver round trip, corpus-independent (queries × k centroids) —
        // the probe's own Ivf.route plan, so bucketMatch compares modes
        // that routed identically by construction
        val tR0 = System.nanoTime()
        val routePlan = Ivf.route(queries, cent.getFullDf, nprobe)
        val routeRows = routePlan.collect()
        val routerS = (System.nanoTime() - tR0) / 1e9
        val qSchema = org.apache.spark.sql.types.StructType(routePlan.schema.dropRight(1))
        // memoized per nprobe: perQueryBytes below is a pure lookup per
        // (query, probed cluster) — a def re-filtering allPaths each call
        // is O(nQ·nprobe·|files|) substring scans in the fill regime
        val dirBytes: Map[Long, Long] = routeRows.map(_.getLong(3)).distinct.map(id =>
          id -> allPaths.filter(_.contains(s"centroid_id=$id/")).map(sizeOf).sum).toMap

        // mode 1: ONE batch call (the sweep's shape, re-timed here so all
        // three modes share a measurement window)
        val batchS = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          IvfRepo.probe(queries, cent, asg, nprobe, topK).count()
          (System.nanoTime() - t0) / 1e9
        }.min
        val batchRows = IvfRepo.probe(queries, cent, asg, nprobe, topK)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

        // mode 2: one call per PROBED CLUSTER — each bucket's queries
        // (LocalRelation) against exactly that cluster's directory, local
        // per-query top-k, partials merged driver-side
        val buckets = routeRows.groupBy(_.getLong(3)).toSeq.sortBy(_._1)
        val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
        val tB0 = System.nanoTime()
        val partials = buckets.flatMap { case (cid, rows) =>
          val qRows = rows.map(r => org.apache.spark.sql.Row(r.get(0), r.get(1), r.get(2)))
          val qDf = spark.createDataFrame(java.util.Arrays.asList(qRows: _*), qSchema)
          broadcast(qDf)
            .crossJoin(asg.getFullDf.filter(col("centroid_id") === lit(cid))
              .select(col("vec_id").as("n_id"), col("embedding").as("n_emb")))
            .filter(col("n_id") =!= col("q_id"))
            .withColumn("sim", VectorFns.dot(col("q_emb"), col("n_emb")) /
              (col("q_nrm") * VectorFns.norm2(col("n_emb"))))
            .withColumn("__rn", row_number().over(w)).filter(col("__rn") <= topK)
            .select(col("q_id"), col("n_id"), col("sim")).collect()
        }
        // iterator first: flatMap on the Map itself would rebuild a Map
        // keyed by qid and keep ONE pair per query
        val merged = partials.groupBy(_.getLong(0)).iterator.flatMap { case (qid, rs) =>
          rs.sortBy(r => (-r.getDouble(2), r.getLong(1))).take(topK)
            .map(r => (qid, r.getLong(1)))
        }.toSet
        val bucketS = (System.nanoTime() - tB0) / 1e9
        val bucketMatch = merged == batchRows
        require(bucketMatch, s"bucketed merge diverged from the batch probe at nprobe=$nprobe")

        // mode 3: one call per QUERY — the single-query latency baseline;
        // each call re-reads its own nprobe directories. Its scan bytes
        // are analytic (each query's probed dirs, summed); the WALL
        // measurement is skipped at router=2 (large-nQ fill-regime runs,
        // where nQ sequential calls would dwarf the study)
        val perQueryIds = routeRows.groupBy(_.getLong(0)).view
          .mapValues(_.map(_.getLong(3)).toSeq).toMap
        val perQueryS = if (router == 2) -1.0 else {
          val tQ0 = System.nanoTime()
          routeRows.groupBy(_.getLong(0)).toSeq.sortBy(_._1).foreach { case (_, rows) =>
            val qRows = Seq(org.apache.spark.sql.Row(rows.head.get(0), rows.head.get(1)))
            val oneQ = spark.createDataFrame(java.util.Arrays.asList(qRows: _*),
              org.apache.spark.sql.types.StructType(qSchema.dropRight(1)))
            IvfRepo.probe(oneQ, cent, asg, nprobe, topK).count()
          }
          (System.nanoTime() - tQ0) / 1e9
        }

        val unionIds = routeRows.map(_.getLong(3)).distinct.toSeq
        val unionBytes = unionIds.map(dirBytes).sum
        val perQueryBytes = perQueryIds.values.map(_.map(dirBytes).sum).sum
        println(s"""{"study":"ivf_router","dir":"$dir","n":$n,"k":$k,"nprobe":$nprobe,""" +
          s""""queries":$nQ,"topk":$topK,"router_s":${f"$routerS%.3f"},""" +
          s""""batch_s":${f"$batchS%.3f"},"batch_calls":1,"batch_bytes":$unionBytes,""" +
          s""""bucket_s":${f"$bucketS%.3f"},"bucket_calls":${buckets.size},""" +
          s""""bucket_bytes":$unionBytes,"bucket_match":$bucketMatch,""" +
          s""""per_query_s":${f"$perQueryS%.3f"},"per_query_calls":$nQ,""" +
          s""""per_query_bytes":$perQueryBytes,"total_bytes":$totalBytes,""" +
          s""""mean_bucket_queries":${f"${routeRows.length.toDouble / buckets.size}%.2f"},""" +
          s""""bytes_per_query_batch":${unionBytes / nQ},"bytes_per_query_bucket":${unionBytes / nQ},""" +
          s""""bytes_per_query_single":${perQueryBytes / nQ}}""")
      }
    }
    spark.stop()
  }
}
