package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns
import graft.ops.{Ivf, IvfRepo}
import graft.repo.TableRepo

/** Drift study for the persisted-IVF serving lifecycle: [[IvfRepo.append]]
  * assigns new vectors against FROZEN centroids, so recall degrades only
  * as far as ingestion drifts away from the trained Voronoi cells
  * (`IvfRepo.append` doc) — this study puts a NUMBER on that claim and on
  * what [[IvfRepo.rebuild]] recovers, so a user knows when to schedule the
  * rebuild.
  *
  * Protocol (fully deterministic — pinned splits, no RNG):
  *   - train on the first half of the corpus (by `vec_id`), k = √n_base;
  *   - append the second half in `batches` slices, each shifted by a
  *     GROWING deterministic offset (`i·delta` added to the first 4
  *     dimensions) — simulated distribution drift, since the synthetic
  *     corpus is i.i.d. and unshifted appends would show nothing;
  *   - after each append, probe `nQ` queries drawn from THAT batch
  *     (drifted region — where degradation concentrates) against
  *     brute-force cosine truth over the same corpus state, BOTH ways:
  *     `recall_frozen` (the persisted index: stale centroids + appended
  *     assignments) and `recall_fresh` (throwaway centroids retrained on
  *     the current corpus at the same k/iters). The GAP between the two
  *     is the cost of serving on frozen centroids — absolute recall
  *     moves with the data (drifted vectors are mutually similar), so
  *     only the paired difference isolates drift;
  *   - after the last batch, [[IvfRepo.rebuild]] in place and re-probe:
  *     the repo path must land EXACTLY on the last `recall_fresh`
  *     (training is deterministic) — a self-check that rebuild serves
  *     the retrained index, asserted here.
  *
  * Also reports, per step, the max-cluster assignment fraction and the
  * mean per-query CANDIDATE fraction under both centroid sets: drifted
  * appends pile into the few cells nearest the drift direction, so the
  * frozen index's probes scan an ever-growing share of the corpus — at
  * strong drift the probe degenerates toward brute force over the
  * drifted region, which can even RAISE recall while voiding the
  * nprobe/k pruning contract. Drift's primary casualty is serve COST,
  * not recall, and the at-rest max-cluster fraction (readable from
  * directory sizes, no probes needed) is the rebuild TRIGGER a pipeline
  * can monitor cheaply.
  *
  * A `replicas` argument > 1 grows the corpus with the same orthogonal
  * sign-flip replication [[IvfServeStudy]] uses, so the trigger can be
  * validated at SERVE-scale k (k = √n_base): the needsRebuild defaults
  * were measured at k=32/k=100, while the serve corpora run at
  * k=316/707 — this is how the study reaches that regime. A
  * `trainStride` argument > 0 bounds every Lloyd input (initial build,
  * per-step fresh retrains, final rebuild) to the seed rows plus every
  * trainStride-th vec_id — the production sampled-training shape at
  * these sizes; the stride sample cross-sections the drifted appends,
  * so fresh retrains still see the drift they are supposed to recover.
  *
  * Usage: runMain graft.IvfDriftStudy [sfDir] [batches] [nQ] [delta] [replicas] [trainStride]
  * Emits one JSON line per step (append_1..B, then rebuild).
  */
object IvfDriftStudy {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batches = if (args.length > 1) args(1).toInt else 4
    val nQ = if (args.length > 2) args(2).toInt else 50
    val delta = if (args.length > 3) args(3).toDouble else 0.25
    val replicas = if (args.length > 4) args(4).toInt else 1
    val trainStride = if (args.length > 5) args(5).toInt else 0
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = sys.env.getOrElse("GRAFT_SCRATCH", "/root/repo/target/scratch") +
      s"/ivfdrift-${ProcessHandle.current().pid()}"
    // re-key to contiguous ranks: the ScaleUp stress dirs offset replica
    // vec_ids by a large stride, which would break the id-window base/slice split
    // below (a global window is fine in a measurement harness)
    val embsBase = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // replication reuses a large-stride offset like the one ScaleUp
    // stress dirs ALREADY
    // carry on disk — replicating such a dir would collide orig_ids and
    // make the row_number re-key below order duplicate keys arbitrarily,
    // breaking the study's "fully deterministic" protocol; refuse instead
    if (replicas > 1) {
      val maxIdRow = embsBase.agg(max(col("vec_id"))).head()
      require(!maxIdRow.isNullAt(0),
        "replicas > 1 needs a non-empty embeddings input (max over zero rows is NULL)")
      val maxId = maxIdRow.getLong(0)
      require(maxId < 100000000L,
        s"replicas=$replicas over an input whose vec_ids reach $maxId (>= 1e8): already a " +
          "replicated stress dir — replicate the base corpus instead, or pass replicas=1")
    }
    val embsRep = if (replicas <= 1) embsBase
      else (0 until replicas).map { r =>
        embsBase.select(
          (col("vec_id") + lit(r.toLong * 100000000L)).as("vec_id"),
          transform(col("embedding"), (x, j) =>
            when(pmod(hash(lit(r), j), lit(2)) === 0 && lit(r) =!= 0, -x).otherwise(x)
          ).as("embedding"))
      }.reduce(_ unionByName _)
    val embs = embsRep
      .select(col("vec_id").as("orig_id"), col("embedding"))
      .withColumn("vec_id",
        row_number().over(Window.orderBy(col("orig_id"))).cast("long") - 1)
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint(true)
    val n = embs.count()
    val nBase = n / 2
    val k = math.max(8, math.round(math.sqrt(nBase.toDouble)).toInt).toInt
    val nprobe = 2
    // sampled Lloyd input: seeds (the contract) + a deterministic
    // cross-section that reaches drifted appends (ids interleave slices)
    def trainSample(df: DataFrame): Option[DataFrame] =
      if (trainStride <= 0) None
      else Some(df.filter(col("vec_id") < k || col("vec_id") % trainStride === 0))

    def shifted(df: DataFrame, off: Double): DataFrame =
      df.withColumn("embedding", transform(col("embedding"),
        (x, i) => when(i < 4, x + lit(off)).otherwise(x).cast("float")))

    val base = embs.filter(col("vec_id") < nBase).localCheckpoint(true)
    val cent = new TableRepo(s"$root/cent", spark)
    val asg = new TableRepo(s"$root/asg", spark, groupCols = Seq("centroid_id"))
    IvfRepo.build(base, k, 3, cent, asg, trainSample(base))
    // healthy-index baseline for both at-rest signals: thresholds are
    // RATIOS against this row, not absolute values (mean assignment
    // cosine depends on the corpus's intrinsic cluster tightness)
    val ar0 = IvfRepo.driftStats(cent, asg)
    println(s"""{"study":"ivf_drift","dir":"$dir","step":"build","n":$nBase,""" +
      s""""k":$k,"nprobe":$nprobe,"replicas":$replicas,"train_stride":$trainStride,"drift_off":0.0,""" +
      s""""max_cluster_frac":${f"${ar0.maxClusterFrac}%.4f"},""" +
      s""""mean_assign_cos":${f"${ar0.meanAssignCos}%.4f"}}""")

    // corpusNow tracks the repo's logical content for the brute-force truth
    var corpusNow = base
    val sliceN = (n - nBase) / batches

    def bruteTop5(queries: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
      broadcast(queries)
        .join(corpusNow.select(col("vec_id").as("n_id"), col("embedding").as("n_emb")),
          col("n_id") =!= col("q_id"))
        .withColumn("sim", VectorFns.cosine(col("q_emb"), col("n_emb")))
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") <= 5)
        .select(col("q_id"), col("n_id")).localCheckpoint(true)
    }

    def recallOf(got: DataFrame, truth: DataFrame): Double =
      got.join(truth, Seq("q_id", "n_id"), "left_semi").count().toDouble / truth.count()

    // the in-memory twin of IvfRepo.probe, for the throwaway fresh index:
    // the probe's own routing plan (Ivf.route — the single copy), same
    // candidate join on centroid_id, same tie-break — minus the at-rest
    // repos
    def probeMem(queries: DataFrame, centDf: DataFrame, asgDf: DataFrame): DataFrame = {
      val qc = Ivf.route(queries, centDf, nprobe)
      val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
      broadcast(qc)
        .join(asgDf.select(col("vec_id").as("n_id"), col("centroid_id"),
          col("embedding").as("n_emb")), Seq("centroid_id"))
        .filter(col("n_id") =!= col("q_id"))
        .withColumn("sim", VectorFns.dot(col("q_emb"), col("n_emb")) /
          (col("q_nrm") * VectorFns.norm2(col("n_emb"))))
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") <= 5)
        .select(col("q_id"), col("n_id"))
    }

    // the at-rest rebuild-trigger signals a pipeline would monitor —
    // computed by the production helper itself, so the study measures
    // exactly what IvfRepo.driftStats exposes
    def atRest(): IvfRepo.DriftStats = IvfRepo.driftStats(cent, asg)

    // mean per-query CANDIDATE fraction: what share of the corpus a
    // query's nprobe probed clusters hold — the serve-COST face of drift
    // (recall alone misleads: overgrown clusters degenerate the probe
    // toward brute force over the drifted region, "gaining" recall while
    // voiding the nprobe/k pruning contract)
    def candFrac(queries: DataFrame, centDf: DataFrame, asgDf: DataFrame): Double = {
      val sizes = asgDf.groupBy(col("centroid_id")).count()
      val tot = asgDf.count().toDouble
      val perQ = Ivf.route(queries, centDf, nprobe)
        .join(broadcast(sizes), Seq("centroid_id"))
        .groupBy(col("q_id")).agg(sum(col("count")).as("cand"))
        .agg(avg(col("cand"))).head().getDouble(0)
      perQ / tot
    }

    var lastQueries: DataFrame = null
    var lastFresh = 0.0
    for (i <- 1 to batches) {
      val lo = nBase + (i - 1) * sliceN
      val hi = if (i == batches) n else nBase + i.toLong * sliceN
      val slice = shifted(
        embs.filter(col("vec_id") >= lo && col("vec_id") < hi), i * delta)
        .localCheckpoint(true)
      IvfRepo.append(slice, cent, asg)
      corpusNow = corpusNow.unionByName(slice).localCheckpoint(true)
      lastQueries = slice.orderBy(col("vec_id")).limit(nQ)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        .localCheckpoint(true)
      val truth = bruteTop5(lastQueries)
      val frozen = recallOf(
        IvfRepo.probe(lastQueries, cent, asg, nprobe, 5).select(col("q_id"), col("n_id")),
        truth)
      val freshCent = Ivf.train(trainSample(corpusNow).getOrElse(corpusNow), k, 3)
        .localCheckpoint(true)
      val freshAsg = Ivf.assign(corpusNow, freshCent).localCheckpoint(true)
      lastFresh = recallOf(probeMem(lastQueries, freshCent, freshAsg), truth)
      val fcF = candFrac(lastQueries, cent.getFullDf, asg.getFullDf)
      val fcR = candFrac(lastQueries, freshCent, freshAsg)
      val ar = atRest()
      println(s"""{"study":"ivf_drift","dir":"$dir","step":"append_$i","n":$hi,""" +
        s""""k":$k,"nprobe":$nprobe,"drift_off":${i * delta},""" +
        s""""recall_frozen":${f"$frozen%.4f"},"recall_fresh":${f"$lastFresh%.4f"},""" +
        s""""gap":${f"${lastFresh - frozen}%.4f"},"max_cluster_frac":${f"${ar.maxClusterFrac}%.4f"},""" +
        s""""mean_assign_cos":${f"${ar.meanAssignCos}%.4f"},""" +
        s""""cand_frac_frozen":${f"$fcF%.4f"},"cand_frac_fresh":${f"$fcR%.4f"}}""")
    }

    IvfRepo.rebuild(corpusNow, k, 3, cent, asg, trainSample(corpusNow))
    val truth = bruteTop5(lastQueries)
    val r = recallOf(
      IvfRepo.probe(lastQueries, cent, asg, nprobe, 5).select(col("q_id"), col("n_id")),
      truth)
    val fcPost = candFrac(lastQueries, cent.getFullDf, asg.getFullDf)
    val arPost = atRest()
    println(s"""{"study":"ivf_drift","dir":"$dir","step":"rebuild","n":$n,""" +
      s""""k":$k,"nprobe":$nprobe,"drift_off":${batches * delta},""" +
      s""""recall_frozen":${f"$r%.4f"},"recall_fresh":${f"$lastFresh%.4f"},""" +
      s""""gap":${f"${lastFresh - r}%.4f"},"max_cluster_frac":${f"${arPost.maxClusterFrac}%.4f"},""" +
      s""""mean_assign_cos":${f"${arPost.meanAssignCos}%.4f"},""" +
      s""""cand_frac_frozen":${f"$fcPost%.4f"},"cand_frac_fresh":${f"$fcPost%.4f"}}""")
    assert(math.abs(r - lastFresh) < 1e-9,
      s"rebuild must serve the retrained index exactly: repo=$r fresh=$lastFresh")
    spark.stop()
  }
}
