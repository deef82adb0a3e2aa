package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** ANN RECALL study — the companion of [[SrpStudy]]: SrpStudy proves the
  * candidate volume scales, this measures what the buckets FIND. For the
  * two production ANN shapes (`q_ann_srp` multi-table SRP, `q_ann_srp_probe`
  * Hamming-1 multi-probe) it computes recall@k against the exact
  * brute-force top-k ([[graft.ops.Queries]] `q_topk_cosine` ground truth)
  * over a query sample, sweeping bucket width (fixed 8 vs
  * occupancy-scaled [[VectorFns.srpBitsFor]]) and table/probe depth —
  * the numbers that justify tables=4 and probe depth at 100 TB. Also
  * reports mean candidates per query: recall is only meaningful next to
  * the volume paid for it.
  *
  * Usage: runMain graft.RecallStudy [sfDir] [nQueries] [k]
  * Emits one JSON line per variant.
  */
object RecallStudy {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nQ = if (args.length > 1) args(1).toInt else 100
    val k = if (args.length > 2) args(2).toInt else 5
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = embs.count()
    val dim = 64
    val scaled = VectorFns.srpBitsFor(n, occupancy = 8)

    // query sample: the nQ smallest vec_ids (deterministic, replica-0
    // originals in the ScaleUp corpus)
    val qIds = embs.select(col("vec_id")).orderBy(col("vec_id")).limit(nQ)
      .collect().map(_.getLong(0)).toSet
    val isQuery = col("vec_id").isInCollection(qIds)

    val base = embs
      .select(col("vec_id"), col("embedding"), VectorFns.norm2(col("embedding")).as("nrm"))
      .localCheckpoint(true)
    val qSide = base.filter(isQuery)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"), col("nrm").as("qn"))

    def topkOf(cand: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
      cand
        .join(broadcast(qSide), "q_id")
        .join(base.select(col("vec_id").as("n_id"), col("embedding").as("ne"),
          col("nrm").as("nn")), "n_id")
        .withColumn("sim", VectorFns.dot(col("qe"), col("ne")) / (col("qn") * col("nn")))
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
        .select(col("q_id"), col("n_id"))
    }

    // exact ground truth: brute-force top-k per query (the q_topk_cosine
    // shape — broadcast queries, one pass over the corpus). sim is kept
    // so recall can be split by similarity band: SRP collision
    // probability decays with angle ((1 - θ/π)^bits per table), so
    // arbitrary-rank neighbors at cosine ~0.3 are structurally invisible
    // to it — the number that matters for the dedup pipeline is recall on
    // the ≥ threshold pairs it actually thresholds on.
    val simBand = 0.35 // the semantic-dedup verify threshold
    val gtW = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    val gt = broadcast(qSide)
      .join(base.select(col("vec_id").as("n_id"), col("embedding").as("ne"),
        col("nrm").as("nn")), col("n_id") =!= col("q_id"))
      .withColumn("sim", VectorFns.dot(col("qe"), col("ne")) / (col("qn") * col("nn")))
      .withColumn("__rn", row_number().over(gtW)).filter(col("__rn") <= k)
      .select(col("q_id"), col("n_id"), col("sim"))
      .localCheckpoint(true)
    val gtCount = gt.count().toDouble
    val gtHi = gt.filter(col("sim") >= simBand)
    val gtHiCount = gtHi.count().toDouble

    def report(variant: String, bits: Int, depth: Int, cand: DataFrame): Unit = {
      val c = cand.dropDuplicates("q_id", "n_id").localCheckpoint(true)
      val nCand = c.count()
      val found = topkOf(c).localCheckpoint(true)
      val hits = found.join(gt, Seq("q_id", "n_id"), "left_semi").count()
      val hitsHi = found.join(gtHi, Seq("q_id", "n_id"), "left_semi").count()
      val recall = hits / gtCount
      val recallHi = if (gtHiCount > 0) hitsHi / gtHiCount else -1.0
      println(s"""{"dir":"$dir","n":$n,"variant":"$variant","bits":$bits,""" +
        s""""depth":$depth,"queries":$nQ,"k":$k,""" +
        s""""mean_cand_per_q":${nCand.toDouble / nQ},"recall_at_k":$recall,""" +
        s""""gt_pairs_ge_${simBand}":${gtHiCount.toLong},"recall_ge_${simBand}":$recallHi}""")
    }

    // PLANTED-TWIN probe — the dedup-relevant recall: for each query
    // vector plant a perturbed twin at cosine ≈ 0.95 (w = v + 0.32·r,
    // r a seeded unit-scale random direction) and measure the fraction
    // of twins the bucket stage surfaces as candidates. Near-exact
    // twins are what the semantic-dedup pipeline exists to catch; SRP
    // theory says a cos-0.95 pair collides per 8-bit table w.p.
    // (1-θ/π)^8 ≈ 0.43, so 4 tables ≈ 0.89 — this measures it.
    val qVecs = base.filter(isQuery)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val twinBase = 10000000000L
    val twinRows = qVecs.map { case (id, v) =>
      val rng = new scala.util.Random(id)
      val noise = Array.fill(v.length)((rng.nextFloat() - 0.5f) * 2f)
      val nScale = 0.32 * math.sqrt(v.map(x => x * x.toDouble).sum /
        noise.map(x => x * x.toDouble).sum)
      (twinBase + id, v.indices.map(j => v(j) + (noise(j) * nScale).toFloat).toArray)
    }
    import spark.implicits._
    val withTwins = base.select(col("vec_id"), col("embedding"))
      .unionByName(twinRows.toSeq.toDF("vec_id", "embedding"))
      .localCheckpoint(true)

    def twinRecall(bits: Int, tables: Int, probeDepth: Int): Double = {
      val bucketed = withTwins.select(Seq(col("vec_id")) ++ (0 until tables).map(tb =>
        VectorFns.srpBucket(col("embedding"), bits, dim, tb).as(s"b$tb")): _*)
        .localCheckpoint(true)
      val qb = bucketed.filter(isQuery)
      val found = (0 until tables).flatMap { tb =>
        val probes =
          if (tb == 0 && probeDepth > 1)
            qb.select(col("vec_id").as("q_id"), explode(array((col(s"b$tb") +:
              (0 until (probeDepth - 1)).map(i => col(s"b$tb").bitwiseXOR(lit(1L << i)))): _*)).as("qb"))
          else qb.select(col("vec_id").as("q_id"), col(s"b$tb").as("qb"))
        Seq(broadcast(probes)
          .join(bucketed.select(col("vec_id").as("n_id"), col(s"b$tb").as("cb")),
            col("qb") === col("cb") && col("n_id") === col("q_id") + twinBase)
          .select(col("q_id")))
      }.reduce(_.union(_)).dropDuplicates("q_id").count()
      found.toDouble / nQ
    }

    for (bits <- Seq(8, scaled).distinct) {
      for (tables <- Seq(1, 2, 4))
        println(s"""{"dir":"$dir","n":$n,"variant":"twin_multi_table","bits":$bits,""" +
          s""""depth":$tables,"queries":$nQ,"twin_cand_recall":${twinRecall(bits, tables, 1)}}""")
      println(s"""{"dir":"$dir","n":$n,"variant":"twin_multi_probe","bits":$bits,""" +
        s""""depth":${bits + 1},"queries":$nQ,"twin_cand_recall":${twinRecall(bits, 1, bits + 1)}}""")
    }

    for (bits <- Seq(8, scaled).distinct) {
      // multi-table OR (the q_ann_srp shape), depth = table count
      val bucketed = base.select(Seq(col("vec_id")) ++ (0 until 4).map(tb =>
        VectorFns.srpBucket(col("embedding"), bits, dim, tb).as(s"b$tb")): _*)
        .localCheckpoint(true)
      for (tables <- Seq(1, 2, 4)) {
        val cand = (0 until tables).map { tb =>
          broadcast(bucketed.filter(isQuery).select(col("vec_id").as("q_id"), col(s"b$tb").as("qb")))
            .join(bucketed.select(col("vec_id").as("n_id"), col(s"b$tb").as("cb")),
              col("qb") === col("cb") && col("n_id") =!= col("q_id"))
            .select(col("q_id"), col("n_id"))
        }.reduce(_.union(_))
        report("multi_table", bits, tables, cand)
      }
      // multi-probe on ONE table (the q_ann_srp_probe shape), depth =
      // probed buckets (1 = own bucket only, bits+1 = Hamming<=1)
      for (probeDepth <- Seq(1, bits + 1)) {
        val probeArr = array((col("b0") +:
          (0 until (probeDepth - 1)).map(i => col("b0").bitwiseXOR(lit(1L << i)))): _*)
        val probes = bucketed.filter(isQuery)
          .select(col("vec_id").as("q_id"), explode(probeArr).as("pb"))
        val cand = broadcast(probes)
          .join(bucketed.select(col("vec_id").as("n_id"), col("b0").as("cb")),
            col("pb") === col("cb") && col("n_id") =!= col("q_id"))
          .select(col("q_id"), col("n_id"))
        report("multi_probe", bits, probeDepth, cand)
      }
    }

    // trained-IVF probe recall (the q_ivf_train / IvfRepo index): assign
    // the corpus to pinned-seed Lloyd centroids, then for each query probe
    // its nearest `nprobe` centroids and take the clusters' members as
    // candidates — the classic IVF trade: fewer probes miss neighbors that
    // fall just across a Voronoi boundary, more probes buy them back for
    // ~nprobe/k of the corpus each. The OPERATING-POINT SWEEP the serving
    // path needs: k (centroid count) ∈ {8, 32, √n} × nprobe ∈ {1,2,4,8}.
    // In the emitted rows "bits" carries k and "depth" carries nprobe;
    // mean_cand_per_q is the scan fraction paid (×n). SCALE.md digests
    // the sweep into "which (k, nprobe) reaches ≥0.9 recall@5".
    val sqrtN = math.max(8, math.round(math.sqrt(n.toDouble)).toInt)
    for (kk <- Seq(8, 32, sqrtN).distinct) {
      val centT = graft.ops.Ivf.train(base.select(col("vec_id"), col("embedding")), kk, 3)
        .localCheckpoint(true)
      val asg = graft.ops.Ivf.assign(base.select(col("vec_id"), col("embedding")), centT)
        .select(col("vec_id"), col("centroid_id")).localCheckpoint(true)
      val cW = Window.partitionBy(col("q_id")).orderBy(col("csim").desc, col("centroid_id"))
      val qCent = broadcast(qSide)
        .crossJoin(broadcast(centT.select(col("centroid_id"), col("c_emb"),
          sqrt(VectorFns.dotHof(col("c_emb"), col("c_emb"))).as("cn"))))
        .withColumn("csim", VectorFns.dotHof(col("qe"), col("c_emb")) / (col("qn") * col("cn")))
        .withColumn("__rn", row_number().over(cW))
        .localCheckpoint(true)
      for (p <- Seq(1, 2, 4, 8).filter(_ <= kk)) {
        val probes = qCent.filter(col("__rn") <= p).select(col("q_id"), col("centroid_id"))
        val cand = broadcast(probes)
          .join(asg.select(col("vec_id").as("n_id"), col("centroid_id")), Seq("centroid_id"))
          .filter(col("n_id") =!= col("q_id"))
          .select(col("q_id"), col("n_id"))
        report("ivf_trained", kk, p, cand)
      }
    }
    spark.stop()
  }
}
