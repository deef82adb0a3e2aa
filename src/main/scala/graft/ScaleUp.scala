package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stress-corpus generator: replicate the sf0.1 documents table `k`
  * times (≈ sf1) with shifted ids and replica-salted tokens.
  *
  * The salt (`x<k>` prefixed to every whitespace token) makes token sets
  * DISJOINT across replicas, so the replicated corpus keeps the
  * generator's natural near-dup density — pairs live within a replica,
  * exactly `k`× the sf0.1 pair count — instead of the 100× blow-up that
  * verbatim copies would add (every doc would gain `k−1` exact twins).
  * That makes it the right input for measuring how the pair family's
  * runtime scales with corpus size at fixed density: the honest sf1
  * question. Blocking keys (lang, source) are left unchanged, so block
  * sizes DO grow `k`× — the prefix-filter candidate stage sees the full
  * scale-up, not `k` easy mini-problems.
  *
  * Usage: runMain graft.ScaleUp [srcDir] [outDir] [replicas]
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "target/sf1"
    val k = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Replica key stride: MUST be divisible by every modulus the bench
    // filters use (lcm of 3/4/8/10) so each `key % m` class scales
    // EXACTLY k x — 1e8 % 3 == 1 would rotate the mod-3 classes and the
    // %3-filtered stress subsets would not be k x replicas of sf0.1's.
    val Shift = 120000000L
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val reps = (0 until k).map { r =>
      docs.select(
        (col("doc_id") + lit(r.toLong * Shift)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"x$r" + "$1").as("text"),
        col("lang"), col("source"))
        // n_chars must track the SALTED text (each token grew by the "x<r>"
        // prefix) or the stress corpus silently breaks the n_chars ==
        // length(text) invariant every n_chars-consuming query relies on
        .withColumn("n_chars", length(col("text")).cast("long"))
    }.reduce(_ unionByName _)
    reps.repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")
    // Embeddings: per-replica deterministic sign flips — a diagonal ±1
    // matrix is orthogonal, so within-replica norms/cosines are EXACTLY
    // preserved (natural near-dup density per replica) while cross-replica
    // similarity is scrambled instead of the cosine-1.0 twin blow-up that
    // verbatim copies would create. Replica 0 keeps the originals.
    //
    // The flip pattern must be INJECTIVE in r: a linear rule like
    // (r*13 + j*7) mod 3 collapses to (r + j) mod 3, giving replicas
    // {1,4,7}, {2,5,8}, {3,6,9} identical flip vectors — bit-identical
    // copies of every source vector, i.e. exactly the cross-replica
    // cosine-1.0 twins the flips exist to prevent, silently densifying
    // the "fixed density" stress corpus. Murmur3 of (r, j) has no such
    // linear structure; any two replicas differ on ~half the components.
    val embs = spark.read.parquet(s"$src/embeddings.parquet")
    val embReps = (0 until k).map { r =>
      embs.select(
        (col("vec_id") + lit(r.toLong * Shift)).as("vec_id"),
        transform(col("embedding"), (x, j) =>
          when(pmod(hash(lit(r), j), lit(2)) === 0 && lit(r) =!= 0, -x).otherwise(x)
        ).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
    embReps.repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    // Keyed tables for the WRITE-path stress family (q_compact,
    // q_upsert_pruned*, q_sized_append…): replicate orders/lineitem with
    // key shifts that keep keys unique across replicas. The shift is a
    // multiple of 10/8/4/3 (1.2e8), so every `key % m` class the bench
    // queries filter on scales exactly k× — the same subset-shape at k×
    // rows, which is what a clean exponent needs.
    val orders = spark.read.parquet(s"$src/orders.parquet")
    (0 until k).map { r =>
      orders.withColumn("o_orderkey", col("o_orderkey") + lit(r.toLong * Shift))
    }.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite").parquet(s"$out/orders.parquet")
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    (0 until k).map { r =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(r.toLong * Shift))
    }.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    // Events for the sessionization/window stress family: shift event_id
    // AND user_id per replica but keep timestamps — k× distinct users over
    // the SAME time span. Per-user session structure is preserved exactly
    // (each replica user replays an original user's history), while
    // every tumbling/sliding time window sees k× the rows — the shape a
    // k×-traffic day actually has. ts reads as an ns BIGINT here
    // (nanosAsLong) and lands as INT64; every event query consumes
    // ts div 1000 (see Queries.eventsUs), so the µs arithmetic is
    // identical against both the real and the stress table.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$src/events.parquet")
    (0 until k).map { r =>
      ev.withColumn("event_id", col("event_id") + lit(r.toLong * Shift))
        .withColumn("user_id", col("user_id") + lit(r.toLong * Shift))
    }.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite").parquet(s"$out/events.parquet")
    println(s"wrote ${spark.read.parquet(s"$out/documents.parquet").count()} docs, " +
      s"${spark.read.parquet(s"$out/embeddings.parquet").count()} embeddings, " +
      s"${spark.read.parquet(s"$out/orders.parquet").count()} orders, " +
      s"${spark.read.parquet(s"$out/lineitem.parquet").count()} lineitem, " +
      s"${spark.read.parquet(s"$out/events.parquet").count()} events to $out")
    spark.stop()
  }
}
