package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Components, Queries}

/** Throwaway diagnostic for the min-label CC round count (VERDICT r20
  * item 8): how many propagation rounds do the dup-cluster pair graphs
  * actually need at a given SF, and WHY — per-round changed-row counts
  * plus the label-graph shape (component count/size, and the eccentricity
  * bound the doubling schedule implies). Not part of the driver contract.
  *
  * Usage: runMain graft.CcStudy [sfDir] [cpus]
  */
object CcStudy {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = if (args.length > 1) args(1) else sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pairSets = Seq(
      "doc_dup_pairs" -> Queries.docDupPairs(spark, dir)
        .select(col("id_a"), col("id_b")),
      "emb_dup_pairs" -> Queries.embDupPairs(spark, dir, bits = Some(8)))
    for ((name, pairs) <- pairSets) {
      val p = pairs.localCheckpoint(true)
      val n = p.count()
      val (labels, rounds) = Components.minLabelWithRounds(p,
        onRound = (r, chg) => println(s"   $name round $r: changed=$chg"))
      val l = labels.localCheckpoint(true)
      val comps = l.groupBy(col("cluster_id")).count()
        .agg(count(lit(1)).as("n_comps"), max(col("count")).as("max_size"),
          avg(col("count")).as("avg_size"))
        .collect()(0)
      println(f"== $name: pairs=$n rounds=$rounds components=${comps.getLong(0)} " +
        f"max_size=${comps.getLong(1)} avg_size=${comps.getDouble(2)}%.2f")
    }
    spark.stop()
  }
}
