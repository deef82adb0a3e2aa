package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** SRP candidate-volume study: counts the distinct same-bucket candidate
  * pairs the semantic-dedup stage generates at a given corpus size, for
  * (a) a FIXED bucket width and (b) the occupancy-scaled width
  * ([[VectorFns.srpBitsFor]]). The point on file in SCALE.md: at 10×
  * vectors, fixed bits grows candidates ~quadratically (occupancy grows
  * 10×, pairs per bucket 100×) while scaled bits holds mean occupancy —
  * candidate growth stays ~linear, which is what survives 100 TB.
  *
  * Usage: runMain graft.SrpStudy [sfDir] [tables]
  */
object SrpStudy {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tables = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = embs.count()
    val scaled = VectorFns.srpBitsFor(n, occupancy = 8)
    Seq("fixed" -> 8, "scaled" -> scaled).foreach { case (mode, bits) =>
      val bucketCols = (0 until tables).map(tb =>
        VectorFns.srpBucket(col("embedding"), bits, 64, tb).as(s"b$tb"))
      val e = embs.select(col("vec_id") +: bucketCols: _*).localCheckpoint(true)
      val cand = (0 until tables).map { tb =>
        e.as("a").join(e.as("b"),
            col(s"a.b$tb") === col(s"b.b$tb") && col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
      }.reduce(_.union(_)).dropDuplicates("va", "vb").count()
      println(s"""{"dir":"$dir","n":$n,"mode":"$mode","bits":$bits,"tables":$tables,"candidates":$cand}""")
    }
    spark.stop()
  }
}
