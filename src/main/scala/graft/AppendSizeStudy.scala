package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.repo.TableRepo

/** Micro-A/B of the exact-identity append's protocol overhead vs batch
  * size (round-19 ask #5): the r18 order-balanced A/B showed SMALL pure
  * appends pay 3-13% for the staging-dir write + per-file renames +
  * exact-manifest verdict, with the claim — asserted, not measured —
  * that the per-append metadata vanishes into the write job at real
  * batch sizes. This measures it: for batch sizes 1x/10x/100x (20 k /
  * 200 k / 2 M rows), round-robin reps of
  *
  *   raw    — the same harmonized frame written with a plain
  *            `df.write.mode("append").parquet(dir)` (the write job an
  *            append cannot avoid; the pre-r18 direct landing shape);
  *   extend — `TableRepo.extend` (staging write + N per-file renames +
  *            carry-chain verdict + schema/ledger metadata).
  *
  * overhead = extend_floor − raw_floor, reported absolute and as a
  * fraction of extend_floor. Floors (min over reps) per the repo's
  * bench discipline; the JSON line goes to stdout and
  * docs/ab_r19_append_sizes.json.
  */
object AppendSizeStudy {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)

    val sizes = sys.env.get("GRAFT_AB_SIZES")
      .map(_.split(",").toSeq.map(_.trim.toLong))
      .getOrElse(Seq(20000L, 200000L, 2000000L))
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "5").toInt
    val base = s"target/ab-append-${System.nanoTime()}"

    def batch(n: Long, salt: Int): DataFrame =
      spark.range(n).select(
        (col("id") * 1000 + salt).as("id"),
        (col("id") % 97).as("k"),
        concat(lit("value-"), col("id") % 10007).as("v"))

    // fixed file count per batch: the rename-loop length must not vary
    // with partitioning accidents, it IS the metadata being measured
    def prepared(n: Long, salt: Int): DataFrame = batch(n, salt).repartition(4)

    // one repo + one raw dir per size, seeded untimed so the timed reps
    // measure steady state (sidecar exists, dirs exist)
    val repos = sizes.map { n =>
      val r = new TableRepo(s"$base/repo-$n", spark)
      r.extend(prepared(1000, -1))
      n -> r
    }.toMap
    val rawDirs = sizes.map { n =>
      val d = s"$base/raw-$n"
      prepared(1000, -1).write.mode("append").parquet(d)
      n -> d
    }.toMap
    // third arm: appendExact's FILE SHAPE (fresh staging dir + per-file
    // renames into the target) without any repo metadata — separates the
    // protocol shape's cost from schema/lock/ledger bookkeeping
    val stagedDirs = sizes.map { n =>
      val d = s"$base/staged-$n"
      prepared(1000, -1).write.mode("append").parquet(d)
      n -> d
    }.toMap

    spark.range(1000).selectExpr("sum(id)").collect() // session warm
    val extendTimes = sizes.map(_ -> scala.collection.mutable.ArrayBuffer.empty[Double]).toMap
    val rawTimes = sizes.map(_ -> scala.collection.mutable.ArrayBuffer.empty[Double]).toMap
    val stagedTimes = sizes.map(_ -> scala.collection.mutable.ArrayBuffer.empty[Double]).toMap
    val filesPerBatch = scala.collection.mutable.Map.empty[Long, Int]

    def loadavg: Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val loads = scala.collection.mutable.ArrayBuffer.empty[Double]

    def countParquet(dir: String): Int = {
      val p = new org.apache.hadoop.fs.Path(dir)
      if (!fs.exists(p)) 0
      else fs.listStatus(p).count(s => !s.isDirectory && s.getPath.getName.endsWith(".parquet"))
    }

    // round-robin, raw/extend order alternating per rep (A-B-B-A style):
    // a load cycle degrades both arms instead of biasing one
    for (rep <- 1 to reps) {
      loads += loadavg
      sizes.foreach { n =>
        val salt = rep
        def runRaw(): Unit = {
          val t0 = System.nanoTime()
          prepared(n, salt).write.mode("append").parquet(rawDirs(n))
          rawTimes(n) += (System.nanoTime() - t0) / 1e9
        }
        def runExtend(): Unit = {
          // never-rewritten repos land in the legacy plain `data` dir
          val before = countParquet(s"${repos(n).root}/data")
          val t0 = System.nanoTime()
          repos(n).extend(prepared(n, salt))
          extendTimes(n) += (System.nanoTime() - t0) / 1e9
          filesPerBatch.getOrElseUpdate(n, countParquet(s"${repos(n).root}/data") - before)
        }
        def runStagedRaw(): Unit = {
          val staging = s"$base/stage-tmp-$n-$rep"
          val sp = new org.apache.hadoop.fs.Path(staging)
          val t0 = System.nanoTime()
          prepared(n, salt).write.mode("overwrite").parquet(staging)
          val uuid = java.util.UUID.randomUUID().toString.take(8)
          fs.listStatus(sp).filter(s => !s.isDirectory && s.getPath.getName.endsWith(".parquet"))
            .foreach { s =>
              fs.rename(s.getPath,
                new org.apache.hadoop.fs.Path(stagedDirs(n), s"$uuid-${s.getPath.getName}"))
            }
          fs.delete(sp, true)
          stagedTimes(n) += (System.nanoTime() - t0) / 1e9
        }
        rep % 3 match {
          case 1 => runRaw(); runStagedRaw(); runExtend()
          case 2 => runStagedRaw(); runExtend(); runRaw()
          case _ => runExtend(); runRaw(); runStagedRaw()
        }
      }
      System.gc()
    }
    loads += loadavg

    val perSize = sizes.map { n =>
      val ef = extendTimes(n).min; val rf = rawTimes(n).min; val sf = stagedTimes(n).min
      val over = ef - rf
      s""""$n":{"files_per_batch":${filesPerBatch.getOrElse(n, -1)},""" +
        s""""raw_floor":${f"$rf%.3f"},"staged_raw_floor":${f"$sf%.3f"},""" +
        s""""extend_floor":${f"$ef%.3f"},""" +
        s""""overhead_sec":${f"$over%.3f"},"overhead_pct":${f"${100.0 * over / ef}%.1f"},""" +
        s""""raw_reps":${rawTimes(n).map(t => f"$t%.3f").mkString("[", ",", "]")},""" +
        s""""staged_raw_reps":${stagedTimes(n).map(t => f"$t%.3f").mkString("[", ",", "]")},""" +
        s""""extend_reps":${extendTimes(n).map(t => f"$t%.3f").mkString("[", ",", "]")}}"""
    }.mkString("{", ",", "}")
    val line = s"""{"study":"append_sizes","reps":$reps,"shuffle_partitions":4,""" +
      s""""loads":${loads.map(l => f"$l%.2f").mkString("[", ",", "]")},"sizes":$perSize}"""
    Files.createDirectories(Paths.get("docs"))
    val outPath = sys.env.getOrElse("GRAFT_AB_OUT", "docs/ab_r19_append_sizes.json")
    Files.write(Paths.get(outPath), (line + "\n").getBytes("UTF-8"))
    println(line)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    spark.stop()
  }
}
