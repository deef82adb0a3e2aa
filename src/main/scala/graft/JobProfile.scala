package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Throwaway diagnostic: per-query Spark job census (count + per-job wall
  * time + call site) plus the driver-side gap (wall − sum(job wall)) for
  * targeted perf work. Not part of the driver contract.
  *
  * Usage: runMain graft.JobProfile <queryName> [sfDir] [reps] [cpus]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val qName = args.headOption.getOrElse("q_incr_dedup")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = if (args.length > 3) args(3) else sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.Vector[(Int, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        // callSite.short names the API entry (e.g. "parquet at X:123");
        // the last stage's name is the fallback for internal jobs
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        val stage = js.stageInfos.lastOption.map(_.name).getOrElse("?")
        val nTasks = js.stageInfos.map(_.numTasks).sum
        jobs.put(js.jobId, (js.time,
          f"stages=${js.stageInfos.size} tasks=$nTasks%3d  ${if (site.nonEmpty) site else stage}"))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, desc) = jobs.getOrDefault(je.jobId, (je.time, "?"))
        done.add((je.jobId, je.time - t0, desc))
      }
    })
    val fn = SparkEntry.queries(qName)
    for (r <- 1 to reps) {
      done.clear()
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      Thread.sleep(300) // let stragglers land
      import scala.jdk.CollectionConverters._
      val rows = done.asScala.toSeq.sortBy(_._1)
      val jobSec = rows.map(_._2).sum / 1e3
      println(f"== rep $r  wall=$wall%.2fs  jobs=${rows.size}  jobSec=$jobSec%.2f  driverGap=${wall - jobSec}%.2f")
      rows.foreach { case (id, ms, desc) =>
        println(f"  job $id%3d  $ms%6d ms  ${desc.take(110)}")
      }
    }
    spark.stop()
  }
}
