package graft.repo

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Footer-stats contract: the driver-side shortcut (≤32 files) and the
  * distributed metadata job (>32 files — the 100k-file shape it exists
  * for) must report identical ranges, and ranges must actually bound the
  * file contents.
  */
class FileStatsSpec extends SparkSuite {
  import spark.implicits._

  test("distributed footer job (>32 files) agrees with the driver-side read") {
    val repo = new TableRepo(scratch("fstats"), spark,
      maxRecordsPerFile = 10, clusterCols = Seq("id"))
    repo.extend(spark.range(500).select(col("id")))
    val files = repo.paths
    assert(files.size > 32, s"need the distributed branch, got ${files.size} files")

    val dist = FileStats.columnRanges(spark, files, Seq("id")).toMap
    assert(dist.size == files.size)
    // the same files through the ≤32 driver branch must agree exactly
    val sub = files.take(8)
    val drv = FileStats.columnRanges(spark, sub, Seq("id")).toMap
    sub.foreach { f => assert(drv(f) == dist(f), s"branch divergence for $f") }

    // and the ranges are true bounds: re-reading each file confirms
    // min/max (clustered layout -> narrow disjoint slices)
    sub.foreach { f =>
      val Some((lo, hi)) = dist(f)("id"): @unchecked
      val actual = spark.read.parquet(f).agg(min($"id"), max($"id")).head()
      assert(lo == actual.getLong(0) && hi == actual.getLong(1),
        s"footer range ($lo,$hi) != data range $actual for $f")
    }
  }
}
