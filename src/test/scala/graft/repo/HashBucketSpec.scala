package graft.repo

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Contract from /root/reference/parquetranger/tests/test_core.py:270-280:
  * md5("e") % 3 == 1 (with "f","g" -> 2), md5("e") % 300 == 166.
  */
class HashBucketSpec extends SparkSuite {
  import spark.implicits._

  test("md5 bucket matches the reference's published values") {
    val df = Seq("e", "f", "g").toDF("C")
    val byKey = df.select($"C",
        HashBucket.bucket($"C", 3).as("b3"),
        HashBucket.bucket($"C", 300).as("b300"),
        HashBucket.bucketStr($"C", 300).as("s300"))
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(byKey("e") == ((1, 166, "166")))
    assert(byKey("f")._1 == 2)
    assert(byKey("g")._1 == 2)
  }

  test("bucketStr zero-pads to floor(log10(n))+1 digits (core.py:37-40)") {
    val got = Seq("x").toDF("C").select(HashBucket.bucketStr($"C", 1000).as("s"))
      .as[String].head()
    assert(got.length == 4)
  }

  test("non-string inputs hash via their string form (core.py:31)") {
    val a = Seq(5L).toDF("v").select(HashBucket.bucket($"v", 300)).first().getInt(0)
    val b = Seq("5").toDF("v").select(HashBucket.bucket($"v", 300)).first().getInt(0)
    assert(a == b)
  }

  test("bucketing routes a grouped repo write (HashPartitioner as group col)") {
    val df = Seq(("e", 0L), ("e", 1L), ("e", 2L), ("f", 3L), ("f", 4L), ("g", 5L))
      .toDF("C", "A")
    val repo = new TableRepo(scratch("hashroute"), spark, groupCols = Seq("__bucket"))
    repo.extend(df.withColumn("__bucket", HashBucket.bucketStr($"C", 3)))
    val dirs = new java.io.File(repo.root + "/data").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("__bucket=1", "__bucket=2"))
    assert(repo.getPartitionDf(Map("__bucket" -> "1")).count() == 3) // the three "e" rows
  }
}
