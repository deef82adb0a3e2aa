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

  test("unpinned bucketed read recomputes the bucket, never trusts dir-type inference") {
    // with the schema sidecar gone, Spark's partition-column inference would
    // read a zero-padded dir value like "042" as integer 42; a later merge
    // would re-coerce it to "42" and write a duplicate bucket dir. The
    // fallback must drop the inferred column and recompute via md5.
    val root = scratch("bucket-nopin")
    val layout = HashBucketLayout("k", numGroups = 300) // 3-wide zero-padded dirs
    val repo = new TableRepo(root, spark, keyCols = Seq("k"), hashBucket = Some(layout))
    repo.extend(Seq(("e", 1L), ("f", 2L), ("g", 3L)).toDF("k", "v"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$root/_graft_schema.json"))

    val foreign = new TableRepo(root, spark, keyCols = Seq("k"), hashBucket = Some(layout))
    assert(foreign.pinnedSchema.isEmpty) // genuinely on the fallback path
    assert(foreign.getBucketDf("166").select("k").as[String].collect().toSeq == Seq("e"))
    foreign.replaceRecords(Seq(("e", 10L)).toDF("k", "v"))
    assert(foreign.count() == 3) // upsert, not a duplicated key
    val dirs = new java.io.File(s"$root/data").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(dirs.forall(_.matches(".*=\\d{3}")), s"non-padded bucket dir leaked: $dirs")
  }
}
