package graft.repo

import org.apache.hadoop.fs.Path

import graft.SparkSuite

/** Footer-embedded repo metadata: every data file carries the KV pairs
  * in its parquet footer (foreign-reader visible), Spark's own schema
  * key survives the rewrite, and the data round-trips bit-identically.
  */
class ParquetMetaSpec extends SparkSuite {
  import spark.implicits._

  /** Simulate the marker a crashed embed of THIS process leaves (an
    * embed that threw mid-loop): it carries our own token, so repair is
    * immediate. Foreign-marker behavior is FooterMarkerSpec territory.
    */
  private def writeOwnMarker(fs: org.apache.hadoop.fs.FileSystem, marker: Path): Unit = {
    val out = fs.create(marker, true)
    try out.write(TableRepo.ProcessToken.getBytes("UTF-8"))
    finally out.close()
  }

  test("embedMetadata lands KV in every leaf file; data round-trips") {
    val repo = new TableRepo(scratch("pmeta"), spark,
      groupCols = Seq("g"), maxRecordsPerFile = 40)
    val df = (1L to 200L).map(i => (s"g${i % 3}", i, s"v$i")).toDF("g", "id", "payload")
    repo.extend(df)
    val before = repo.getFullDf.collect().map(_.toString).sorted.toSeq

    repo.setMetadata(Map("owner" -> "graft", "table_version" -> "7"))
    repo.embedMetadata()

    val conf = spark.sparkContext.hadoopConfiguration
    assert(repo.paths.size > 3, "need several files for the test to mean anything")
    repo.paths.foreach { p =>
      val kv = ParquetMeta.keyValueMeta(conf, new Path(p))
      assert(kv.get("graft.owner").contains("graft"), s"missing embedded KV in $p")
      assert(kv.get("graft.table_version").contains("7"))
      assert(kv.contains("org.apache.spark.sql.parquet.row.metadata"),
        "Spark's schema KV must survive the footer rewrite")
    }
    val after = repo.getFullDf.collect().map(_.toString).sorted.toSeq
    assert(after == before, "row-group byte copy must not change the data")
    // the rename-to-backup swap must clean up after itself on success
    val leftovers = new java.io.File(repo.root).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).map(_.getName)
      .filter(n => n.endsWith(".kvtmp") || n.endsWith(".kvbak"))
    assert(leftovers.isEmpty, s"swap leftovers: ${leftovers.toSeq}")
  }

  test("embed survives a stale backup left by a prior crash") {
    val repo = new TableRepo(scratch("pmeta3"), spark)
    repo.extend(Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val p = new Path(repo.paths.head)
    // simulate a crash between the two swap renames: the backup name is
    // taken when the next embed stages the file aside
    val bak = new Path(p.getParent, s".${p.getName}.kvbak")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(bak, true); out.write("junk".getBytes); out.close()
    repo.setMetadata(Map("k" -> "v"))
    repo.embedMetadata()
    val kv = ParquetMeta.keyValueMeta(spark.sparkContext.hadoopConfiguration, p)
    assert(kv.get("graft.k").contains("v"))
    assert(!fs.exists(bak), "the stale backup must be replaced, then cleaned")
  }

  test("a crashed footer rewrite's orphaned backup is restored by the next mutating op") {
    val repo = new TableRepo(scratch("pmeta-restore"), spark, maxRecordsPerFile = 40)
    repo.extend((1L to 100L).map(i => (i, s"v$i")).toDF("id", "payload"))
    assert(repo.paths.size >= 2)
    repo.setMetadata(Map("owner" -> "graft"))
    repo.embedMetadata()
    val f = new Path(repo.paths.head)
    val bak = new Path(f.getParent, s".${f.getName}.kvbak")
    val fs = f.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // real crash shape: the data file exists only under the invisible
    // backup name AND the footer-rewrite marker is still up — embed
    // creates it before the first rewrite and clears it only after the
    // last backup is gone, so a crash anywhere in the loop leaves it
    assert(fs.rename(f, bak))
    val marker = new Path(s"${repo.root}/_graft_footer_rewrites")
    writeOwnMarker(fs, marker)
    repo.extend(Seq((1000L, "extra")).toDF("id", "payload")) // any mutating op repairs
    assert(repo.count() == 101, "restored backup rows plus the appended row")
    assert(!fs.exists(bak))
    assert(fs.exists(f), "the original name is back")
    assert(!fs.exists(marker), "marker cleared after a clean restore")
  }

  test("a crashed footer rewrite is repaired by read-only consumers too") {
    // before the read-path gate, the staged-aside file's rows went
    // silently missing from getFullDf/count/paths INDEFINITELY — until
    // some mutating op happened to run
    val repo = new TableRepo(scratch("pmeta-read-repair"), spark, maxRecordsPerFile = 40)
    repo.extend((1L to 100L).map(i => (i, s"v$i")).toDF("id", "payload"))
    repo.setMetadata(Map("owner" -> "graft"))
    repo.embedMetadata()
    val fs = new Path(repo.root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(s"${repo.root}/_graft_footer_rewrites")
    assert(!fs.exists(marker), "a clean embed clears its marker")
    val f = new Path(repo.paths.head)
    val bak = new Path(f.getParent, s".${f.getName}.kvbak")
    assert(fs.rename(f, bak))
    writeOwnMarker(fs, marker)
    assert(repo.count() == 100, "a pure read restores the orphaned backup")
    assert(fs.exists(f) && !fs.exists(bak))
    assert(!fs.exists(marker), "the read's repair clears the marker")
  }

  test("a crashed footer rewrite is repaired by the pruned probe read too (readWhereIn)") {
    import spark.implicits._
    val repo = new TableRepo(scratch("pmeta-probe-repair"), spark, maxRecordsPerFile = 40)
    repo.extend((1L to 100L).map(i => (i, s"v$i")).toDF("id", "payload"))
    repo.setMetadata(Map("owner" -> "graft"))
    repo.embedMetadata()
    val fs = new Path(repo.root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val f = new Path(repo.paths.head)
    val bak = new Path(f.getParent, s".${f.getName}.kvbak")
    assert(fs.rename(f, bak))
    val marker = new Path(s"${repo.root}/_graft_footer_rewrites")
    writeOwnMarker(fs, marker)
    // the incremental-dedup probe path: every needle must hit even when
    // its row sat in the staged-aside file
    val hits = repo.readWhereIn((1L to 100L).toDF("id"), "id").count()
    assert(hits == 100, s"pruned probe must see the restored rows, got $hits")
    assert(fs.exists(f) && !fs.exists(bak) && !fs.exists(marker))
  }

  test("embed merges with existing KV, extra wins on collision") {
    val repo = new TableRepo(scratch("pmeta2"), spark)
    repo.extend(Seq((1L, "a")).toDF("id", "s"))
    repo.setMetadata(Map("k" -> "v1"))
    repo.embedMetadata()
    repo.setMetadata(Map("k" -> "v2"))
    repo.embedMetadata()
    val conf = spark.sparkContext.hadoopConfiguration
    val kv = ParquetMeta.keyValueMeta(conf, new Path(repo.paths.head))
    assert(kv.get("graft.k").contains("v2"))
  }
}
