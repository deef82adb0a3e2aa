package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.repo.TableRepo

/** JSONL/CSV drops land under the repo's pinned-schema contract: pinned
  * columns cast, missing columns null-backfilled, unknown columns
  * dropped — a malformed drop cannot widen or corrupt the table.
  */
class FileSourcesSpec extends SparkSuite {
  import spark.implicits._

  private def writeText(name: String, content: String): String = {
    val dir = scratch(name)
    Files.createDirectories(Paths.get(dir))
    val f = Paths.get(dir, "part-0.txt")
    Files.writeString(f, content)
    f.toString
  }

  test("jsonl drop is harmonized to the pinned schema") {
    val root = scratch("src-jsonl-repo")
    val repo = new TableRepo(root, spark)
    // pin: (id LONG, name STRING, score DOUBLE)
    repo.extend(Seq((1L, "a", 1.5)).toDF("id", "name", "score"))
    // drop 1: score missing, extra column present
    val d1 = writeText("src-jsonl-1",
      """{"id": 2, "name": "b", "junk": "zzz"}
        |{"id": 3, "name": "c", "junk": "yyy"}
        |""".stripMargin)
    FileSources.ingest(repo, FileSources.jsonl(spark, d1))
    val out = repo.getFullDf
    assert(out.columns.sorted.toSeq == Seq("id", "name", "score"))
    assert(out.count() == 3)
    assert(out.filter(col("score").isNull).count() == 2, "missing col null-backfilled")
  }

  test("orc drop lands under the pinned-schema contract") {
    val root = scratch("src-orc-repo")
    val repo = new TableRepo(root, spark)
    repo.extend(Seq((1L, "a", 1.5)).toDF("id", "name", "score"))
    // ORC drop with an extra column and a missing one
    val orcDir = scratch("src-orc-data")
    Seq((2L, "b", "junk2"), (3L, "c", "junk3")).toDF("id", "name", "extra")
      .write.mode("overwrite").orc(orcDir)
    FileSources.ingest(repo, FileSources.orc(spark, orcDir))
    val out = repo.getFullDf
    assert(out.columns.sorted.toSeq == Seq("id", "name", "score"))
    assert(out.count() == 3)
    assert(out.filter(col("score").isNull).count() == 2, "missing col null-backfilled")
    assert(out.filter(col("id") === 3L).select("name").head().getString(0) == "c")
  }

  test("csv drop casts to pinned types and drops unknown columns") {
    val root = scratch("src-csv-repo")
    val repo = new TableRepo(root, spark)
    repo.extend(Seq((1L, 10.0)).toDF("id", "v"))
    // CSV strings + an unknown column; id arrives as string, v as string
    val d1 = writeText("src-csv-1",
      """id,v,extra
        |2,2.5,x
        |3,3.25,y
        |""".stripMargin)
    val schema = StructType(Seq(StructField("id", StringType),
      StructField("v", StringType), StructField("extra", StringType)))
    FileSources.ingest(repo, FileSources.csv(spark, d1, Some(schema)))
    val out = repo.getFullDf
    assert(out.schema("id").dataType == LongType)
    assert(out.schema("v").dataType == DoubleType)
    assert(out.count() == 3)
    assert(out.agg(sum(col("v"))).head().getDouble(0) == 15.75)
  }
}
