package graft.streaming

import graft.SparkSuite
import graft.repo.TableRepo

/** Streaming micro-batch ingestion into a repo: a file-source stream drains
  * into the same schema-harmonized append path as batch writes.
  */
class RepoSinkSpec extends SparkSuite {
  import spark.implicits._

  test("foreachBatch sink appends micro-batches into the repo") {
    val srcDir = scratch("stream-src")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(srcDir)
    val repo = new TableRepo(scratch("stream-repo"), spark)
    val stream = spark.readStream
      .schema("id LONG, v STRING")
      .parquet(srcDir)
    val q = RepoSink.start(stream, repo, scratch("stream-ckpt"))
    q.processAllAvailable()
    q.stop()
    assert(repo.count() == 2)
    assert(repo.getFullDf.columns.toSeq == Seq("id", "v"))
  }
}
