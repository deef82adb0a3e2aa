package graft.streaming

import graft.SparkSuite
import graft.repo.TableRepo

/** Stream-static enrichment refresh contracts: the native join snapshots
  * the dimension at query start; the foreachBatch form sees per-batch
  * dimension updates.
  */
class StreamEnrichSpec extends SparkSuite {
  import spark.implicits._

  test("perBatch enrichment picks up dimension upserts between micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dim = new TableRepo(scratch("enrich-dim"), spark, keyCols = Seq("k"))
    dim.extend(Seq(("u1", "bronze"), ("u2", "silver")).toDF("k", "tier"))

    val ms = MemoryStream[(String, Long)] // (k, amount)
    val stream = ms.toDF().select($"_1".as("k"), $"_2".as("amount"))
    val out = scala.collection.mutable.ArrayBuffer[(String, Long, String)]()
    val q = StreamEnrich.perBatch(stream, dim, Seq("k"), scratch("enrich-ckpt"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)) { b =>
      out.synchronized {
        out ++= b.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      }
    }
    ms.addData(("u1", 10L), ("u3", 30L))
    q.processAllAvailable()
    // u3 unknown in batch 1; upsert the dim between batches
    dim.replaceRecords(Seq(("u1", "gold"), ("u3", "bronze")).toDF("k", "tier"))
    ms.addData(("u1", 11L), ("u3", 31L))
    q.processAllAvailable()
    q.stop()
    val got = out.synchronized(out.toSet)
    assert(got == Set(
      ("u1", 10L, "bronze"), ("u3", 30L, null), // batch 1: pre-upsert dim
      ("u1", 11L, "gold"), ("u3", 31L, "bronze") // batch 2: refreshed dim
    ), s"got $got")
  }

  test("snapshot joined() enriches against the dim as of query start") {
    val dim = new TableRepo(scratch("enrich-snap-dim"), spark, keyCols = Seq("k"))
    dim.extend(Seq(("u1", "bronze")).toDF("k", "tier"))
    val src = scratch("enrich-snap-src")
    Seq(("u1", 1L), ("u2", 2L)).toDF("k", "amount").write.parquet(src)
    val stream = spark.readStream.schema("k STRING, amount LONG").parquet(src)
    val q = StreamEnrich.joined(stream, dim, Seq("k"))
      .writeStream.outputMode("append").format("memory").queryName("enr_snap").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("enr_snap").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set(("u1", 1L, "bronze"), ("u2", 2L, null)))
  }
}
