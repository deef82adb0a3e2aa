package graft.ops

import graft.SparkSuite
import graft.repo.TableRepo

/** The incremental contract behind q_incr_dedup_exact: the fingerprint
  * index outlives a round and absorbs each batch's SURVIVORS — so a later
  * batch dedups against earlier batches' kept docs, duplicates never
  * enter the index, and earliest-wins precedence holds across the
  * index/batch candidate union.
  */
class IncrExactSpec extends SparkSuite {
  import spark.implicits._

  test("index dups, batch-internal dups, and earliest-wins precedence") {
    val index = new TableRepo(scratch("incr-exact"), spark)
    Queries.incrExactSeed(index,
      Seq((10L, "alpha beta gamma"), (20L, "delta epsilon zeta")).toDF("doc_id", "text"))
    // 101: dup of corpus 10 (normalization: case + whitespace collapse);
    // 102 unique; 103: dup of batch 102; 104: dup of BOTH corpus 10 and
    // batch 101 -> earliest overall is corpus 10, origin 'index'
    val batch = Seq(
      (101L, "  Alpha   BETA gamma "), (102L, "eta theta iota"),
      (103L, "eta  THETA iota"), (104L, "alpha beta gamma")).toDF("doc_id", "text")
    val r = Queries.incrExactRound(index, batch).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2))).toSet
    assert(r == Set((101L, 10L, "index"), (103L, 102L, "batch"), (104L, 10L, "index")), r.toString)
  }

  test("only survivors extend the index; the next batch dedups against them") {
    val index = new TableRepo(scratch("incr-exact-2"), spark)
    Queries.incrExactSeed(index, Seq((10L, "alpha beta gamma")).toDF("doc_id", "text"))
    Queries.incrExactRound(index,
      Seq((101L, "alpha beta gamma"), (102L, "eta theta iota")).toDF("doc_id", "text"))
    // 101 was a duplicate -> must NOT be in the index; survivor 102 must be
    assert(index.getFullDf.select("doc_id").as[Long].collect().toSet == Set(10L, 102L))
    val r2 = Queries.incrExactRound(index,
      Seq((201L, "ETA theta  iota")).toDF("doc_id", "text")).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2))).toSet
    assert(r2 == Set((201L, 102L, "index")), r2.toString)
  }
}
