package graft.ops

import graft.SparkSuite
import graft.repo.TableRepo

/** The incremental contract behind q_incr_dedup: the band index OUTLIVES a
  * round, so a later batch must be deduplicated against EARLIER BATCHES,
  * not just the seed corpus — that is what distinguishes the persisted
  * index from a one-shot pairwise join.
  */
class IncrDedupSpec extends SparkSuite {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog tonight"

  test("a later batch dedups against an earlier batch via the extended index") {
    val index = new TableRepo(scratch("incr-idx"), spark)
    val corpus = Seq((0L, "completely unrelated corpus text about maritime law"))
      .toDF("doc_id", "text")
    val b1 = Seq((101L, base)).toDF("doc_id", "text")
    // one token changed: high Jaccard vs doc 101, none vs the corpus
    val b2 = Seq((202L, base.replace("dog", "cat"))).toDF("doc_id", "text")
    val everything = corpus.unionByName(b1).unionByName(b2)

    Queries.incrDedupSeed(index, corpus)
    val r1 = Queries.incrDedupRound(index, b1, everything).collect()
    assert(r1.isEmpty, s"batch 1 matches nothing in the seed corpus: ${r1.toSeq}")

    val r2 = Queries.incrDedupRound(index, b2, everything).collect()
    assert(r2.length == 1 && r2(0).getLong(0) == 202L && r2(0).getLong(1) == 101L,
      s"batch 2 must be flagged against BATCH 1, not the corpus: ${r2.toSeq}")
    assert(r2(0).getDouble(2) >= 0.4)
  }

  test("duplicates arriving in ONE batch see each other; the earlier doc wins") {
    // round-9 contract change: the round emits batch-internal band
    // collisions too (the exact twin's first-occurrence window, in band
    // form) — without it, a streaming micro-batch containing both copies
    // would admit both forever (StreamIncrNearDup surfaces this).
    val index = new TableRepo(scratch("incr-self"), spark)
    Queries.incrDedupSeed(index, Seq((0L, "seed text unlike anything else here")).toDF("doc_id", "text"))
    val batch = Seq((11L, base), (12L, base.replace("dog", "cat"))).toDF("doc_id", "text")
    val r = Queries.incrDedupRound(index, batch, batch).collect()
    assert(r.length == 1 && r(0).getLong(0) == 12L && r(0).getLong(1) == 11L,
      s"the later same-batch doc must be flagged against the earlier one: ${r.toSeq}")
    // the one-sided (a.doc_id > b.doc_id) candidate join means the
    // EARLIER doc is never flagged — keep-first, exactly like the
    // upstream q_dedup_* jobs and the exact twin
  }
}
