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
    val texts = new TableRepo(scratch("incr-txt"), spark, clusterCols = Seq("doc_id"))
    val corpus = Seq((0L, "completely unrelated corpus text about maritime law"))
      .toDF("doc_id", "text")
    val b1 = Seq((101L, base)).toDF("doc_id", "text")
    // one token changed: high Jaccard vs doc 101, none vs the corpus
    val b2 = Seq((202L, base.replace("dog", "cat"))).toDF("doc_id", "text")

    Queries.incrDedupSeed(index, texts, corpus)
    val r1 = Queries.incrDedupRound(index, texts, b1).collect()
    assert(r1.isEmpty, s"batch 1 matches nothing in the seed corpus: ${r1.toSeq}")

    val r2 = Queries.incrDedupRound(index, texts, b2).collect()
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
    val texts = new TableRepo(scratch("incr-self-txt"), spark, clusterCols = Seq("doc_id"))
    Queries.incrDedupSeed(index, texts, Seq((0L, "seed text unlike anything else here")).toDF("doc_id", "text"))
    val batch = Seq((11L, base), (12L, base.replace("dog", "cat"))).toDF("doc_id", "text")
    val r = Queries.incrDedupRound(index, texts, batch).collect()
    assert(r.length == 1 && r(0).getLong(0) == 12L && r(0).getLong(1) == 11L,
      s"the later same-batch doc must be flagged against the earlier one: ${r.toSeq}")
    // the one-sided (a.doc_id > b.doc_id) candidate join means the
    // EARLIER doc is never flagged — keep-first, exactly like the
    // upstream q_dedup_* jobs and the exact twin
  }

  test("the pruned verify reads dup_of texts from a strict FILE SUBSET of the text repo") {
    import org.apache.spark.sql.functions.col
    val index = new TableRepo(scratch("incr-prune-idx"), spark,
      maxRecordsPerFile = 500, clusterCols = Seq("bh"))
    val texts = new TableRepo(scratch("incr-prune-txt"), spark,
      maxRecordsPerFile = 20, clusterCols = Seq("doc_id"))
    val words = Array("maritime", "quantum", "culinary", "orbital", "baroque", "glacial", "nomadic")
    val corpus = (0L until 200L).map { i =>
      (i, s"document $i cares chiefly about ${words((i % 7).toInt)} themes " +
        s"while ranking ${i * 31 % 97} and ${i * 17 % 89} concerns near milepost ${i * 13 % 101}")
    }.toDF("doc_id", "text")
    Queries.incrDedupSeed(index, texts, corpus)
    assert(texts.nFiles >= 5, s"need many clustered text files, got ${texts.nFiles}")

    // one near-dup of doc 3, one novel doc: the candidate set is tiny,
    // so the verify's candidate-pruned readWhereIn must touch only the
    // files whose doc_id footer range covers the needles — the round-10
    // contract that verify scan cost follows candidates, not corpus
    val dup3 = corpus.filter(col("doc_id") === 3L).head().getString(1) + " again"
    val batch = Seq((501L, dup3),
      (502L, "entirely novel text about subjects no corpus document mentions at all")
    ).toDF("doc_id", "text")
    val (cand, _) = Queries.incrNearCandAndBands(index, batch, pruned = true)
    val dupIds = cand.select(col("dup_of").as("doc_id")).distinct()
    assert(dupIds.count() >= 1, "the near-dup must generate at least one candidate")
    val scanned = texts.prunedFilesFor(dupIds, "doc_id")
    assert(scanned.nonEmpty && scanned.size < texts.nFiles,
      s"pruned verify read must touch a strict subset: ${scanned.size} of ${texts.nFiles}")
    // and the full pruned round still flags exactly the near-dup
    val r = Queries.incrDedupRoundPruned(index, texts, batch).collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSet == Set((501L, 3L)), r.toSeq.toString)
  }
}
