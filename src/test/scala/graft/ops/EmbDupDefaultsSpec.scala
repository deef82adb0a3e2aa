package graft.ops

import scala.util.Random

import graft.SparkSuite
import graft.functions.VectorFns

/** Default-safe SRP width: when a caller does not pin `bits`, the
  * semantic-dedup entry points derive the bucket width from the corpus
  * size ([[VectorFns.srpBitsFor]]) — the occupancy-safe behavior is the
  * DEFAULT, not a documentation footnote. Oracled queries keep pinning
  * [[Queries.EmbDupBits]] so the DuckDB twin replays the identical cut.
  */
class EmbDupDefaultsSpec extends SparkSuite {
  import spark.implicits._

  test("unpinned width derives from corpus size; pinning overrides; floor holds") {
    // at or below the occupancy threshold (n <= 8 * 2^8 = 2048): floor
    assert(Queries.effEmbDupBits(1000L, None) == 8)
    assert(Queries.effEmbDupBits(2048L, None) == 8)
    // above it the derived width kicks in: 5000/8 = 625 -> ceil(log2) = 10
    assert(Queries.effEmbDupBits(5000L, None) == 10)
    assert(Queries.effEmbDupBits(5000L, None) == VectorFns.srpBitsFor(5000L))
    // 10x the corpus -> +~3 bits: occupancy stays ~constant
    assert(Queries.effEmbDupBits(50000L, None) == 13)
    // an explicit pin always wins (the oracled-query contract)
    assert(Queries.effEmbDupBits(5000L, Some(8)) == 8)
    // a pinned count is never evaluated (metadata count stays lazy)
    assert(Queries.effEmbDupBits(sys.error("must not count"), Some(8)) == 8)
  }

  test("the derived default drives the executed pipeline end-to-end") {
    val rng = new Random(7)
    def vec(): Array[Float] = Array.fill(64)(rng.nextFloat() - 0.5f)
    def near(v: Array[Float]): Array[Float] = v.map(x => x + 0.001f * math.signum(x))
    // 3000 vectors (> 2048: derived width 9 > floor 8) with 40 injected
    // twin pairs the pipeline must find at any width
    val base = (0 until 2920).map(i => (i.toLong, vec()))
    val twins = (0 until 40).map(i => ((3000 + i).toLong, near(base(i * 3)._2)))
    val dir = scratch("embdup-derived")
    (base ++ twins).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    def pairs(bits: Option[Int]): Set[(Long, Long)] =
      Queries.embDupPairs(spark, dir, bits).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val derived = pairs(None)
    val pinned8 = pairs(Some(8))
    // bits 9 extends the same plane family: equal 9-bit buckets imply
    // equal 8-bit buckets, so the derived (narrower-recall) cut is a
    // subset of the pinned-8 cut — and every injected twin survives both
    assert(derived.subsetOf(pinned8), s"derived cut not a subset: ${derived -- pinned8}")
    val expected = (0 until 40).map(i => (base(i * 3)._1, (3000 + i).toLong)).toSet
    assert(expected.subsetOf(derived),
      s"missing twins in the derived cut: ${expected -- derived}")
  }
}
