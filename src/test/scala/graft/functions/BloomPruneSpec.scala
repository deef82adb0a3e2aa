package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Bloom semi-join reduction: no false negatives (every true key
  * survives pruning), the pruned join equals the plain join exactly, and
  * the predicate runs inside codegen.
  */
class BloomPruneSpec extends SparkSuite {
  import spark.implicits._

  test("pruning keeps every true match; pruned join equals plain join") {
    val dim = (0L until 500L).filter(_ % 7 == 0).toDF("k")
    val fact = (0L until 5000L).map(i => (i % 500, i)).toDF("k", "payload")
    val pred = BloomPrune.filterFor(dim, "k", 1000L)(col("k"))
    val pruned = fact.filter(pred).join(dim, Seq("k"))
    val plain = fact.join(dim, Seq("k"))
    assertSameRows(pruned.orderBy("k", "payload"), plain.orderBy("k", "payload"))
    assert(pruned.count() > 0)
  }

  test("sketch has no false negatives over the inserted key set") {
    val dim = (0L until 2000L).map(_ * 13).toDF("k")
    val pred = BloomPrune.filterFor(dim, "k", 2000L)(col("k"))
    // every inserted key must probe true
    assert(dim.filter(pred).count() == 2000L)
  }

  test("an INTEGER probe column analyzes and probes correctly via the implicit cast") {
    // the build guard accepts int columns, so the probe must too —
    // ImplicitCastInputTypes widens the int probe into the long hash
    // domain; a validate-only inputTypes would reject it at analysis
    val dim = Seq(1, 3, 5).toDF("k") // IntegerType on both sides
    val pred = BloomPrune.filterFor(dim, "k", 10L)(col("k"))
    val hits = Seq(1, 2, 3, 4, 5, 6).toDF("k").filter(pred)
      .collect().map(_.getInt(0)).toSet
    assert(Set(1, 3, 5).subsetOf(hits), s"present keys must probe true: $hits")
  }

  test("a non-integral build column is refused — it would produce false negatives") {
    // Spark's stat.bloomFilter happily builds from strings via putBinary,
    // a different hash domain than the probe's mightContainLong: every
    // genuinely-present key would probe FALSE and the pre-join filter
    // would silently drop matching fact rows
    val dim = Seq("1", "2", "3").toDF("k")
    val ex = intercept[IllegalArgumentException] {
      BloomPrune.filterFor(dim, "k", 10L)(col("k").cast("long"))
    }
    assert(ex.getMessage.contains("false"), ex.getMessage)
  }

  test("predicate survives the codegen path (non-trivial projection)") {
    val dim = Seq(1L, 3L, 5L).toDF("k")
    val pred = BloomPrune.filterFor(dim, "k", 10L)(col("k") + 1L)
    val hits = spark.range(10).toDF("k").filter(pred).collect().map(_.getLong(0)).toSet
    // k+1 in sketch => k in {0,2,4} (plus possible fp, none at this size)
    assert(Set(0L, 2L, 4L).subsetOf(hits))
  }
}
