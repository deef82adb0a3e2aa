package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.SparkSuite
import graft.functions.SetOps

/** The prefix-filter join must be BIT-IDENTICAL to the naive all-pairs
  * join — 100% recall is the whole point (it backs exact-threshold
  * oracled queries), so the property is exhaustive equality against the
  * quadratic reference on randomized sets, not a recall ratio.
  */
class SetSimJoinSpec extends SparkSuite {

  private def naive(dd: org.apache.spark.sql.DataFrame, blockCols: Seq[String], t: Double) = {
    val sorted = dd.select(
      (col("id") +: blockCols.map(col) :+ SetOps.sortedSet(col("s")).as("s")): _*)
    val cond = (blockCols.map(c => col(s"a.$c") === col(s"b.$c")) :+
      (col("a.id") < col("b.id"))).reduce(_ && _)
    val inter = SetOps.intersectCount(col("a.s"), col("b.s"))
    sorted.as("a").join(sorted.as("b"), cond)
      .withColumn("jaccard", inter.cast(DoubleType) / (size(col("a.s")) + size(col("b.s")) - inter))
      .filter(col("jaccard") >= t)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("jaccard"))
  }

  /** Deterministic pseudo-random sets with planted near-dups. */
  private def corpus(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val rnd = new scala.util.Random(i / 3) // triples share a base set
      val base = Seq.fill(8 + rnd.nextInt(20))(rnd.nextLong() % 1000).distinct
      val jitter = new scala.util.Random(i)
      val set = base.filter(_ => jitter.nextDouble() > 0.15) ++
        Seq.fill(jitter.nextInt(4))(jitter.nextLong() % 1000)
      (i.toLong, s"b${i % 2}", set.distinct)
    }.toDF("id", "blk", "s")
  }

  test("prefix-filter join equals the all-pairs join at several thresholds") {
    val dd = corpus(90)
    for (t <- Seq(0.5, 0.6, 0.8)) {
      assertSameRows(
        SetSimJoin.jaccardPairs(dd, "id", "s", Nil, t).orderBy("id_a", "id_b"),
        naive(dd, Nil, t).orderBy("id_a", "id_b"))
    }
  }

  test("block columns restrict pairs to the same block") {
    val dd = corpus(60)
    assertSameRows(
      SetSimJoin.jaccardPairs(dd, "id", "s", Seq("blk"), 0.6).orderBy("id_a", "id_b"),
      naive(dd, Seq("blk"), 0.6).orderBy("id_a", "id_b"))
  }

  test("identical sets always pair, even single-element ones") {
    import spark.implicits._
    val dd = Seq(
      (1L, Seq(7L)), (2L, Seq(7L)),              // singletons, J = 1
      (3L, Seq(1L, 2L, 3L)), (4L, Seq(1L, 2L, 3L)),
      (5L, Seq(9L))                               // unpaired singleton
    ).toDF("id", "s")
    val got = SetSimJoin.jaccardPairs(dd, "id", "s", Nil, 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (3L, 4L)))
  }

  test("empty sets never pair (jaccard is null, not 1)") {
    import spark.implicits._
    val dd = Seq((1L, Seq.empty[Long]), (2L, Seq.empty[Long]), (3L, Seq(5L)))
      .toDF("id", "s")
    assert(SetSimJoin.jaccardPairs(dd, "id", "s", Nil, 0.5).count() == 0)
  }

  test("null elements are non-members: injecting one into every set changes nothing") {
    // the q_ngram_jaccard oracle-scale fixture's contract: a null slot
    // rides through sortedSet into the verify walk (exercising the
    // null-skip) but counts in neither the prefix length, the length
    // filter, nor the denominator — so the pair set and every jaccard
    // value are bit-identical to the null-free run. An all-null set
    // behaves like an empty one (no members, never pairs).
    import spark.implicits._
    val clean = corpus(60)
    val injected = clean.withColumn("s",
      concat(array(lit(null).cast("long")), col("s")))
    assertSameRows(
      SetSimJoin.jaccardPairs(injected, "id", "s", Seq("blk"), 0.6).orderBy("id_a", "id_b"),
      naive(clean, Seq("blk"), 0.6).orderBy("id_a", "id_b"))
    val allNull = Seq((1L, Seq[java.lang.Long](null, null)), (2L, Seq[java.lang.Long](null)))
      .toDF("id", "s")
    assert(SetSimJoin.jaccardPairs(allNull, "id", "s", Nil, 0.5).count() == 0)
  }
}
