package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Merge-intersection count equals size(array_intersect) on seeded random
  * long sets (incl. empty and disjoint arrays), through codegen.
  */
class SetOpsSpec extends SparkSuite {
  import spark.implicits._

  test("intersectCount over sortedSet equals size(array_intersect)") {
    val rng = new scala.util.Random(11)
    val rows = (1 to 500).map { _ =>
      val a = Seq.fill(rng.nextInt(40))(rng.nextInt(60).toLong)
      val b = Seq.fill(rng.nextInt(40))(rng.nextInt(60).toLong)
      (a, b)
    }
    val df = rows.toDF("ra", "rb")
      .select(SetOps.sortedSet(col("ra")).as("a"), SetOps.sortedSet(col("rb")).as("b"))
    val bad = df
      .withColumn("fast", SetOps.intersectCount(col("a"), col("b")))
      .withColumn("ref", size(array_intersect(col("a"), col("b"))))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(bad == 0L)
  }

  test("null elements are not set members and never alias the zeroed slot") {
    // sort_array places nulls FIRST, and a naive getLong on a null slot
    // reads the zeroed backing word — a phantom 0 that both under-counts
    // (walks past real negatives) and over-counts (matches a real 0)
    val df = Seq(
      (Seq[java.lang.Long](null, -5L), Seq[java.lang.Long](-5L)), // phantom 0 would skip -5
      (Seq[java.lang.Long](null, 5L), Seq[java.lang.Long](0L, 5L)), // phantom 0 would match 0
      (Seq[java.lang.Long](null, null), Seq[java.lang.Long](null, 1L))
    ).toDF("ra", "rb")
      .select(SetOps.sortedSet(col("ra")).as("a"), SetOps.sortedSet(col("rb")).as("b"))
    val counts = df.select(SetOps.intersectCount(col("a"), col("b"))).collect().map(_.getInt(0))
    assert(counts.toSeq == Seq(1, 1, 0), s"got ${counts.toSeq}")
  }

  test("memberCount excludes null slots: the Jaccard denominator's size") {
    // a null survives array_distinct as one leading slot of the sorted
    // set, but it is NOT a member on either engine (DuckDB list_distinct
    // drops it before len); counting it would skew every denominator a
    // null-bearing set appears in. q_ngram_jaccard injects a null into
    // EVERY set so the sf0.01 DuckDB compare pins both this and the
    // count null-skip — the r18 stress-only bug is now oracle-covered.
    val df = Seq(
      Seq[java.lang.Long](null, 1L, 2L, 2L),
      Seq[java.lang.Long](null, null),
      Seq[java.lang.Long](3L, 4L)
    ).toDF("raw").select(SetOps.sortedSet(col("raw")).as("s"))
    val got = df.select(size(col("s")), SetOps.memberCount(col("s")))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(got.toSeq == Seq((3, 2), (1, 0), (2, 2)), s"got ${got.toSeq}")
  }

  test("an array<int> operand is an analysis-time error, never a silent 8-byte misread") {
    // the merge walk reads 8-byte slots; without declared inputTypes an
    // int array would read two packed ints as one garbage long and every
    // pairwise count would be silently wrong
    val df = Seq((Seq(1, 2, 3), Seq(2, 3, 4))).toDF("ra", "rb")
      .select(SetOps.sortedSet(col("ra")).as("a"), SetOps.sortedSet(col("rb")).as("b"))
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(SetOps.intersectCount(col("a"), col("b"))).head()
    }
    assert(ex.getMessage.contains("ARRAY<BIGINT>"), ex.getMessage)
    // an explicit element cast is the caller's sanctioned route
    val n = df.select(SetOps.intersectCount(
      col("a").cast("array<bigint>"), col("b").cast("array<bigint>"))).head().getInt(0)
    assert(n == 2)
  }

  test("empty and disjoint sets") {
    val df = Seq(
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 2L), Seq.empty[Long]),
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L))
    ).toDF("ra", "rb")
      .select(SetOps.sortedSet(col("ra")).as("a"), SetOps.sortedSet(col("rb")).as("b"))
    val counts = df.select(SetOps.intersectCount(col("a"), col("b"))).collect().map(_.getInt(0))
    assert(counts.toSeq == Seq(0, 0, 0))
  }
}
