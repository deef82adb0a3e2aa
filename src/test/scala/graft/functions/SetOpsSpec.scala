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
