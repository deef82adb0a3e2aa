package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Bounded-heap top-k aggregate: equals the window-rank formulation on a
  * seeded dataset (incl. duplicate values resolved by the tie column),
  * survives partial-aggregation merges across many partitions, and is
  * SQL-callable via graft_topk.
  */
class TopKAggSpec extends SparkSuite {
  import spark.implicits._

  private lazy val df = {
    val rng = new scala.util.Random(42)
    (1L to 2000L).map(i => (s"g${i % 7}", (rng.nextInt(50) * 0.5), i))
      .toDF("g", "v", "tie")
      .repartition(13) // force many partial buffers per group
  }

  private def viaWindow(k: Int) = {
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"tie")
    df.withColumn("rank", row_number().over(w)).filter($"rank" <= k)
      .select($"g", $"rank".cast("long"), $"v", $"tie")
  }

  private def viaAgg(k: Int) =
    df.groupBy($"g").agg(TopKAgg.topk($"v", $"tie", k).as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", ($"pos" + 1).cast("long").as("rank"),
        $"col.value".as("v"), $"col.tie".as("tie"))

  test("aggregate top-k equals window-rank top-k (duplicates + merges)") {
    for (k <- Seq(1, 5, 40)) {
      assertSameRows(viaAgg(k).orderBy("g", "rank"), viaWindow(k).orderBy("g", "rank"))
    }
  }

  test("k larger than the group returns the whole group sorted") {
    val out = viaAgg(5000)
    assert(out.count() == 2000L)
  }

  test("graft_topk is SQL-callable after extension registration") {
    graft.GraftExtensions.register(spark)
    df.createOrReplaceTempView("topk_in")
    val n = spark.sql(
      "SELECT g, graft_topk(v, tie, 3) AS top FROM topk_in GROUP BY g")
      .selectExpr("g", "inline(top)").count()
    assert(n == 21L) // 7 groups x 3
  }
}
