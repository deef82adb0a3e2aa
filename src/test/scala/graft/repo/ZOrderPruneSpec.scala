package graft.repo

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Footer-level evidence that the z-order write layout actually SKIPS:
  * every rolled file must cover a compact 2-D bounding box, so a 2-D box
  * predicate overlaps few files — while a lexicographic single-column
  * layout's files span the full trailing-column domain and can never
  * skip on it. q_zorder_prune oracles the read path; this spec proves
  * the layout property the read path's pruning depends on.
  */
class ZOrderPruneSpec extends SparkSuite {

  /** 100×100 uniform grid — every (x, y) cell exactly once. */
  private def grid = spark.range(10000).select(
    col("id"), (col("id") % 100).as("x"), (col("id") / 100).cast("long").as("y"))

  /** Per-file (xlo, xhi, ylo, yhi) from parquet footer stats. */
  private def boxes(repo: TableRepo): Seq[(Long, Long, Long, Long)] =
    FileStats.columnRanges(spark, repo.paths, Seq("x", "y")).map { case (p, m) =>
      def rng(c: String): (Long, Long) = m(c) match {
        case Some((lo, hi)) => (lo.asInstanceOf[Number].longValue, hi.asInstanceOf[Number].longValue)
        case None           => fail(s"file $p has no usable stats for $c")
      }
      val (xlo, xhi) = rng("x"); val (ylo, yhi) = rng("y")
      (xlo, xhi, ylo, yhi)
    }

  private def touches(bs: Seq[(Long, Long, Long, Long)],
      xq: (Long, Long), yq: (Long, Long)): Int =
    bs.count { case (xlo, xhi, ylo, yhi) =>
      !(xhi < xq._1 || xlo > xq._2 || yhi < yq._1 || ylo > yq._2)
    }

  test("z-order files cover compact 2-D boxes; a corner box query skips most files") {
    val repo = new TableRepo(scratch("zorder"), spark,
      maxRecordsPerFile = 1000, zOrderCols = Seq("x", "y"))
    repo.extend(grid)
    val bs = boxes(repo)
    assert(bs.size >= 8, s"expected ~10 rolled files, got ${bs.size}")
    // the 25×25 corner (6.25% of rows) lies inside one Morton quadrant —
    // a contiguous code range — so it must hit at most a couple of files
    val corner = touches(bs, (0L, 24L), (0L, 24L))
    assert(corner <= 3, s"corner box touches $corner of ${bs.size} z-order files")
    // a y-only slab is also skippable under z-order (y owns interleaved
    // bits), though less sharply than a 2-D box
    val slab = touches(bs, (0L, 99L), (0L, 24L))
    assert(slab < bs.size, s"y-slab touches all ${bs.size} z-order files")
  }

  test("lexicographic clustering cannot skip on the trailing dimension") {
    val lex = new TableRepo(scratch("zorder-lex"), spark,
      maxRecordsPerFile = 1000, clusterCols = Seq("x"))
    lex.extend(grid)
    val bs = boxes(lex)
    assert(bs.size >= 8, s"expected ~10 rolled files, got ${bs.size}")
    // every x-sorted file spans the full y domain: the y-slab prunes NOTHING
    assert(touches(bs, (0L, 99L), (0L, 24L)) == bs.size)
    // while the leading dimension still prunes (sanity: layout is x-sorted)
    assert(touches(bs, (0L, 24L), (0L, 99L)) < bs.size)
  }

  test("clustering never changes query results") {
    val repo = new TableRepo(scratch("zorder-rows"), spark,
      maxRecordsPerFile = 1000, zOrderCols = Seq("x", "y"))
    repo.extend(grid)
    val pred = col("x").between(10, 40) && col("y").between(60, 90)
    assertSameRows(
      repo.getFullDf.filter(pred).select(col("id"), col("x"), col("y")).orderBy(col("id")),
      grid.filter(pred).orderBy(col("id")))
  }
}
