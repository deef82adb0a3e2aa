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

  test("codeK equals a bit-loop interleave model for k=2..6 on a seeded sweep") {
    // dimension d of k must land at bit positions i*k + d of the
    // SIGN-BIASED value (window's top bit flipped — offset binary, so
    // negatives interleave below positives) — asserted bit-for-bit
    // against a straight loop, through codegen, for BOTH construction
    // paths (k=2 native ZOrderExpr, k>2 composed shift/and/or), on
    // positive AND negative inputs
    import spark.implicits._
    def model(vals: Seq[Long], k: Int): Long = {
      val bitsPer = 64 / k
      var out = 0L
      for (d <- 0 until k; i <- 0 until bitsPer)
        out |= (((vals(d) ^ (1L << (bitsPer - 1))) >> i) & 1L) << (i * k + d)
      out ^ java.lang.Long.MIN_VALUE // signed-sortable (see ZOrder.morton)
    }
    val rng = new scala.util.Random(2718)
    for (k <- 2 to 6) {
      val bitsPer = 64 / k
      val rows = (1 to 200).map { _ =>
        val m = 1L << math.min(bitsPer, 62)
        val v = rng.nextLong().abs % m
        Seq.fill(k)(if (rng.nextBoolean()) v else -(v % (m >> 1)))
      } ++ Seq(Seq.fill(k)(0L), Seq.fill(k)((1L << bitsPer) - 1), Seq.fill(k)(-1L))
      val df = rows.toDF("arr")
      val cols = (0 until k).map(d => col("arr").getItem(d))
      df.select(ZOrder.codeK(cols).as("z"), col("arr")).collect().foreach { r =>
        assert(r.getLong(0) == model(r.getSeq[Long](1), k),
          s"k=$k mismatch for ${r.getSeq[Long](1)}")
      }
    }
    // the point of the bias + final flip: under the SIGNED long sort
    // Spark applies to the z column, negatives order below non-negatives
    // in EITHER dimension — raw two's-complement bits would invert that
    // and split clustering at 0
    assert(ZOrder.morton(-5L, 7L) < ZOrder.morton(3L, 7L))
    assert(ZOrder.morton(-1L, 0L) < ZOrder.morton(0L, 0L))
    assert(ZOrder.morton(0L, -1L) < ZOrder.morton(0L, 0L))
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

  test("3-D z-order files cover compact 3-D boxes; each dimension prunes") {
    // 32x32x32 grid, 21 bits per dimension (k=3 path: composed shifts)
    val g3 = spark.range(32768).select(col("id"),
      (col("id") % 32).as("x"),
      ((col("id") / 32) % 32).cast("long").as("y"),
      (col("id") / 1024).cast("long").as("z"))
    val repo = new TableRepo(scratch("zorder3"), spark,
      maxRecordsPerFile = 2048, zOrderCols = Seq("x", "y", "z"))
    repo.extend(g3)
    val bs = FileStats.columnRanges(spark, repo.paths, Seq("x", "y", "z")).map { case (p, m) =>
      def rng(c: String): (Long, Long) = m(c) match {
        case Some((lo, hi)) => (lo.asInstanceOf[Number].longValue, hi.asInstanceOf[Number].longValue)
        case None           => fail(s"file $p has no usable stats for $c")
      }
      (rng("x"), rng("y"), rng("z"))
    }
    assert(bs.size >= 8, s"expected ~16 rolled files, got ${bs.size}")
    // the 8x8x8 corner octant (1.6% of rows) is one contiguous Morton
    // range: it must touch a small fraction of the files
    val corner = bs.count { case ((xlo, _), (ylo, _), (zlo, _)) =>
      xlo <= 7 && ylo <= 7 && zlo <= 7 }
    val cornerHit = bs.count { case ((xlo, xhi), (ylo, yhi), (zlo, zhi)) =>
      !(xhi < 0 || xlo > 7 || yhi < 0 || ylo > 7 || zhi < 0 || zlo > 7) }
    assert(cornerHit <= math.max(2, bs.size / 4),
      s"corner octant touches $cornerHit of ${bs.size} 3-D z-order files ($corner contain it)")
    // every dimension individually prunes something (each owns interleaved bits)
    for ((dim, get) <- Seq[(String, ((Long, Long), (Long, Long), (Long, Long)) => (Long, Long))](
        ("x", (a, _, _) => a), ("y", (_, b, _) => b), ("z", (_, _, c) => c))) {
      val slab = bs.count { b => val (lo, hi) = get.tupled(b); !(hi < 0 || lo > 7) }
      assert(slab < bs.size, s"$dim-slab touches all ${bs.size} files")
    }
    // and results are unchanged
    val pred = col("x") <= 7 && col("y") <= 7 && col("z") <= 7
    assertSameRows(
      repo.getFullDf.filter(pred).select(col("id")).orderBy(col("id")),
      g3.filter(pred).select(col("id")).orderBy(col("id")))
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
