package graft.ops

import graft.SparkSuite

/** The q_profile scale trade, pinned by measurement: `profile(approx =
  * true)` swaps the exact multi-distinct Expand for HLL++ sketches
  * (`approx_count_distinct` at rsd 0.02 — the default 0.05 measured a
  * 6.7% miss on sf0.1's user_id). The oracle/registry mode
  * stays exact — this spec is what makes the approx mode a SAFE drop-in
  * at 100 TB: per-column relative error under 5% against the exact
  * profile at the largest local corpus (sf0.1, ~10^5-10^6 distincts on
  * the high-cardinality columns — enough to exercise the sketch's
  * estimating regime, not just its exact-below-threshold path), with
  * null and row counts bit-identical (they never trade).
  */
class ProfileApproxSpec extends SparkSuite {

  test("approx profile lands within 5% of exact per column at sf0.1; nulls/rows exact") {
    val dir = "/root/testdata/sf0.1"
    assume(new java.io.File(s"$dir/events.parquet").exists(), s"$dir not generated")
    def byCol(approx: Boolean): Map[String, (Long, Long, Long)] =
      Queries.profile(spark, dir, approx = approx).collect()
        .map(r => r.getAs[String]("column_name") ->
          ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_nulls"), r.getAs[Long]("n_distinct"))))
        .toMap
    val exact = byCol(approx = false)
    val approx = byCol(approx = true)
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (c, (rows, nulls, nd)) =>
      val (aRows, aNulls, aNd) = approx(c)
      assert(aRows == rows, s"$c: row count must not trade ($aRows vs $rows)")
      assert(aNulls == nulls, s"$c: null count must not trade ($aNulls vs $nulls)")
      val relErr = if (nd == 0) (if (aNd == 0) 0.0 else 1.0)
        else math.abs(aNd - nd).toDouble / nd
      assert(relErr < 0.05,
        s"$c: approx n_distinct $aNd vs exact $nd — relative error ${f"$relErr%.4f"} >= 5%")
    }
    // sanity: the corpus actually exercises the estimating regime
    assert(exact("event_id")._3 > 50000L,
      s"sf0.1 should profile >50k distinct event ids, got ${exact("event_id")._3}")
  }

  test("approx profile holds at the sf1 stress corpus (~10^6 distincts — HLL++'s flat regime)") {
    // one decade past sf0.1: the graft.ScaleUp stress corpus (10x events,
    // k x distinct users/event ids over the same time span). Gated on the
    // stress dir having been built this round — `sbt "runMain
    // graft.ScaleUp /root/testdata/sf0.1 target/sf1 10"`.
    val dir = "target/sf1"
    assume(new java.io.File(s"$dir/events.parquet").exists(),
      s"$dir not built (graft.ScaleUp) — skipping the sf1 error pin")
    def byCol(approx: Boolean): Map[String, (Long, Long, Long)] =
      Queries.profile(spark, dir, approx = approx).collect()
        .map(r => r.getAs[String]("column_name") ->
          ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_nulls"), r.getAs[Long]("n_distinct"))))
        .toMap
    val exact = byCol(approx = false)
    val approx = byCol(approx = true)
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (c, (rows, nulls, nd)) =>
      val (aRows, aNulls, aNd) = approx(c)
      assert(aRows == rows && aNulls == nulls, s"$c: row/null counts must not trade")
      val relErr = if (nd == 0) (if (aNd == 0) 0.0 else 1.0)
        else math.abs(aNd - nd).toDouble / nd
      assert(relErr < 0.05,
        s"$c: approx n_distinct $aNd vs exact $nd at sf1 — error ${f"$relErr%.4f"} >= 5%")
    }
    assert(exact("event_id")._3 > 500000L,
      s"sf1 should profile >500k distinct event ids, got ${exact("event_id")._3}")
  }
}
