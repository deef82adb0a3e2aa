package graft

import graft.ops.Queries

/** Smoke over the full inventory on sf0.001: every declared query runs and
  * yields rows; every oracle key points at a declared query. The real
  * cross-engine check is the driver's DuckDB gate (tools/check_oracle.py
  * replicates it locally).
  */
class QueriesSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("every oracle key has a query") {
    assert(Queries.oracles.keySet.subsetOf(Queries.all.keySet))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q_filter_funnel stages are monotone non-increasing") {
    val rows = Queries.all("q_filter_funnel")(spark, dir)
      .orderBy("ord").collect()
    assert(rows.length == 5)
    val docs = rows.map(_.getAs[Long]("n_docs"))
    val chars = rows.map(_.getAs[Long]("n_chars_total"))
    assert(docs.zip(docs.tail).forall { case (a, b) => a >= b },
      s"n_docs not monotone: ${docs.toSeq}")
    assert(chars.zip(chars.tail).forall { case (a, b) => a >= b },
      s"n_chars_total not monotone: ${chars.toSeq}")
  }

  test("q_profile invariants: distinct <= rows, nulls accounted") {
    val rows = Queries.all("q_profile")(spark, dir).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val (n, nn, nd) =
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_nulls"), r.getAs[Long]("n_distinct"))
      // count(DISTINCT col) excludes nulls, so distinct + nulls <= rows
      assert(nn <= n && nd <= n - nn,
        s"${r.getAs[String]("column_name")}: distinct=$nd nulls=$nn rows=$n")
    }
    // event_id is the table's unique key: distinct must equal rows
    val eid = rows.find(_.getAs[String]("column_name") == "event_id").get
    assert(eid.getAs[Long]("n_distinct") == eid.getAs[Long]("n_rows"))
  }

  // q_scan legitimately returns 0 rows only if the predicate missed; all
  // inventory queries are expected non-empty on sf0.001
  Queries.all.keys.toSeq.sorted.foreach { name =>
    test(s"$name runs and returns rows") {
      assert(Queries.all(name)(spark, dir).count() > 0)
    }
  }
}
