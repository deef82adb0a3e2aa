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

  // q_scan legitimately returns 0 rows only if the predicate missed; all
  // inventory queries are expected non-empty on sf0.001
  Queries.all.keys.toSeq.sorted.foreach { name =>
    test(s"$name runs and returns rows") {
      assert(Queries.all(name)(spark, dir).count() > 0)
    }
  }
}
