package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class ComponentsSpec extends SparkSuite {
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Components.minLabel(pairs.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a path graph collapses to one component labeled by its min id") {
    // diameter 4 — forces several propagation rounds before the fixpoint
    val got = cc(Seq((2L, 7L), (7L, 3L), (3L, 9L), (9L, 5L)))
    assert(got == Map(2L -> 2L, 7L -> 2L, 3L -> 2L, 9L -> 2L, 5L -> 2L))
  }

  test("disjoint components keep separate min labels") {
    val got = cc(Seq((1L, 4L), (10L, 12L), (12L, 11L)))
    assert(got == Map(1L -> 1L, 4L -> 1L, 10L -> 10L, 12L -> 10L, 11L -> 10L))
  }

  test("duplicate and reversed edges do not change the fixpoint") {
    val got = cc(Seq((4L, 1L), (1L, 4L), (4L, 1L), (5L, 4L)))
    assert(got == Map(1L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("matches a transitive-closure oracle on a random sparse graph") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    // driver-side union-find oracle
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.toSeq.map(x => x -> find(x)).toMap
    assert(cc(pairs) == want)
  }

  test("pointer doubling makes rounds logarithmic in chain depth") {
    // a 65-node path (diameter 64): plain neighbor propagation needs 64
    // rounds; with the label(label(v)) jump the depth halves each round.
    // driverMaxEdges = 0 pins the DISTRIBUTED loop (the default would
    // resolve this tiny graph on the driver and report 0 rounds)
    val chain = (0L until 64L).map(i => (i, i + 1))
    val (labels, rounds) =
      Components.minLabelWithRounds(chain.toDF("a", "b"), driverMaxEdges = 0L)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 64L).map(_ -> 0L).toMap)
    assert(rounds <= 12, s"expected ~log2(64) rounds, took $rounds")
    assert(rounds > 0, "driverMaxEdges = 0 must force the distributed loop")
  }

  test("the driver union-find fast path matches the distributed loop") {
    val rnd = new scala.util.Random(21)
    val pairs = Seq.fill(120)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    val (fast, fastRounds) = Components.minLabelWithRounds(pairs.toDF("a", "b"))
    val (dist, distRounds) =
      Components.minLabelWithRounds(pairs.toDF("a", "b"), driverMaxEdges = 0L)
    assert(fastRounds == 0, "a 120-pair graph must take the driver path")
    assert(distRounds > 0)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asMap(fast) == asMap(dist))
  }

  test("rejects inputs without exactly two columns") {
    intercept[IllegalArgumentException] {
      Components.minLabel(Seq((1L, 2L, 3L)).toDF("a", "b", "c"))
    }
  }

  test("an empty pair set converges to an empty result, not an NPE") {
    // a clean corpus with no dups above threshold is a legitimate caller
    // state (docDupPairs/embDupPairs are threshold-filtered); sum() over
    // zero rows is NULL, which the convergence witness must tolerate
    val got = cc(Seq.empty)
    assert(got.isEmpty)
  }
}
