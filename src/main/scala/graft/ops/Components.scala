package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components of an undirected pair graph, shared by the dedup
  * cluster finders (token near-dup clusters, embedding near-dup clusters).
  *
  * Pairwise near-dup output is not actionable until pairs become CLUSTERS
  * with one canonical survivor each. Components via iterative min-label
  * propagation — labels(v) = min(label over neighbors ∪ v) — which
  * converges to min(id in component): a unique fixpoint, so the result is
  * deterministic regardless of iteration schedule. Each round is one join
  * + one aggregate (the standard Spark CC) plus a label-on-label join
  * (pointer doubling), so rounds ≈ log₂(diameter) — a pathological
  * 1000-node chain converges in ~10 rounds, not 1000 (dup clusters are
  * shallow anyway — ≤3 at the test scales). The driver-side loop holds
  * only a LONG per round (convergence witness), never rows.
  */
object Components {

  /** Min-label connected components over `pairs` (two long id columns,
    * undirected edges). Returns one row per node appearing in `pairs`,
    * columns (`id`, `cluster_id`) with `cluster_id` = min id in the node's
    * component.
    */
  def minLabel(pairs0: DataFrame, maxRounds: Int = 50): DataFrame =
    minLabelWithRounds(pairs0, maxRounds)._1

  /** [[minLabel]] plus the number of propagation rounds executed — the
    * scale witness (rounds ≈ log₂ diameter, see the doubling step below).
    */
  def minLabelWithRounds(pairs0: DataFrame, maxRounds: Int = 50): (DataFrame, Int) = {
    require(pairs0.columns.length == 2,
      s"pairs must have exactly two id columns, got ${pairs0.columns.mkString(",")}")
    val pairs = pairs0.toDF("__a", "__b")
    // undirected closure (both directions + self-loops) in ONE pass over
    // the pair pipeline — an explode of a 4-struct array instead of four
    // unions, so the (possibly expensive) pair plan executes exactly once
    // inside the edges materialization and needs no checkpoint of its own
    val edges = pairs.select(explode(array(
        struct(col("__a").as("src"), col("__b").as("dst")),
        struct(col("__b").as("src"), col("__a").as("dst")),
        struct(col("__a").as("src"), col("__a").as("dst")),
        struct(col("__b").as("src"), col("__b").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst")).distinct()
      .localCheckpoint(true) // edges feed every propagation round
    var labels = edges.groupBy(col("src")).agg(min(col("dst")).as("lbl"))
      .localCheckpoint(true)
    // min-propagation DECREASES labels monotonically, so the label sum is
    // a strictly decreasing convergence witness: equal sums between
    // rounds <=> elementwise fixpoint. One single-column aggregate per
    // round instead of a join-based diff. (id sums fit a long with
    // orders of magnitude to spare.)
    // null-safe: sum over ZERO rows is NULL — an empty pair set (a clean
    // corpus with no dups above threshold is a legitimate caller state)
    // must converge to an empty result, not NPE on the witness read
    def lblSum(df: DataFrame): Long = {
      val v = df.agg(sum(col("lbl"))).head().get(0)
      if (v == null) 0L else v.asInstanceOf[Long]
    }
    var prevSum = lblSum(labels)
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      // materialized before the doubling self-join: its two sides are
      // different projections of this plan, so exchange reuse does not
      // dedupe them and the edges-join-plus-aggregate — the round's
      // dominant cost — would execute TWICE per round
      val prop = edges
        .join(labels.select(col("src").as("dst"), col("lbl")), Seq("dst"))
        .groupBy(col("src")).agg(min(col("lbl")).as("lbl"))
        .localCheckpoint(true)
      // POINTER DOUBLING: follow the label's own label (label(label(v)))
      // each round. Neighbor propagation alone needs diameter rounds — a
      // pathological chain of length d costs d joins; the jump collapses
      // chain depth geometrically, so rounds ≈ log₂(d). Still correct:
      // label(l) is the min over l's own neighborhood, same component, and
      // labels stay monotonically decreasing so the sum witness holds.
      val next = prop
        .join(prop.select(col("src").as("lbl"), col("lbl").as("__jump")), Seq("lbl"), "left")
        .select(col("src"), coalesce(col("__jump"), col("lbl")).as("lbl"))
        .localCheckpoint(true)
      val s = lblSum(next)
      converged = s == prevSum
      prevSum = s
      labels = next
      rounds += 1
    }
    // maxRounds covers any realistic dup-cluster diameter with log-depth
    // headroom to spare; emitting unconverged labels would be silently
    // wrong, so fail loudly instead
    require(converged, s"label propagation did not converge in $rounds rounds")
    (labels.select(col("src").as("id"), col("lbl").as("cluster_id")), rounds)
  }
}
