package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.SetOps

/** EXACT set-similarity self-join via prefix filtering — the AllPairs /
  * PPJoin family (Bayardo et al., WWW'07; Xiao et al., WWW'08), in the
  * distributed shape of Vernica, Carey & Li, "Efficient Parallel
  * Set-Similarity Joins Using MapReduce" (SIGMOD'10).
  *
  * Replaces the O(block²) exact self-join for Jaccard-threshold pair
  * generation with a candidate stage that is linear plus an equi-join:
  *
  *   1. order every set's elements by a GLOBAL total order (ascending
  *      document frequency, ties by value — rarest first);
  *   2. emit only each set's PREFIX of length `n - ceil(t*n) + 1`: any
  *      two sets with Jaccard >= t must share at least one prefix
  *      element under the same global order (pigeonhole on the
  *      `n - ceil(t*n)` elements a qualifying partner may miss);
  *   3. candidate pairs = equi-join on (prefix element, block key) with a
  *      length filter `min(na,nb) >= t * max(na,nb)` (J >= t forces it)
  *      and PPJoin's positional filter (the shared token's ranks bound
  *      the reachable overlap against `ceil(t/(1+t)·(na+nb))`);
  *   4. verify candidates with the allocation-free merge-walk
  *      intersection ([[SetOps.intersectCount]]) and keep `jaccard >= t`.
  *
  * Unlike MinHash/LSH banding this has 100% recall BY CONSTRUCTION — the
  * output is bit-identical to the all-pairs join, so the DuckDB oracles
  * (which stay on the naive blocked join) still hash-match. At 100 TB the
  * candidate stage is one shuffle on the prefix element: rarest-first
  * ordering keeps prefix buckets small (measured sf0.1: 125k candidates
  * for 91k true pairs at t=0.6 vs ~600k blocked all-pairs — and block²
  * grows quadratically with block size while candidates grow with the
  * actual near-dup density). Frequency ordering is a pure heuristic:
  * ANY total order is correct, so a stale or sampled df table only costs
  * candidates, never recall.
  *
  * The base sorted-set table and the prefix table are eagerly
  * `localCheckpoint`ed: each is computed exactly once and its four/two
  * consumers scan finished partitions. (On a multi-executor cluster where
  * executor loss must not fail the job, swap for `persist(MEMORY_AND_DISK)`
  * or a reliable `checkpoint` — same plan shape, recoverable blocks.)
  *
  * Reference behavior spec: parquetranger has no similarity join; this is
  * the Tier-B near-dup surface (SURVEY.md §2.B2) in its exact form.
  */
object SetSimJoin {

  /** Internal working columns; caller columns must not collide. */
  private val Reserved = Set("__set", "__n", "__h", "__df", "__rk", "id_a", "id_b", "jaccard")

  /** All pairs with `jaccard(setCol_a, setCol_b) >= threshold` within the
    * same `blockCols` group (empty = whole table), ids ordered `a < b`.
    *
    * @param dd        one row per set: `idCol`, `blockCols`, `setCol`
    *                  (array&lt;bigint&gt;; need not be sorted — sorted
    *                  once here, amortized across all pairs). `idCol`
    *                  must be GLOBALLY unique — across blocks, not just
    *                  within one: the output schema names pairs by id
    *                  alone, so per-block ids could not even be
    *                  represented, and internally the prefix ranking and
    *                  the verify joins key on the id (a reused id would
    *                  mix two sets' tokens into one prefix and verify
    *                  candidates against the wrong set).
    * @return columns (`id_a`, `id_b`, `jaccard`)
    * @note `idCol`/`blockCols` may not use the reserved internal names
    *       `__set __n __h __df __rk id_a id_b jaccard`.
    */
  def jaccardPairs(dd: DataFrame, idCol: String, setCol: String,
                   blockCols: Seq[String], threshold: Double): DataFrame = {
    (idCol +: blockCols).foreach { c =>
      require(!Reserved(c), s"column name '$c' collides with a SetSimJoin internal name " +
        s"(reserved: ${Reserved.mkString(" ")})")
    }
    val blocks = blockCols.map(col)
    // materialize the hashed sorted sets ONCE — eagerly, as checkpointed
    // in-memory partitions. A plain repartition is NOT enough: Spark's
    // exchange reuse needs canonically identical subtrees, and per-consumer
    // column pruning makes each of the four consumers (df aggregate, prefix
    // window, both verify sides) a *different* subtree, so the whole
    // tokenize/hash/sort pipeline re-ran per consumer (round-6 plan dump:
    // 12 parquet scans, 14 sort_arrays, zero ReusedExchange, a 5-12x
    // corpus-scan tax). localCheckpoint truncates lineage, so every
    // consumer scans the finished arrays instead.
    // no repartition before the checkpoint: a checkpointed RDD reports
    // UnknownPartitioning (the plan dumps show it), so a pre-checkpoint
    // shuffle is pure cost — every consumer re-shuffles for its own keys
    // regardless
    // __n counts MEMBERS — null slots excluded (SetOps.memberCount): a
    // null element is not a set member on either engine, so it must not
    // inflate the prefix length, the length filter, or the Jaccard
    // denominator. The null slot itself STAYS in __set (sort_array puts
    // it first) and is skipped by the verify walk — q_ngram_jaccard
    // injects one into every set at oracle scale to pin exactly that.
    val base = Ckpt(dd
      .select((col(idCol) +: blocks :+ SetOps.sortedSet(col(setCol)).as("__set")): _*)
      .withColumn("__n", SetOps.memberCount(col("__set"))))

    val tokens = base.select(
      (col(idCol) +: blocks :+ col("__n") :+ explode(col("__set")).as("__h")): _*)
    // document frequency per element — the candidate-minimizing order.
    // The dfreq join shuffles both sides on __h (dfreq is an aggregate, so
    // the planner won't risk a broadcast estimate; at 100 TB the distinct-
    // token table wouldn't fit one anyway) — one extra exchange over the
    // checkpointed base, by design, never a recompute.
    val dfreq = tokens.groupBy(col("__h")).agg(count(lit(1)).as("__df"))
    // prefix length n - ceil(t*n) + 1; the 1e-9 guards double noise in
    // t*n landing an ulp ABOVE an exact integer (a longer prefix only
    // adds candidates, a shorter one would lose recall)
    val wDoc = Window.partitionBy(col(idCol)).orderBy(col("__df"), col("__h"))
    val prefix = tokens.join(dfreq, "__h")
      .withColumn("__rk", row_number().over(wDoc))
      .filter(col("__rk") <= col("__n") - ceil(lit(threshold) * col("__n") - lit(1e-9)) + 1)
      // __rk rides along for the POSITIONAL filter below
      .select((col(idCol) +: blocks :+ col("__n") :+ col("__h") :+ col("__rk")): _*)
      // checkpoint the (small) prefix table too: exchange reuse does NOT
      // dedupe the self-join's two sides even though they look identical
      // (verified round 7: zero ReusedExchange and ~20% slower without
      // this), so both read the finished prefix rows instead of
      // re-running the dfreq join + window twice
      .transform(Ckpt.apply)

    def both(c: String): Column = col(s"a.$c") === col(s"b.$c")
    // PPJoin POSITIONAL filter (Xiao et al., WWW'08 §3.2), added round 19
    // after q_ngram_jaccard's stress exponent held >= 0.6 with the
    // corrected query: J >= t forces overlap >= ceil(t/(1+t)·(na+nb)),
    // and a shared token at ranks (i, j) bounds the overlap by
    // 1 + min(na−i, nb−j) — tokens sort in ONE global order, so for the
    // pair's EARLIEST shared token every other shared token sits after
    // both ranks. Rows whose bound can't reach the requirement are
    // dropped before the distinct; recall is intact because a qualifying
    // pair's earliest-shared-token row always passes (its true overlap
    // is itself >= the requirement and <= the bound), and that row is in
    // the join by the prefix theorem. The 1e-9 guard rounds the
    // requirement DOWN off an ulp-above-integer, never up — losing a
    // candidate row loses recall; keeping one only costs a verify.
    val reqOverlap = ceil(
      lit(threshold / (1.0 + threshold)) * (col("a.__n") + col("b.__n")) - lit(1e-9))
    val posBound = lit(1) +
      least(col("a.__n") - col("a.__rk"), col("b.__n") - col("b.__rk"))
    val joinCond = (("__h" +: blockCols).map(both) :+
      (col(s"a.$idCol") < col(s"b.$idCol")) :+
      (least(col("a.__n"), col("b.__n")).cast(DoubleType) >=
        lit(threshold) * greatest(col("a.__n"), col("b.__n")) - lit(1e-9)) :+
      (posBound.cast(DoubleType) >= reqOverlap)).reduce(_ && _)
    val cand = prefix.as("a").join(prefix.as("b"), joinCond)
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()

    // verify sides scan the checkpointed base partitions directly
    val sets = base.select(col(idCol), col("__set"), col("__n"))
    val inter = SetOps.intersectCount(col("x.__set"), col("y.__set"))
    cand.join(sets.as("x"), col(s"x.$idCol") === col("id_a"))
      .join(sets.as("y"), col(s"y.$idCol") === col("id_b"))
      .withColumn("jaccard",
        inter.cast(DoubleType) / (col("x.__n") + col("y.__n") - inter))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
