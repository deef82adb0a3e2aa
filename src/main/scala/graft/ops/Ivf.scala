package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.VectorFns

/** Trained IVF: pinned-seed Lloyd's k-means over an embedding column,
  * shared by `q_ivf_train` and the IVF recall rows in
  * [[graft.RecallStudy]]. (Reference scope: the engine's ANN surface —
  * cross-engine parity demands full determinism, so every source of
  * float drift is pinned.)
  *
  * Determinism contract (the DuckDB oracle replays it bit-for-bit):
  *   - seed centroids = the k lowest `vec_id` vectors (float components
  *     are exact in double);
  *   - assignment = argmax cosine, ties to the LOWER centroid_id; dot
  *     products are in-order left folds in double on both engines
  *     ([[VectorFns.dotHof]] ≡ DuckDB `list_inner_product(::DOUBLE[])`),
  *     so similarities are bitwise-equal;
  *   - centroid update = per-position mean ROUNDED to 6 decimals — the
  *     rounding quantizes away the one order-dependent step (a
  *     distributed avg sums in partition order), so iteration n+1 starts
  *     from identical centroid literals on both engines. A mean would
  *     need to land within ~1e-15 of a rounding boundary to diverge.
  *
  * Scale shape (100 TB): each iteration is one linear scan — broadcast
  * the k-row centroid table, one codegen'd dot per (vector, centroid),
  * per-vector argmax via a WindowGroupLimit-able window, then a
  * (centroid, pos) groupBy whose cardinality is k×dim (map-side partial
  * agg does almost all the work). No shuffle grows with the corpus; k
  * and iters are constants. Empty clusters drop out of the update on
  * both engines identically.
  */
object Ivf {

  /** Per-vector nearest-centroid assignment (broadcast centroids).
    * `embs` needs (vec_id, embedding); `cent` is (centroid_id, c_emb)
    * with double components. Returns (vec_id, centroid_id, embedding).
    */
  def assign(embs: DataFrame, cent: DataFrame): DataFrame = {
    val c = cent.select(col("centroid_id"), col("c_emb"),
      sqrt(VectorFns.dotHof(col("c_emb"), col("c_emb"))).as("c_nrm"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("centroid_id"))
    embs.select(col("vec_id"), col("embedding"),
        sqrt(VectorFns.dotHof(col("embedding"), col("embedding"))).as("e_nrm"))
      .crossJoin(broadcast(c))
      .withColumn("sim",
        VectorFns.dotHof(col("embedding"), col("c_emb")) / (col("e_nrm") * col("c_nrm")))
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("vec_id"), col("centroid_id"), col("embedding"))
  }

  /** One Lloyd update: per-position rounded mean of the assigned vectors.
    * Returns (centroid_id, c_emb: array<double>).
    */
  private def update(assigned: DataFrame): DataFrame =
    Ckpt(assigned.select(col("centroid_id"), posexplode(col("embedding")))
      .groupBy(col("centroid_id"), col("pos"))
      .agg(round(avg(col("col")), 6).as("cv"))
      .groupBy(col("centroid_id"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv")))),
        x => x.getField("cv")).as("c_emb")))

  /** Pinned-seed k-means: seed = k lowest vec_ids, `iters` Lloyd updates.
    * Returns the trained (centroid_id, c_emb) table.
    */
  def train(embs: DataFrame, k: Int, iters: Int): DataFrame = {
    val e = embs.select(col("vec_id"), col("embedding"))
    var cent = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("centroid_id"),
        transform(col("embedding"), x => x.cast(DoubleType)).as("c_emb"))
    for (_ <- 1 to iters) cent = update(assign(e, cent))
    cent
  }

  /** The q_ivf_train result frame: trained centroid components exploded
    * to rows plus the final cluster sizes — floats-only-as-rounded-means,
    * so the oracle hash-compares cleanly.
    */
  def trainResult(embs: DataFrame, k: Int, iters: Int): DataFrame = {
    val cent = Ckpt(train(embs, k, iters))
    val sizes = assign(embs, cent)
      .groupBy(col("centroid_id")).agg(count(lit(1)).as("n"))
    cent.select(col("centroid_id"), posexplode(col("c_emb")))
      .select(col("centroid_id"), col("pos").cast("long").as("pos"), col("col").as("c_val"))
      .join(broadcast(sizes), Seq("centroid_id"))
      .select(col("centroid_id"), col("pos"), col("c_val"), col("n"))
  }

  /** The DuckDB oracle for [[trainResult]]: the same pinned Lloyd,
    * unrolled. `cosine(a, b)` must be the caller's `sqlCosine` (in-order
    * DOUBLE[] inner products — bitwise equal to the Spark side).
    */
  def oracleSql(k: Int, iters: Int, cosine: (String, String) => String): String = {
    def assignSql(cTbl: String, out: String) =
      s"""$out AS (SELECT vec_id, centroid_id, embedding FROM (
         |  SELECT e.vec_id AS vec_id, e.embedding AS embedding, c.centroid_id AS centroid_id,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${cosine("e.embedding", "c.c_emb")} DESC, c.centroid_id) AS rn
         |  FROM embeddings e CROSS JOIN $cTbl c) WHERE rn = 1)""".stripMargin
    def updateSql(aTbl: String, out: String) =
      s"""$out AS (SELECT centroid_id, list(round(m, 6) ORDER BY pos) AS c_emb FROM (
         |  SELECT centroid_id, pos, avg(val) AS m FROM (
         |    SELECT centroid_id, generate_subscripts(embedding, 1) AS pos,
         |      unnest(embedding) AS val FROM $aTbl)
         |  GROUP BY centroid_id, pos) GROUP BY centroid_id)""".stripMargin
    val steps = (0 until iters).flatMap { i =>
      Seq(assignSql(s"c$i", s"a$i"), updateSql(s"a$i", s"c${i + 1}"))
    }
    val cFinal = s"c$iters"
    (s"""WITH c0 AS (SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS c_emb
        | FROM embeddings WHERE vec_id < $k),
        | ${steps.mkString(",\n ")},
        | ${assignSql(cFinal, "afin")},
        | sizes AS (SELECT centroid_id, count(*) AS n FROM afin GROUP BY centroid_id)
        | SELECT c.centroid_id AS centroid_id,
        |   CAST(generate_subscripts(c.c_emb, 1) - 1 AS BIGINT) AS pos,
        |   unnest(c.c_emb) AS c_val, sizes.n AS n
        | FROM $cFinal c JOIN sizes ON sizes.centroid_id = c.centroid_id""")
      .stripMargin.replaceAll("\n", "")
  }
}
