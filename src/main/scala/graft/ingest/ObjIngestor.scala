package graft.ingest

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.repo.TableRepo

/** Recursive object->relational shredder — the Spark-native re-expression of
  * the reference's `ObjIngestor` (/root/reference/parquetranger/ingestor.py:49-113).
  *
  * The reference walks Python dicts one object at a time on a single core;
  * here the whole collection is one DataFrame of (inferred) nested structs
  * and every shredding step is a distributed projection/explode:
  *
  *   - atoms (int/float/str/bool/null, ingestor.py:13) stay on the parent row
  *   - nested struct fields become a child table keyed by `__parent_id`
  *     (ingestor.py:60-66)
  *   - array fields fan out with `posexplode`, one child row per element
  *     under a `list` path segment (ingestor.py:56-59); bare-atom elements
  *     are wrapped as an `element` column (ingestor.py:67-69)
  *   - every table carries a deterministic `__id` (md5 of path + parent id +
  *     position — the analog of the reference's injected uuid4 PKs,
  *     ingestor.py:70-76, made deterministic so runs are reproducible)
  *
  * Shape handling: Spark's JSON schema inference unifies heterogeneous
  * shapes into one nullable schema, so the default is one table per path
  * with absent fields null; [[routeByShape]]/[[dumpAllRouted]] restore the
  * reference's split-into-md5-coded-tables behavior (ingestor.py:77-82)
  * plus the `key-map.json` sidecar when separate per-shape tables are
  * wanted.
  */
object ObjIngestor {

  private def isAtom(dt: DataType): Boolean = dt match {
    case _: StructType | _: ArrayType | _: MapType => false
    case _ => true
  }

  /** Shred a DataFrame whose columns may be nested structs/arrays/maps into
    * flat tables. Returns path -> DataFrame; the root table is at `rootName`.
    *
    * @param idCol column to use as the root primary key (`root_id_key` /
    *              `force_key`, ingestor.py:30-47); when absent a
    *              deterministic content hash id is injected.
    */
  def shred(df: DataFrame, rootName: String = "root", idCol: Option[String] = None): Map[String, DataFrame] = {
    val withId = idCol match {
      case Some(c) => df.withColumn("__id", col(c).cast(StringType))
      case None =>
        df.withColumn("__id", md5(to_json(struct(df.columns.map(col).toIndexedSeq: _*))))
    }
    val out = mutable.LinkedHashMap[String, DataFrame]()

    def walk(t: DataFrame, path: String): Unit = {
      val fields = t.schema.fields.filterNot(f => f.name == "__id" || f.name == "__parent_id")
      val atomCols = fields.filter(f => isAtom(f.dataType)).map(_.name)
      val keyCols = t.columns.filter(c => c == "__id" || c == "__parent_id")
      out(path) = t.select((keyCols ++ atomCols).toIndexedSeq.map(col): _*)

      fields.filterNot(f => isAtom(f.dataType)).foreach { f =>
        val childPath = s"$path.${f.name}"
        f.dataType match {
          case _: StructType =>
            val child = t.filter(col(f.name).isNotNull)
              .select(col("__id").as("__parent_id"), col(s"`${f.name}`.*"))
              .withColumn("__id", md5(concat_ws("\u0001", lit(childPath), col("__parent_id"))))
            walk(child, childPath)
          case ArrayType(et, _) =>
            val exploded = t.filter(col(f.name).isNotNull)
              .select(col("__id").as("__parent_id"), posexplode(col(f.name)).as(Seq("__pos", "element")))
              .withColumn("__id",
                md5(concat_ws("\u0001", lit(childPath), col("__parent_id"), col("__pos"))))
            val listPath = s"$childPath.list"
            et match {
              case _: StructType =>
                val child = exploded.select(col("__parent_id"), col("__id"), col("__pos"), col("element.*"))
                walk(child, listPath)
              case _ =>
                out(listPath) = exploded.select(col("__parent_id"), col("__id"), col("__pos"), col("element"))
            }
          case _: MapType =>
            val child = t.filter(col(f.name).isNotNull)
              .select(col("__id").as("__parent_id"), explode(col(f.name)).as(Seq("key", "value")))
              .withColumn("__id", md5(concat_ws("\u0001", lit(childPath), col("__parent_id"), col("key"))))
            walk(child, childPath)
          case _ => ()
        }
      }
    }

    walk(withId, rootName)
    out.toMap
  }

  /** Shred a Dataset/column of raw JSON strings: infer the unified schema,
    * parse, shred. The inference pass is itself distributed
    * (`spark.read.json` over the string dataset).
    */
  def shredJson(spark: SparkSession, jsons: Dataset[String], rootName: String = "root",
      idCol: Option[String] = None): Map[String, DataFrame] =
    shred(spark.read.json(jsons), rootName, idCol)

  /** Write every shredded table into a TableRepo under `baseDir` — the
    * reference's `dump_all` (ingestor.py:87-98). Table-name sanitization
    * replaces the reference's md5-coded names + `key-map.json` sidecar with
    * readable path-derived names. For the reference's heterogeneous-shape
    * splitting, see [[dumpAllRouted]].
    */
  def dumpAll(spark: SparkSession, tables: Map[String, DataFrame], baseDir: String): Map[String, TableRepo] =
    tables.map { case (path, t) =>
      val safe = path.replaceAll("[^A-Za-z0-9_.-]", "_")
      val repo = new TableRepo(s"$baseDir/$safe", spark)
      repo.extend(t)
      path -> repo
    }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  private val MetaCols = Set("__id", "__parent_id", "__pos")

  /** Reference-parity heterogeneous-shape routing (ingestor.py:77-82): rows
    * at one path whose PRESENT (non-null) field sets differ go to separate
    * tables keyed by `schema-<md5(path + sorted fields)[0,9)>` — the
    * reference's md5-of-type-map table codes (`_m5`, ingestor.py:112-113),
    * with the path folded into the hash so codes are GLOBALLY unique: two
    * paths with identical field sets (common for same-shaped nested lists
    * under different parents) must not share a code, or the key-map sidecar
    * could not resolve a code back to its source path. Field TYPES
    * are already unified by schema inference here, so the present-field set
    * IS the shape. The distinct-shape collect is bounded by shape
    * cardinality (the reference holds one writer per shape in a dict — same
    * bound), not row count.
    *
    * Returns path -> (schemaCode -> rows of that shape, absent fields
    * dropped).
    */
  private val ShapeSep = "\u0001" // same collision-safe separator shred() uses

  def routeByShape(tables: Map[String, DataFrame]): Map[String, Map[String, DataFrame]] =
    tables.map { case (path, t) =>
      val meta = t.columns.filter(MetaCols.contains)
      val dataCols = t.columns.filterNot(MetaCols.contains).sorted
      // control-char-joined so a field name containing ',' can neither break the
      // split nor collide two distinct field sets into one shape code
      val shapeExpr = concat_ws(ShapeSep,
        dataCols.map(c => when(col(s"`$c`").isNotNull, lit(c))).toIndexedSeq: _*)
      val shaped = t.withColumn("__shape", shapeExpr)
      val shapes = shaped.select("__shape").distinct().collect().map(_.getString(0))
      path -> shapes.map { sh =>
        val present = if (sh.isEmpty) Array.empty[String] else sh.split(ShapeSep)
        val code = "schema-" + md5Hex(path + ShapeSep + sh).take(9)
        code -> shaped.filter(col("__shape") === sh)
          .select((meta ++ present).toIndexedSeq.map(c => col(s"`$c`")): _*)
      }.toMap
    }

  /** `dump_all` with shape routing and the `key-map.json` sidecar
    * (ingestor.py:87-109): each shape table lands under
    * `<base>/<safe path>/<schemaCode>`, and the sidecar maps every schema
    * code to its source path and field list so readers can resolve the
    * md5-coded directory names.
    */
  def dumpAllRouted(spark: SparkSession, tables: Map[String, DataFrame],
      baseDir: String): Map[(String, String), TableRepo] = {
    // shape routing re-reads each table's lineage once per shape (distinct
    // collect + one filtered write each) — cache the source so the
    // (possibly expensive) shred lineage is computed once, not s+1 times
    val cached = tables.view.mapValues(_.persist()).toMap
    try {
      val routed = routeByShape(cached)
      val repos = for ((path, byShape) <- routed; (code, t) <- byShape) yield {
        val safe = path.replaceAll("[^A-Za-z0-9_.-]", "_")
        val repo = new TableRepo(s"$baseDir/$safe/$code", spark)
        repo.extend(t)
        (path, code) -> repo
      }
      val entries = routed.toSeq.sortBy(_._1).flatMap { case (path, byShape) =>
        byShape.toSeq.sortBy(_._1).map { case (code, t) =>
          val fields = t.columns.filterNot(MetaCols.contains).sorted.mkString(",")
          s"${TableRepo.jq(code)}: ${TableRepo.jq(s"$path|$fields")}"
        }
      }
      // through the Hadoop FileSystem like every other repo write, so a
      // non-local baseDir (hdfs://, s3a://) gets its sidecar next to its
      // tables instead of a bogus local path
      val fs = org.apache.hadoop.fs.FileSystem.get(
        java.net.URI.create(baseDir), spark.sparkContext.hadoopConfiguration)
      val out = fs.create(new org.apache.hadoop.fs.Path(s"$baseDir/key-map.json"), true)
      try out.write(entries.mkString("{", ", ", "}").getBytes("UTF-8"))
      finally out.close()
      repos.toMap
    } finally cached.values.foreach(_.unpersist(): Unit)
  }
}
