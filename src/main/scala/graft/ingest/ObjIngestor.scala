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

  /** Column reference with the name QUOTED: JSON keys are caller data and
    * may contain dots (`{"a.b": 1}`), which a bare `col(name)` would parse
    * as a struct access (wrong column or AnalysisException). Backticks in
    * the name itself are doubled, per Spark's quoting rule.
    */
  private def qcol(name: String) = col(s"`${name.replace("`", "``")}`")

  private def quoted(name: String): String = s"`${name.replace("`", "``")}`"

  /** Names the shredder injects; user data must not collide with them —
    * a same-named input field would be silently overwritten/dropped.
    */
  private val ReservedCols = Set("__id", "__parent_id", "__pos", "__shape")

  private def assertNoReserved(dt: DataType, at: String): Unit = dt match {
    case st: StructType => st.fields.foreach { f =>
      require(!ReservedCols.contains(f.name),
        s"reserved column name '${f.name}' in the input at $at — the shredder injects " +
          "__id/__parent_id/__pos (and routeByShape __shape); rename the field before shredding")
      assertNoReserved(f.dataType, s"$at.${f.name}")
    }
    case ArrayType(et, _)   => assertNoReserved(et, s"$at[]")
    case MapType(_, vt, _)  => assertNoReserved(vt, s"$at{}")
    case _                  => ()
  }

  /** Shred a DataFrame whose columns may be nested structs/arrays/maps into
    * flat tables. Returns path -> DataFrame; the root table is at `rootName`.
    *
    * @param idCol column to use as the root primary key (`root_id_key` /
    *              `force_key`, ingestor.py:30-47); when absent a
    *              deterministic content hash id is injected.
    */
  def shred(df: DataFrame, rootName: String = "root", idCol: Option[String] = None): Map[String, DataFrame] = {
    assertNoReserved(df.schema, rootName)
    val withId = idCol match {
      case Some(c) => df.withColumn("__id", qcol(c).cast(StringType))
      case None =>
        // DETERMINISTIC content hash (the reference injects uuid4; made
        // reproducible here so oracle runs replay). Consequence: duplicate
        // input objects share an __id — and their children key to the same
        // parent id — so joins treat them as one logical entity. Pre-dedupe
        // the input, or pass a unique idCol, when PK semantics matter.
        df.withColumn("__id", md5(to_json(struct(df.columns.map(qcol).toIndexedSeq: _*))))
    }
    val out = mutable.LinkedHashMap[String, DataFrame]()

    def emit(path: String, t: DataFrame): Unit = {
      // e.g. an array field "a" (child table at "<p>.a.list") next to a
      // struct field literally named "a.list" — a silent overwrite would
      // merge unrelated tables, so refuse the ambiguity loudly
      require(!out.contains(path),
        s"shred path collision: two distinct fields map to table path '$path'")
      out(path) = t
    }

    def walk(t: DataFrame, path: String): Unit = {
      val fields = t.schema.fields.filterNot(f => f.name == "__id" || f.name == "__parent_id")
      val atomCols = fields.filter(f => isAtom(f.dataType)).map(_.name)
      val keyCols = t.columns.filter(c => c == "__id" || c == "__parent_id")
      emit(path, t.select((keyCols.map(col) ++ atomCols.map(qcol)).toIndexedSeq: _*))

      fields.filterNot(f => isAtom(f.dataType)).foreach { f =>
        val childPath = s"$path.${f.name}"
        f.dataType match {
          case _: StructType =>
            val child = t.filter(qcol(f.name).isNotNull)
              .select(col("__id").as("__parent_id"), col(s"${quoted(f.name)}.*"))
              .withColumn("__id", md5(concat_ws("\u0001", lit(childPath), col("__parent_id"))))
            walk(child, childPath)
          case ArrayType(et, _) =>
            val exploded = t.filter(qcol(f.name).isNotNull)
              .select(col("__id").as("__parent_id"), posexplode(qcol(f.name)).as(Seq("__pos", "element")))
              .withColumn("__id",
                md5(concat_ws("\u0001", lit(childPath), col("__parent_id"), col("__pos"))))
            val listPath = s"$childPath.list"
            et match {
              case _: StructType =>
                val child = exploded.select(col("__parent_id"), col("__id"), col("__pos"), col("element.*"))
                walk(child, listPath)
              case _ =>
                emit(listPath, exploded.select(col("__parent_id"), col("__id"), col("__pos"), col("element")))
            }
          case _: MapType =>
            val child = t.filter(qcol(f.name).isNotNull)
              .select(col("__id").as("__parent_id"), explode(qcol(f.name)).as(Seq("key", "value")))
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

  /** The plain character-sanitization step, shared with [[dumpAll]]'s
    * legacy-directory guard so the two can never drift: if the regex
    * changed in one place only, the guard would silently stop matching
    * the directories the old scheme actually wrote.
    */
  private def plainSanitized(path: String): String =
    path.replaceAll("[^A-Za-z0-9_.-]", "_")

  /** Directory-safe table name, COLLISION-FREE and a pure function of the
    * single path: plain sanitization maps distinct paths like `root.a b`
    * and `root.a/b` to one name, silently interleaving unrelated tables
    * in one repo — so any path the sanitizer CHANGED gets a short
    * path-hash suffix. Keying the suffix off the call's colliding SET
    * would be wrong for incremental dumps into one baseDir (a later dump
    * introducing the collision would relocate an earlier dump's table);
    * per-path determinism keeps every dump addressing the same directory
    * forever. Clean paths — the overwhelmingly common case — stay
    * readable and unchanged, and cannot collide with a suffixed one.
    */
  private def safeName(path: String): String = {
    val s = plainSanitized(path)
    if (s == path) s else s"$s-${md5Hex(path).take(8)}"
  }

  /** Write every shredded table into a TableRepo under `baseDir` — the
    * reference's `dump_all` (ingestor.py:87-98). Table-name sanitization
    * replaces the reference's md5-coded names + `key-map.json` sidecar with
    * readable path-derived names (hash-suffixed only on sanitization
    * collision). For the reference's heterogeneous-shape splitting, see
    * [[dumpAllRouted]].
    *
    * NAMING-SCHEME MIGRATION NOTE: sanitization-altered paths are
    * hash-suffixed (see [[safeName]]); an earlier scheme wrote them under
    * the plain sanitized name. An incremental dump into such a baseDir
    * would silently fork one logical table across two directories, so a
    * pre-existing directory under the old name — with no directory under
    * the new one, and no path in THIS dump legitimately owning the old
    * name — is refused loudly; migrate by renaming the old directory to
    * the suffixed name printed in the error.
    *
    * Each table's write executes the shred lineage from the source once;
    * when the source parse is expensive (raw JSON), persist the input
    * DataFrame before [[shred]] so the k writes share one parse.
    */
  def dumpAll(spark: SparkSession, tables: Map[String, DataFrame], baseDir: String): Map[String, TableRepo] = {
    val claimed = tables.keysIterator.map(safeName).toSet
    tables.map { case (path, t) =>
      val name = safeName(path)
      val plain = plainSanitized(path)
      if (name != plain && !claimed.contains(plain)) {
        val fs = new org.apache.hadoop.fs.Path(baseDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val legacyDir = new org.apache.hadoop.fs.Path(s"$baseDir/$plain")
        val newDir = new org.apache.hadoop.fs.Path(s"$baseDir/$name")
        if (fs.exists(legacyDir) && !fs.exists(newDir))
          throw new IllegalStateException(
            s"dumpAll: shred path '$path' now writes to '$name', but '$baseDir/$plain' " +
              "already exists — likely this table under the pre-hash-suffix naming " +
              s"scheme. Writing would fork one logical table across two directories. " +
              s"Rename '$baseDir/$plain' to '$baseDir/$name' if it is this table, or " +
              "create the new directory explicitly if the old one belongs to a " +
              "different (clean-named) table.")
      }
      val repo = new TableRepo(s"$baseDir/$name", spark)
      repo.extend(t)
      path -> repo
    }
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
        val repo = new TableRepo(s"$baseDir/${safeName(path)}/$code", spark)
        repo.extend(t)
        (path, code) -> repo
      }
      // The sidecar must MERGE with any existing one (repo.extend appends,
      // so incremental dumps into one baseDir are supported — a wholesale
      // overwrite would orphan every earlier dump's schema-<md5> dirs) and
      // must land atomically (temp + rename): a crash mid-create would
      // truncate the only map from md5 codes back to source paths.
      val fs = org.apache.hadoop.fs.FileSystem.get(
        java.net.URI.create(baseDir), spark.sparkContext.hadoopConfiguration)
      val sidecar = new org.apache.hadoop.fs.Path(s"$baseDir/key-map.json")
      val existing: Map[String, String] =
        if (!fs.exists(sidecar)) Map.empty
        else {
          val in = fs.open(sidecar)
          val raw = try new String(in.readAllBytes(), "UTF-8") finally in.close()
          TableRepo.parseFlatJson(raw)
        }
      val fresh = routed.toSeq.flatMap { case (path, byShape) =>
        byShape.toSeq.map { case (code, t) =>
          val fields = t.columns.filterNot(MetaCols.contains).sorted.mkString(",")
          code -> s"$path|$fields"
        }
      }.toMap
      val entries = (existing ++ fresh).toSeq.sortBy(_._1)
        .map { case (k, v) => s"${TableRepo.jq(k)}: ${TableRepo.jq(v)}" }
      val tmp = new org.apache.hadoop.fs.Path(s"$baseDir/.key-map.json.tmp")
      val out = fs.create(tmp, true)
      try out.write(entries.mkString("{", ", ", "}").getBytes("UTF-8"))
      finally out.close()
      fs.delete(sidecar, false)
      if (!fs.rename(tmp, sidecar))
        throw new java.io.IOException(s"failed to commit $sidecar")
      repos.toMap
    } finally cached.values.foreach(_.unpersist(): Unit)
  }
}
