package graft.ingest

import graft.SparkSuite

/** Port of /root/reference/parquetranger/tests/test_ingestors.py: recursive
  * shredding of nested objects — atoms stay, dicts become child tables with
  * parent FKs, lists fan out, bare atoms wrap as `element`.
  */
class ObjIngestorSpec extends SparkSuite {
  import spark.implicits._

  private val jsons = Seq(
    """{"id_": "a@x.com", "name": "A", "age": 3,
       |"related-dic": {"k1": "v1", "k2": 2},
       |"related-list": [{"n": 1}, {"n": 2}]}""".stripMargin.replaceAll("\n", ""),
    """{"id_": "b@x.com", "name": "B", "age": 4}""",
    """{"id_": "c@x.com", "name": "C", "tags": ["t1", "t2", "t3"]}"""
  )

  lazy val tables: Map[String, org.apache.spark.sql.DataFrame] =
    ObjIngestor.shredJson(spark, jsons.toDS(), rootName = "obj", idCol = Some("id_"))

  test("root table keeps atoms and the chosen id (ingestor.py:30-47)") {
    val root = tables("obj")
    assert(root.columns.contains("__id"))
    assert(root.columns.contains("name") && root.columns.contains("age"))
    assert(root.count() == 3)
    assert(root.filter($"__id" === "a@x.com").count() == 1)
  }

  test("nested dict becomes child table with parent FK (ingestor.py:60-66)") {
    val child = tables("obj.related-dic")
    assert(child.columns.toSet.contains("__parent_id"))
    assert(child.count() == 1)
    val row = child.collect().head
    assert(row.getAs[String]("__parent_id") == "a@x.com")
    assert(row.getAs[String]("k1") == "v1")
  }

  test("nested list fans out one row per element (ingestor.py:56-59)") {
    val child = tables("obj.related-list.list")
    assert(child.count() == 2)
    assert(child.select("n").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(child.select("__parent_id").distinct().as[String].head() == "a@x.com")
  }

  test("atom lists wrap as element column (ingestor.py:67-69)") {
    val child = tables("obj.tags.list")
    assert(child.columns.contains("element"))
    assert(child.select("element").as[String].collect().sorted.toSeq == Seq("t1", "t2", "t3"))
  }

  test("empty objects shred to an id-only root (test_ingestors.py:64-66)") {
    val t = ObjIngestor.shredJson(spark, Seq("""{"only": 1}""").toDS(), rootName = "r")
    assert(t("r").count() == 1)
  }

  test("dumpAll persists every table as a repo (ingestor.py:87-98)") {
    val repos = ObjIngestor.dumpAll(spark, tables, scratch("shred-dump"))
    assert(repos.keySet == tables.keySet)
    repos.foreach { case (path, repo) =>
      assert(repo.count() == tables(path).count())
    }
  }

  test("shape routing survives field names containing commas") {
    val js = Seq("""{"id_": "x1", "a,b": 1}""", """{"id_": "x2", "a": 1, "b": 2}""")
    val t = ObjIngestor.shredJson(spark, js.toDS(), rootName = "r", idCol = Some("id_"))
    val byShape = ObjIngestor.routeByShape(t)("r")
    // a comma-named field must neither crash the projection nor collide
    // with the {a, b} shape into one schema code
    assert(byShape.size == 2, s"shapes collided: ${byShape.keySet}")
    assert(byShape.values.map(_.count()).toSeq.sorted == Seq(1L, 1L))
  }

  test("JSON keys containing dots shred as plain columns, not struct accesses") {
    val js = Seq("""{"id_": "x1", "a.b": 7, "c": {"d.e": 8}, "l.s": [1, 2]}""")
    val t = ObjIngestor.shredJson(spark, js.toDS(), rootName = "r", idCol = Some("id_"))
    assert(t("r").columns.contains("a.b"), t("r").columns.toSeq.toString)
    assert(t("r").select(org.apache.spark.sql.functions.col("`a.b`")).head().getLong(0) == 7L)
    assert(t("r.c").columns.contains("d.e"))
    assert(t("r.l.s.list").count() == 2)
  }

  test("reserved meta names in the input are refused, not silently clobbered") {
    val js = Seq("""{"id_": "x1", "__id": "boom"}""")
    val ex = intercept[IllegalArgumentException] {
      ObjIngestor.shredJson(spark, js.toDS(), rootName = "r", idCol = Some("id_"))
    }
    assert(ex.getMessage.contains("reserved column name"), ex.getMessage)
    val nested = Seq("""{"id_": "x1", "c": {"__pos": 1}}""")
    intercept[IllegalArgumentException] {
      ObjIngestor.shredJson(spark, nested.toDS(), rootName = "r", idCol = Some("id_"))
    }
  }

  test("distinct paths whose sanitized names collide get distinct repos") {
    val df1 = Seq(("a", 1L)).toDF("k", "v")
    val df2 = Seq(("b", 2L), ("c", 3L)).toDF("k", "v")
    // both sanitize to "root.a_b" under the plain replaceAll
    val repos = ObjIngestor.dumpAll(spark,
      Map("root.a b" -> df1, "root.a/b" -> df2), scratch("shred-collide"))
    assert(repos("root.a b").root != repos("root.a/b").root,
      "colliding sanitizations must not share a repo directory")
    assert(repos("root.a b").count() == 1)
    assert(repos("root.a/b").count() == 2)
  }

  test("sanitized names are per-path stable: a later collision never relocates an earlier table") {
    val base = scratch("shred-stable")
    val df1 = Seq(("a", 1L)).toDF("k", "v")
    val r1 = ObjIngestor.dumpAll(spark, Map("root.a b" -> df1), base)
    // the second dump INTRODUCES the sanitization collision; were suffixes
    // keyed off the call's colliding set, 'root.a b' would now resolve to
    // a different directory and split one logical table across two repos
    val r2 = ObjIngestor.dumpAll(spark,
      Map("root.a b" -> df1, "root.a/b" -> Seq(("b", 2L)).toDF("k", "v")), base)
    assert(r1("root.a b").root == r2("root.a b").root,
      "safeName must be a pure function of the path")
    assert(r2("root.a b").count() == 2, "the incremental dump extends in place")
    assert(r2("root.a/b").count() == 1)
  }

  test("dumpAll refuses a suffixed path whose legacy-named directory exists unclaimed") {
    val base = scratch("shred-legacy")
    // a clean path legitimately owns the un-suffixed directory
    ObjIngestor.dumpAll(spark, Map("root.a_b" -> Seq(("a", 1L)).toDF("k", "v")), base)
    // "root.a b" sanitizes to that same name (so it gets hash-suffixed);
    // dumped ALONE it cannot tell the clean table's directory from its
    // own pre-suffix legacy directory — forking silently would split one
    // logical table, so the dump must refuse with migration instructions
    val ex = intercept[IllegalStateException] {
      ObjIngestor.dumpAll(spark, Map("root.a b" -> Seq(("x", 9L)).toDF("k", "v")), base)
    }
    assert(ex.getMessage.contains("pre-hash-suffix"), ex.getMessage)
    // dumped together, the clean path CLAIMS the legacy name: no ambiguity
    val both = ObjIngestor.dumpAll(spark, Map(
      "root.a b" -> Seq(("x", 9L)).toDF("k", "v"),
      "root.a_b" -> Seq(("b", 2L)).toDF("k", "v")), base)
    assert(both("root.a b").count() == 1)
    assert(both("root.a_b").count() == 2)
    // once the suffixed directory exists, the lone incremental dump is
    // unambiguous again and extends in place
    val again = ObjIngestor.dumpAll(spark, Map("root.a b" -> Seq(("y", 8L)).toDF("k", "v")), base)
    assert(again("root.a b").count() == 2)
  }

  test("key-map.json merges across incremental dumps instead of overwriting") {
    val base = scratch("shred-routed-incr")
    val t1 = ObjIngestor.shredJson(spark,
      Seq("""{"id_": "x1", "a": 1}""").toDS(), rootName = "r", idCol = Some("id_"))
    val codes1 = ObjIngestor.dumpAllRouted(spark, t1, base).keys.map(_._2).toSet
    val t2 = ObjIngestor.shredJson(spark,
      Seq("""{"id_": "x2", "b": "u"}""").toDS(), rootName = "r", idCol = Some("id_"))
    val codes2 = ObjIngestor.dumpAllRouted(spark, t2, base).keys.map(_._2).toSet
    assert(codes1 != codes2, "sanity: the two dumps carry different shapes")
    val keyMap = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/key-map.json")), "UTF-8")
    (codes1 ++ codes2).foreach(code =>
      assert(keyMap.contains(code), s"sidecar lost $code after the second dump"))
  }

  test("heterogeneous shapes split into md5-coded tables + key-map (ingestor.py:77-109)") {
    val js = Seq(
      """{"id_": "x1", "a": 1, "b": "u"}""",
      """{"id_": "x2", "a": 2, "c": true}""",
      """{"id_": "x3", "a": 3, "c": false}""")
    val t = ObjIngestor.shredJson(spark, js.toDS(), rootName = "r", idCol = Some("id_"))
    val routed = ObjIngestor.routeByShape(t)
    val byShape = routed("r")
    assert(byShape.size == 2, s"expected 2 shapes, got ${byShape.keySet}")
    assert(byShape.values.map(_.count()).toSeq.sorted == Seq(1L, 2L))
    // each shape table carries only its present fields (plus meta cols)
    val colSets = byShape.values.map(_.columns.toSet - "__id").toSet
    assert(colSets == Set(Set("a", "b", "id_"), Set("a", "c", "id_")))

    val base = scratch("shred-routed")
    val repos = ObjIngestor.dumpAllRouted(spark, t, base)
    assert(repos.size == 2)
    repos.foreach { case ((_, code), repo) => assert(repo.count() == byShape(code).count()) }
    val keyMap = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/key-map.json")), "UTF-8")
    byShape.keys.foreach(code => assert(keyMap.contains(code)))
  }
}
