package graft.repo

import org.apache.spark.sql.types._

import graft.SparkSuite

/** Port of the reference's schema-drift contract
  * (/root/reference/parquetranger/tests/test_diff_cols.py).
  */
class SchemaSpec extends SparkSuite {
  import spark.implicits._

  test("F4a: missing column null-backfilled, unknown column dropped (diff_cols.py:33-45)") {
    val repo = new TableRepo(scratch("f4a"), spark)
    repo.extend(Seq((1L, "x"), (2L, "y")).toDF("A", "C"))
    repo.extend(Seq((10L, "z")).toDF("B", "C")) // A missing, B unknown
    val out = repo.getFullDf
    assert(out.columns.toSeq == Seq("A", "C"))
    assert(out.filter($"C" === "z").select("A").collect().head.isNullAt(0))
  }

  test("F4a+extension: new column widens schema and rewrites history (diff_cols.py:15-30)") {
    val repo = new TableRepo(scratch("f4a-ext"), spark, allowSchemaExtension = true)
    repo.extend(Seq((1L, "x")).toDF("A", "C"))
    repo.extend(Seq((10L, "z")).toDF("B", "C"))
    val out = repo.getFullDf
    assert(out.columns.toSeq == Seq("A", "C", "B"))
    // old row null-backfilled for B, new row null for A
    assert(out.filter($"C" === "x").select("B").collect().head.isNullAt(0))
    assert(out.filter($"C" === "z").select("A").collect().head.isNullAt(0))
    assert(out.filter($"C" === "z").select("B").as[Long].head() == 10L)
  }

  test("a second handle's schema widening is seen through the pinned-schema cache") {
    // the sidecar parse is cached per handle keyed on (mtime, length);
    // a DIFFERENT handle (or process) widening the pin must invalidate
    // naturally through the changed sidecar bytes — a stale cache here
    // would make this handle write un-widened batches forever
    val root = scratch("schema-cache")
    val a = new TableRepo(root, spark, allowSchemaExtension = true)
    a.extend(Seq((1L, "x")).toDF("A", "C"))
    assert(a.pinnedSchema.get.fieldNames.toSeq == Seq("A", "C"))
    a.pinnedSchema // warm the cache again
    val b = new TableRepo(root, spark, allowSchemaExtension = true)
    b.extend(Seq((2L, "y", 1.5)).toDF("A", "C", "D")) // widens via handle b
    assert(a.pinnedSchema.get.fieldNames.toSeq == Seq("A", "C", "D"),
      "handle a must observe the widened pin, not its cached parse")
    a.extend(Seq((3L, "z")).toDF("A", "C"))
    val out = a.getFullDf
    assert(out.columns.toSeq == Seq("A", "C", "D"))
    assert(out.count() == 3)
    assert(out.filter($"A" === 3L).select("D").collect().head.isNullAt(0),
      "handle a's post-widening append is null-backfilled under the new pin")
  }

  test("F4b: type drift long->double unified to pinned type (diff_cols.py:33-45)") {
    val repo = new TableRepo(scratch("f4b"), spark)
    repo.extend(Seq((1.5, "x")).toDF("A", "C"))
    repo.extend(Seq((2L, "y")).toDF("A", "C")) // long cast to pinned double
    val out = repo.getFullDf
    assert(out.schema("A").dataType == DoubleType)
    assert(out.select("A").as[Double].collect().sorted.toSeq == Seq(1.5, 2.0))
  }

  test("F4c: fixedSchema pins types a-priori (core.py:390-391)") {
    val pinned = StructType(Seq(
      StructField("A", DoubleType), StructField("C", StringType)))
    val repo = new TableRepo(scratch("f4c"), spark, fixedSchema = Some(pinned))
    repo.extend(Seq((2L, "y")).toDF("A", "C"))
    assert(repo.getFullDf.schema("A").dataType == DoubleType)
  }

  test("grouped repos share one schema decision across groups (test_parallel.py:86-94)") {
    val repo = new TableRepo(scratch("gshared"), spark, groupCols = Seq("C"))
    repo.extend(Seq((1L, "x", "g1")).toDF("A", "B", "C"))
    repo.extend(Seq((2L, "g2")).toDF("A", "C")) // B missing in a NEW group
    val out = repo.getFullDf
    assert(out.columns.toSeq == Seq("A", "B", "C"))
    assert(out.filter($"C" === "g2").select("B").collect().head.isNullAt(0))
  }

  test("pinned schemas are deep-nullable: non-null array elements can't wedge the pin") {
    // Spark file sources force every read column (nested nullability
    // included) nullable; a pin captured verbatim from a first in-memory
    // extend whose arrays carried containsNull=false would make later
    // harmonize casts unresolvable (array<float,false> FROM
    // array<float,true>). The pin choke point normalizes — this is the
    // contract the IVF embedding repos lean on.
    val repo = new TableRepo(scratch("deep-null"), spark)
    val first = Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "emb")
    assert(!first.schema("emb").dataType.asInstanceOf[ArrayType].containsNull,
      "precondition: the in-memory frame must carry containsNull=false")
    repo.extend(first)
    assert(repo.pinnedSchema.get("emb").dataType.asInstanceOf[ArrayType].containsNull,
      "the pin must normalize to deep-nullable")
    // the second extend harmonizes a FILE-backed read against the pin
    repo.extend(Seq((2L, Seq(3.0f))).toDF("id", "emb"))
    assert(repo.count() == 2)
    assert(repo.getFullDf.selectExpr("sum(emb[0])").as[Double].head() == 4.0)
  }

  test("timestamps and binary round-trip (test_core.py:254-258,283-300)") {
    val ts = java.sql.Timestamp.valueOf("2023-04-04 00:00:00")
    val repo = new TableRepo(scratch("types"), spark)
    val df = Seq((ts, Array[Byte](1, 2, 3))).toDF("d", "b")
    repo.extend(df)
    val row = repo.getFullDf.collect().head
    assert(row.getTimestamp(0) == ts)
    assert(row.getAs[Array[Byte]](1).toSeq == Seq[Byte](1, 2, 3))
  }
}
