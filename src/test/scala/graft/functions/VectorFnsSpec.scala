package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSuite

class VectorFnsSpec extends SparkSuite {
  import spark.implicits._

  test("native FloatVecDot is bit-identical to the HOF fold") {
    val rng = new Random(42)
    val rows = (0 until 100).map { i =>
      (i.toLong, Array.fill(64)(rng.nextFloat()), Array.fill(64)(rng.nextFloat()))
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(
        VectorFns.dot($"a", $"b").as("native"),
        VectorFns.dotHof($"a", $"b").as("hof"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("native dot nulls on mismatched lengths, exactly like the HOF fold") {
    // zip_with null-pads the shorter side, which nulls the whole fold —
    // the native expressions must match, not silently truncate
    val df = Seq((1L, Array(1f, 2f, 3f), Array(1f, 2f))).toDF("id", "a", "b")
    val r = df.select(
      VectorFns.dot($"a", $"b").as("native"),
      VectorFns.dotHof($"a", $"b").as("hof")).first()
    assert(r.isNullAt(0) && r.isNullAt(1))
    val mixed = Seq((1L, Array(1f, 2f, 3f), Array(1.0, 2.0))).toDF("id", "a", "b")
    assert(mixed.select(VectorFns.dotMixed($"a", $"b")).first().isNullAt(0))
  }

  test("native dot nulls on null ELEMENTS, exactly like the HOF fold") {
    // a null product poisons the zip_with/aggregate fold; the native
    // expressions must null too, not read the zeroed slot as 0.0
    val df = Seq(
      (1L, Seq[Option[Float]](Some(1f), None, Some(2f)),
        Seq[Option[Float]](Some(1f), Some(1f), Some(1f))),
      (2L, Seq[Option[Float]](Some(1f), Some(2f), Some(3f)),
        Seq[Option[Float]](Some(2f), Some(1f), Some(1f))))
      .toDF("id", "a", "b")
    val rows = df.orderBy($"id").select(
      VectorFns.dot($"a", $"b").as("native"),
      VectorFns.dotHof($"a", $"b").as("hof")).collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1),
      "null element must null both formulations")
    assert(java.lang.Double.doubleToLongBits(rows(1).getDouble(0)) ==
      java.lang.Double.doubleToLongBits(rows(1).getDouble(1)),
      "null-free rows through a containsNull=true schema still match bitwise")
    val mixed = Seq((1L, Seq[Option[Float]](Some(1f), None),
      Seq[Option[Double]](Some(1.0), Some(2.0)))).toDF("id", "a", "b")
    assert(mixed.select(VectorFns.dotMixed($"a", $"b")).first().isNullAt(0))
  }

  test("mistyped operands fail at analysis time, not with garbage values") {
    // an array<double> on a float slot would getFloat 8-byte elements out
    // of UnsafeArrayData — inputTypes must reject it before execution
    val df = Seq((1L, Array(1.0, 2.0), Array(1f, 2f))).toDF("id", "d", "f")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(VectorFns.dot($"d", $"d")).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(VectorFns.dotMixed($"d", $"d")).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(VectorFns.dotMixed($"f", $"f")).collect()
    }
  }

  test("cosine of a vector with itself is 1") {
    val df = Seq((1L, Array.fill(8)(0.5f))).toDF("id", "v")
    val c = df.select(VectorFns.cosine($"v", $"v")).first().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("srpBucket is deterministic and within bit range") {
    val rng = new Random(7)
    val df = (0 until 50).map(i => (i.toLong, Array.fill(16)(rng.nextFloat() - 0.5f)))
      .toDF("id", "v")
    val b1 = df.select(VectorFns.srpBucket($"v", bits = 4, dim = 16).as("b")).as[Long].collect()
    val b2 = df.select(VectorFns.srpBucket($"v", bits = 4, dim = 16).as("b")).as[Long].collect()
    assert(b1.toSeq == b2.toSeq)
    assert(b1.forall(b => b >= 0 && b < 16))
  }

  test("srp hyperplanes are pairwise independent (no linear-parity collapse)") {
    // A linear sign rule like (i*31 + j*17) mod 2 reduces to (i+j) mod 2:
    // plane i+2 == plane i and plane i+1 == -plane i, collapsing a b-bit
    // bucket to ONE effective bit. Assert the mixed planes have no such
    // equal/negated pair, within a table and across tables.
    val planes = for (t <- 0 until 4; i <- 0 until 8) yield ((t, i), VectorFns.srpPlane(t, i, 64).toSeq)
    for (((k1, p1), x) <- planes.zipWithIndex; (k2, p2) <- planes.drop(x + 1)) {
      assert(p1 != p2, s"planes $k1 and $k2 are identical")
      assert(p1 != p2.map(-_), s"planes $k1 and $k2 are negations")
    }
  }

  test("srpBucket spreads random vectors across many buckets") {
    val rng = new Random(11)
    val df = (0 until 500).map(i => (i.toLong, Array.fill(64)(rng.nextFloat() - 0.5f)))
      .toDF("id", "v")
    val distinctBuckets = df.select(VectorFns.srpBucket($"v", bits = 8, dim = 64).as("b"))
      .distinct().count()
    // 500 random vectors over 256 well-mixed buckets: expect most buckets
    // hit; the degenerate parity planes produced exactly 2
    assert(distinctBuckets > 100, s"only $distinctBuckets distinct buckets — planes are degenerate")
  }

  test("srpBitsFor targets bounded mean bucket occupancy") {
    assert(VectorFns.srpBitsFor(100) == 8)           // floor
    assert(VectorFns.srpBitsFor(2048, 8) == 8)       // 2048/256 = 8
    assert(VectorFns.srpBitsFor(20480, 8) == 12)     // 10x corpus -> +log2(10)
    assert(VectorFns.srpBitsFor(1L << 40, 8) == 37)  // 100 TB-ish corpus still fine
  }
}
