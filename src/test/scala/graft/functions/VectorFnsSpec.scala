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
}
