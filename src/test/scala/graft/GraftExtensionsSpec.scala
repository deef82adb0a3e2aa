package graft

import graft.SparkSuite

/** The SQL surface of the native expressions: same results as the Column
  * API (HashBucketSpec / VectorFnsSpec cover those), reachable from plain
  * `spark.sql`.
  */
class GraftExtensionsSpec extends SparkSuite {

  test("injected SQL functions match the published reference values") {
    GraftExtensions.register(spark)
    // md5("e") % 3 == 1, % 300 == 166 (reference tests/test_core.py:270-280)
    val r = spark.sql(
      "SELECT graft_md5_mod('e', 3) AS a, graft_md5_mod('e', 300) AS b").head()
    assert((r.getInt(0), r.getInt(1)) == ((1, 166)))
    val dot = spark.sql(
      """SELECT graft_vec_dot(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
        |                     CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS d""".stripMargin)
      .head().getDouble(0)
    assert(dot == 11.0)
    // non-literal modulus is rejected with a clear message
    val err = intercept[Exception](
      spark.sql("SELECT graft_md5_mod('e', CAST(rand() * 10 AS INT))").head())
    assert(err.getMessage.contains("literal INT"))
    // a non-string key coerces like the Column API (cast to its string
    // rendering) instead of a mid-job ClassCastException
    val n = spark.sql("SELECT graft_md5_mod(CAST(7 AS BIGINT), 3) AS a").head().getInt(0)
    val s = spark.sql("SELECT graft_md5_mod('7', 3) AS a").head().getInt(0)
    assert(n == s, "BIGINT key must hash as its string rendering")
  }

  test("the extensions class injects without error at builder time") {
    // config path (spark.sql.extensions) is construction-only; exercising
    // apply() against a fresh extensions container proves the wiring
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
