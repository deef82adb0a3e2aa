package graft.repo

import java.math.BigInteger
import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** md5-mod-n hash bucketing with the same observable contract as the
  * reference `HashPartitioner` (/root/reference/parquetranger/core.py:25-44):
  * bucket(v) = int(md5(str(v)).hexdigest(), 16) % n, rendered as a string
  * zero-padded to `floor(log10(n)) + 1` digits
  * (contract: /root/reference/parquetranger/tests/test_core.py:270-280 —
  * md5("e") % 3 == 1, md5("e") % 300 == 166).
  *
  * Implemented as a native Catalyst expression with codegen (not a Scala
  * UDF) so it stays inside whole-stage codegen on the hot write path.
  */
object Md5Mod {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Big-endian 128-bit md5 value of the UTF-8 bytes, mod n. Called from
    * generated code — keep signature (UTF8String, int) -> int.
    */
  def md5mod(s: UTF8String, n: Int): Int = {
    val md = digest.get()
    md.reset()
    new BigInteger(1, md.digest(s.getBytes)).mod(BigInteger.valueOf(n.toLong)).intValue()
  }
}

case class Md5ModExpr(child: Expression, n: Int) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  require(n > 0, s"modulus must be positive, got $n")
  // STRING input with implicit-cast semantics, declared at the expression
  // itself: a raw long child used to pass analysis and ClassCastException
  // mid-job (interpreted) or fail Janino compilation (codegen) — each
  // wrapper re-added its own Cast to compensate; now any castable child
  // hashes its string rendering, matching the wrappers' behavior
  override def inputTypes = Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any = Md5Mod.md5mod(v.asInstanceOf[UTF8String], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.repo.Md5Mod.md5mod($c, $n)")
  override protected def withNewChildInternal(c: Expression): Md5ModExpr = copy(child = c)
  override def prettyName: String = "md5_mod"
}

/** Declarative request for md5-bucketed layout: partition a repo by
  * `bucket(col) = md5(str(col)) % numGroups` — the reference's
  * `HashPartitioner` used as `group_cols` (core.py:25-44; default
  * num_groups=128, core.py:62). Makes keyed upsert partition-scoped on
  * otherwise-unpartitioned tables: the bucket is a pure function of the key,
  * so an upsert rewrites only the buckets its keys land in.
  */
case class HashBucketLayout(col: String, numGroups: Int = 128)

/** Column-level API for md5 bucketing. `numGroups` buckets over the string
  * form of `c` (non-string inputs are cast to string first, mirroring the
  * reference's `str(v)`).
  *
  * PARITY DOMAIN: bucket ids match the reference bit-for-bit for STRING
  * and INTEGRAL keys — the domains its contract tests exercise
  * (tests/test_core.py:270-280) — because Python `str(v)` and Spark
  * `cast(string)` render them identically. Outside that domain the
  * engines' renderings differ by design and this library keeps SPARK's:
  * booleans render 'true'/'false' (Python 'True'/'False'), large doubles
  * '1.0E16' (Python '1e+16'), and a NULL key buckets to the engine's
  * null partition rather than Python's md5('None') bucket — emulating
  * CPython repr quirks would make the layout alien to every other Spark
  * reader of the same table.
  */
object HashBucket {
  /** Bucket id as an int in [0, numGroups). */
  def bucket(c: Column, numGroups: Int): Column =
    GraftSql.column(Md5ModExpr(GraftSql.expression(c.cast("string")), numGroups))

  /** Zero-padded string form, the reference's partition-directory name:
    * width = floor(log10(n)) + 1 (core.py:37-40).
    */
  def bucketStr(c: Column, numGroups: Int): Column = {
    val width = math.log10(numGroups.toDouble).toInt + 1
    lpad(bucket(c, numGroups).cast("string"), width, "0")
  }
}
