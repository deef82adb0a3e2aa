package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared session + scratch helpers for all suites. */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSuite.session

  def scratch(name: String): String = {
    val dir = new java.io.File(s"target/test-scratch/$name-${System.nanoTime()}")
    dir.getParentFile.mkdirs()
    dir.getAbsolutePath
  }

  /** Order-insensitive DataFrame equality on collected rows. */
  def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.columns.toSeq == b.columns.toSeq, s"columns: ${a.columns.toSeq} vs ${b.columns.toSeq}")
    val ra = a.collect().map(_.toString).sorted.toSeq
    val rb = b.collect().map(_.toString).sorted.toSeq
    assert(ra == rb, s"rows differ:\n first=${ra.take(5)}\n second=${rb.take(5)}")
  }
}

object SparkSuite {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
