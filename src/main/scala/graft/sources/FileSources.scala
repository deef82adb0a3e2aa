package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.repo.TableRepo

/** Non-parquet ingestion sources feeding the repo's schema machinery.
  *
  * The reference ingests pandas frames and Python objects
  * (core.py:91-112, ingestor.py); the equivalent operational need at
  * scale is landing JSONL / CSV drops into a governed parquet repo. Both
  * readers here are thin by design: Spark's datasource does the
  * distributed parse (schema inference or an explicit schema — pass one
  * in production: inference is a full extra scan of the input), and
  * `TableRepo.extend` applies the repo's pinned-schema contract — casts,
  * null backfill for missing columns, silent drop of unknown columns —
  * so a malformed drop cannot corrupt the table's schema
  * (`FileSourcesSpec` proves both directions).
  */
object FileSources {

  /** Read newline-delimited JSON. `multiLine=false` keeps the parse
    * splittable — each worker parses its own byte range, which is the
    * property that lets a 100 TB drop land in parallel.
    */
  def jsonl(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("multiLine", "false")
    schema.fold(r)(r.schema).json(path)
  }

  /** Read headered CSV; explicit schema recommended for type stability
    * (inference samples and can flip types between drops).
    */
  def csv(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("header", "true")
    schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path)
  }

  /** Read ORC (native Spark datasource — columnar drops from Hive-era
    * pipelines land without conversion). ORC carries its own schema, so
    * `schema` here is a projection/cast contract like the parquet pinned
    * read, not inference avoidance.
    */
  def orc(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(r.schema).orc(path)
  }

  /** Land a source file into the repo under its pinned schema. */
  def ingest(repo: TableRepo, df: DataFrame): Unit = repo.extend(df)
}
