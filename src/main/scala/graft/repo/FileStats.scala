package graft.repo

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.spark.SerializableWritable
import org.apache.spark.sql.SparkSession

/** Per-FILE column min/max from Parquet footer metadata — the statistics
  * layer under file-granularity merge pruning ([[TableRepo.replaceRecordsPruned]]).
  *
  * Lakehouse formats (Delta/Iceberg) keep these ranges in a manifest; a
  * bare-Parquet repo has exactly the same information in every file's
  * footer, it just has to be read. The read is metadata-only (footer tail,
  * no row groups) and runs DISTRIBUTED — one task per slice of the file
  * list — so a 100k-file table costs one short metadata job, not a driver
  * loop over 100k remote opens. The collected result is one (path, min,
  * max) triple per file: bounded by file count, the same cardinality class
  * as the repo's `paths` listing.
  *
  * A file with no usable statistics for the column (ancient writer,
  * all-null chunk) yields None — callers must treat such files as
  * ALWAYS-affected. Pruning correctness never depends on stats presence.
  */
object FileStats {

  /** (path -> Some(min, max)) per file, None where stats are unusable.
    * Values are JVM-boxed to match Spark's row layout for the column's
    * type: Int/Long/Float/Double/Boolean primitives, Binary as UTF-8
    * String.
    */
  def columnRanges(spark: SparkSession, files: Seq[String], column: String)
      : Seq[(String, Option[(Any, Any)])] = {
    if (files.isEmpty) return Nil
    val conf = new SerializableWritable(spark.sparkContext.hadoopConfiguration)
    val slices = math.max(1, math.min(files.size, 64))
    spark.sparkContext.parallelize(files, slices)
      .map(f => (f, rangeOf(conf.value, f, column)))
      .collect().toSeq
  }

  /** Footer-only min/max of `column` across all row groups of one file. */
  private def rangeOf(conf: Configuration, file: String, column: String): Option[(Any, Any)] = {
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(file), conf))
    try {
      val blocks = r.getFooter.getBlocks
      var min: Comparable[Any] = null
      var max: Comparable[Any] = null
      var ok = !blocks.isEmpty
      val it = blocks.iterator()
      while (ok && it.hasNext) {
        val chunk = it.next().getColumns.asScala.iterator
          .find(_.getPath.toDotString == column)
          .orNull
        val stats = if (chunk == null) null else chunk.getStatistics
        // every row group needs usable stats, else the FILE range is unknown
        if (stats == null || stats.isEmpty || !stats.hasNonNullValue) ok = false
        else {
          val lo = stats.genericGetMin.asInstanceOf[Comparable[Any]]
          val hi = stats.genericGetMax.asInstanceOf[Comparable[Any]]
          if (min == null || lo.compareTo(min) < 0) min = lo
          if (max == null || hi.compareTo(max) > 0) max = hi
        }
      }
      if (!ok) None else Some((unbox(min), unbox(max)))
    } finally r.close()
  }

  /** Parquet stat values -> Spark-row-compatible JVM values. */
  private def unbox(v: Any): Any = v match {
    case b: Binary => b.toStringUsingUTF8
    case other     => other
  }

}
