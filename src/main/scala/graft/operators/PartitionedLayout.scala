package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Hive-partitioned parquet layout — the directory-level complement to
  * [[BucketedLayout]] (which hashes within files): low-cardinality
  * predicate columns (lang, date, source) become directories, so a
  * filtered scan PRUNES whole partitions at planning time —
  * `PartitionFilters` in the scan node, zero I/O for non-matching
  * directories — where an unpartitioned table must read every file and
  * rely on row-group statistics.
  *
  * The write repartitions by the partition columns first: without it,
  * EVERY shuffle task holding rows of a partition opens its own file in
  * that directory — numTasks × numPartitions small files, the classic
  * partitioned-write explosion that murders both the write (file-open
  * storms) and every later scan (footer reads). With it, each partition
  * directory is written by the task(s) owning that key — file count per
  * directory is O(1), bounded further by `maxRecordsPerFile` so a hot
  * partition splits instead of producing one giant file.
  *
  * Partition-column choice at 100 TB: cardinality must stay in the
  * thousands (directories are metadata operations on the driver and the
  * store); skewed values are FINE here — unlike a shuffle key, a big
  * directory just holds more files via maxRecordsPerFile. High-cardinality
  * or equi-join keys belong in [[BucketedLayout]]; range+multi-dimension
  * predicates in [[ZOrder]].
  */
object PartitionedLayout {

  /** Write `df` partitioned by `parts`, one writer per partition value
    * (see class doc), splitting files past `maxRecordsPerFile` rows. */
  def write(df: DataFrame, outDir: String, parts: Seq[String],
      maxRecordsPerFile: Long = 5000000L): Unit = {
    require(parts.nonEmpty, "need at least one partition column")
    df.repartition(parts.map(col): _*)
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(parts: _*)
      .mode("overwrite")
      .parquet(outDir)
  }

  /** Read back a partitioned table (partition columns are reconstructed
    * from the directory structure by the parquet source). */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
