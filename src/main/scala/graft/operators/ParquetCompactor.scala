package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small-files compaction for streaming parquet sinks.
  *
  * A continuously-running ingest query appends one file per task per
  * trigger (EpicStreaming's 5 s cadence ⇒ ~17k files/day/sink even at one
  * task per trigger); at cluster scale the file count, not the byte count,
  * becomes the bottleneck — parquet footer reads, listing RPCs, and
  * driver-side split planning all scale with files. This utility rewrites
  * a directory into ~`targetFileBytes` files.
  *
  * Concurrency contract (explicit, not magic): `compact` must not run
  * against a directory a writer is APPENDING to mid-rewrite — parquet
  * directories are not transactional logs. The two safe patterns are:
  *  - `compactPartitioned`: compact only CLOSED partitions (every
  *    partition except the lexicographically latest, which the streaming
  *    sink is still filling) — the steady-state shape for date/hour-
  *    partitioned streaming output;
  *  - `compact` between triggers / on a stopped query, e.g. from a
  *    maintenance window.
  * Concurrent READERS of the compacted directory should retry on a
  * missing-file error (same caveat as any non-table-format parquet swap;
  * a table format's manifest is the heavyweight alternative).
  *
  * The swap is crash-safe for the data: the rewrite lands in a hidden
  * sibling (`.compact-tmp`), the old directory moves aside before the
  * rename, and the old bytes are deleted only after the new directory is
  * in place — a crash at any point leaves either the old or the new
  * complete directory recoverable on disk, never neither.
  */
object ParquetCompactor {

  case class CompactionResult(dir: String, filesBefore: Int,
      filesAfter: Int, bytes: Long, skipped: Boolean)

  private def fs(spark: SparkSession): FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def dataFiles(f: FileSystem, dir: Path): Seq[org.apache.hadoop.fs.FileStatus] =
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).toSeq.filter(s => s.isFile &&
      s.getPath.getName.endsWith(".parquet"))

  /** Rewrite `dir` into ceil(bytes / targetFileBytes) files. No-op (and
    * `skipped = true`) when the directory already has ≤ `minFiles` files —
    * compaction itself costs a full read+write, so it must not run on
    * every tick. */
  def compact(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L << 20, minFiles: Int = 8): CompactionResult = {
    val f = fs(spark)
    val p = new Path(dir)
    val files = dataFiles(f, p)
    val bytes = files.map(_.getLen).sum
    if (files.size <= minFiles)
      return CompactionResult(dir, files.size, files.size, bytes,
        skipped = true)
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val tmp = new Path(p.getParent, s".compact-tmp-${p.getName}")
    val old = new Path(p.getParent, s".compact-old-${p.getName}")
    f.delete(tmp, true); f.delete(old, true)
    spark.read.parquet(dir).repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    val after = dataFiles(f, tmp).size
    // old aside → new in place → old reclaimed (each rename atomic)
    require(f.rename(p, old), s"compact: could not move $p aside")
    require(f.rename(tmp, p), s"compact: could not publish $tmp")
    f.delete(old, true)
    CompactionResult(dir, files.size, after, bytes, skipped = false)
  }

  /** Compact every partition subdirectory of `root` EXCEPT the
    * lexicographically greatest (the one a streaming writer is still
    * appending to — date/hour partition values sort with time). Returns
    * one result per compacted partition. */
  def compactPartitioned(spark: SparkSession, root: String,
      targetFileBytes: Long = 128L << 20, minFiles: Int = 8)
      : Seq[CompactionResult] = {
    val f = fs(spark)
    val r = new Path(root)
    if (!f.exists(r)) return Nil
    val parts = f.listStatus(r).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .sortBy(_.getPath.getName)
    if (parts.size < 2) return Nil
    parts.dropRight(1).map(s =>
      compact(spark, s.getPath.toString, targetFileBytes, minFiles))
  }
}
