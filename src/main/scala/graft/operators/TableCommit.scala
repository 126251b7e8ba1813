package graft.operators

import org.apache.spark.sql.SparkSession

/** Single-winner commit protocol for the standing snapshot/index tables
  * ([[SnapshotMerge]], [[IncrementalDedup]], [[IvfIndex]]) — the piece a
  * real lakehouse table format (Delta/Iceberg) provides that a bare
  * stage-and-swap lacks: two CONCURRENT writers must serialize or fail
  * loudly, never interleave a mixed snapshot.
  *
  * Mechanism, filesystem-only (works on local FS and HDFS-compatible
  * stores; object stores would swap in their conditional-put):
  *
  *  - EPOCH: each table has a monotonically increasing commit epoch in
  *    `<warehouse>/.commits/<table>.epoch`, updated by write-tmp +
  *    atomic rename. A writer records the epoch its merge was BASED ON
  *    and commits only if the epoch is unchanged — the optimistic CAS.
  *    A writer that lost the race fails with
  *    [[TableCommit.ConcurrentWriteException]] and must re-read the new
  *    snapshot and retry (its work was based on a superseded state; a
  *    blind swap would silently drop the winner's delta).
  *  - LOCK: the epoch-check + swap + epoch-bump critical section is
  *    guarded by `<warehouse>/.commits/<table>.lock`, acquired by atomic
  *    create-if-absent. Losing the lock ALSO raises
  *    ConcurrentWriteException immediately (no blocking in an executor-
  *    adjacent path; callers own retry policy). A lock abandoned by a
  *    crashed writer is detected by age and broken explicitly
  *    ([[breakStaleLock]]) — the documented operational step, same as
  *    Delta's `FSCK`-style recovery.
  *
  * The heavy work (stage-table write) happens OUTSIDE the lock; only the
  * O(1) catalog swap and epoch bump are inside, so the protocol adds no
  * scaling cost at 100 TB. `TableCommitSpec` drives two racing writers:
  * one wins, one gets ConcurrentWriteException, and the surviving
  * snapshot is exactly the winner's.
  */
object TableCommit {

  final class ConcurrentWriteException(msg: String)
    extends RuntimeException(msg)

  private def commitsDir(spark: SparkSession) = new org.apache.hadoop.fs.Path(
    spark.conf.get("spark.sql.warehouse.dir"), ".commits")

  private def fs(spark: SparkSession) =
    commitsDir(spark).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def epochPath(spark: SparkSession, table: String) =
    new org.apache.hadoop.fs.Path(commitsDir(spark),
      s"${table.toLowerCase}.epoch")

  private def lockPath(spark: SparkSession, table: String) =
    new org.apache.hadoop.fs.Path(commitsDir(spark),
      s"${table.toLowerCase}.lock")

  /** The table's current commit epoch (0 = never committed through the
    * protocol). */
  def epochOf(spark: SparkSession, table: String): Long = {
    val f = fs(spark)
    val p = epochPath(spark, table)
    if (!f.exists(p)) 0L
    else {
      val in = f.open(p)
      try new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        .trim.toLong
      finally in.close()
    }
  }

  private def writeEpoch(spark: SparkSession, table: String,
      epoch: Long): Unit = {
    val f = fs(spark)
    val tmp = new org.apache.hadoop.fs.Path(commitsDir(spark),
      s"${table.toLowerCase}.epoch.tmp")
    val out = f.create(tmp, true)
    try out.write(epoch.toString.getBytes("UTF-8")) finally out.close()
    val dst = epochPath(spark, table)
    if (f.exists(dst)) f.delete(dst, false)
    if (!f.rename(tmp, dst))
      throw new java.io.IOException(s"epoch rename failed for $table")
  }

  /** Run `swap` (the O(1) catalog swap) iff the table's epoch still
    * equals `basedOnEpoch`, under the table's commit lock; bumps the
    * epoch on success. Throws [[ConcurrentWriteException]] when the lock
    * is held or the epoch moved — the caller re-reads and retries. */
  def commit[T](spark: SparkSession, table: String, basedOnEpoch: Long)(
      swap: => T): T = {
    val f = fs(spark)
    f.mkdirs(commitsDir(spark))
    val lock = lockPath(spark, table)
    val acquired =
      try { f.create(lock, false).close(); true }
      catch { case _: java.io.IOException => false }
    if (!acquired)
      throw new ConcurrentWriteException(
        s"commit lock held for '$table' ($lock); a writer is mid-swap " +
          "(or crashed — see breakStaleLock)")
    try {
      val now = epochOf(spark, table)
      if (now != basedOnEpoch)
        throw new ConcurrentWriteException(
          s"snapshot of '$table' moved: merge based on epoch " +
            s"$basedOnEpoch but table is at $now — re-read and retry")
      val r = swap
      writeEpoch(spark, table, now + 1)
      r
    } finally f.delete(lock, false)
  }

  /** Break a lock abandoned by a crashed writer, iff older than
    * `minAgeMs` (default 10 min). Returns true when a lock was broken. */
  def breakStaleLock(spark: SparkSession, table: String,
      minAgeMs: Long = 600000L): Boolean = {
    val f = fs(spark)
    val lock = lockPath(spark, table)
    if (!f.exists(lock)) false
    else {
      val age = System.currentTimeMillis() -
        f.getFileStatus(lock).getModificationTime
      if (age >= minAgeMs) f.delete(lock, false) else false
    }
  }

  private def markerPath(spark: SparkSession, table: String,
      suffix: String) = new org.apache.hadoop.fs.Path(commitsDir(spark),
    s"${table.toLowerCase}.$suffix")

  /** Read a small per-table marker file from the commits dir (e.g. a
    * streaming sink's last-applied batch id). */
  def readMarker(spark: SparkSession, table: String,
      suffix: String): Option[String] = {
    val f = fs(spark)
    val p = markerPath(spark, table, suffix)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim)
      finally in.close()
    }
  }

  /** Write a per-table marker file (write-tmp + atomic rename, like the
    * epoch file). */
  def writeMarker(spark: SparkSession, table: String, suffix: String,
      value: String): Unit = {
    val f = fs(spark)
    f.mkdirs(commitsDir(spark))
    val tmp = new org.apache.hadoop.fs.Path(commitsDir(spark),
      s"${table.toLowerCase}.$suffix.tmp")
    val out = f.create(tmp, true)
    try out.write(value.getBytes("UTF-8")) finally out.close()
    val dst = markerPath(spark, table, suffix)
    if (f.exists(dst)) f.delete(dst, false)
    if (!f.rename(tmp, dst))
      throw new java.io.IOException(s"marker rename failed for $table")
  }

  /** Drop the table's commit state (epoch file + any lock) — the
    * maintenance/test helper a DROP TABLE of a protocol-managed table
    * pairs with. Never call while a writer is live: a racing commit
    * against a reset epoch would CAS on stale state. */
  def reset(spark: SparkSession, table: String): Unit = {
    val f = fs(spark)
    f.delete(epochPath(spark, table), false)
    f.delete(lockPath(spark, table), false)
    f.delete(markerPath(spark, table, "stream"), false)
  }
}
