package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CDC snapshot–delta merge (upsert/delete) — the corpus-refresh shape a
  * standing training corpus actually runs: a small change batch (new
  * documents, re-crawled revisions, takedown deletions) merges into the
  * standing table WITHOUT rewriting or reshuffling the standing side.
  * This is the MERGE INTO of the lakehouse engines (Delta/Iceberg/Hudi),
  * expressed over the same [[BucketedLayout]] snapshot machinery as
  * [[IncrementalDedup]] — the data sibling of d11's signature snapshot.
  *
  * Semantics — per key, last writer wins:
  *  - the winner is the row with the highest `version` among the
  *    snapshot row and all delta rows for that key; the delta wins a
  *    version tie with the snapshot (a re-send of the same revision must
  *    be idempotent); among delta rows the tie-break is the full struct
  *    order (op 'U' < 'D', so a same-version delete beats its upsert —
  *    deterministic, documented, and a shape real CDC feeds contain);
  *  - a winning op = 'D' removes the key; a delta key absent from the
  *    snapshot is an insert; a delete of an absent key is a no-op.
  *
  * Layout is the point (the 100 TB shape):
  *  - the snapshot is bucketed+sorted by `key` ([[writeSnapshot]]), so
  *    [[merge]]'s single full-outer join reads it bucket-for-bucket with
  *    NO Exchange on the snapshot side — only the delta (pre-aggregated
  *    to one winner row per key, tiny by nature) shuffles to the bucket
  *    count. `SnapshotMergeSpec` pins the Exchange-free snapshot scan.
  *  - the snapshot is scanned ONCE: untouched keys, updates, inserts and
  *    deletes all resolve inside the one join (a semi/anti pair would
  *    scan it twice).
  * Re-materializing the merge result via [[writeSnapshot]] completes the
  * refresh cycle; at scale that rewrite touches every bucket, so real
  * deployments amortize it by stacking several deltas per rewrite —
  * which this merge supports verbatim (merge the union of deltas).
  */
object SnapshotMerge {

  /** Materialize `rows` (schema: key, version, payload…) as the standing
    * bucketed snapshot table, replacing any previous revision. */
  def writeSnapshot(rows: DataFrame, table: String, key: String,
      nBuckets: Int = 32): Unit = {
    dropTableAndLocation(rows.sparkSession, table)
    BucketedLayout.writeBucketed(rows, table, key, nBuckets)
  }

  /** Drop `table` from the catalog AND delete its warehouse location:
    * in-memory catalogs forget tables between sessions but the warehouse
    * directory survives, so a bare DROP TABLE IF EXISTS leaves an orphan
    * location that fails the next managed-table CREATE/RENAME to that
    * name (same recovery as IncrementalDedup). */
  private[graft] def dropTableAndLocation(spark: SparkSession,
      table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** [[merge]] + stage write + swap under the [[TableCommit]] protocol —
    * the concurrent-writer-safe refresh. The heavy stage write happens
    * outside the lock against a per-attempt stage name (two racers never
    * touch each other's stage); only the catalog swap + epoch bump are
    * inside. A loser gets [[TableCommit.ConcurrentWriteException]] with
    * its stage cleaned up — it must re-read the refreshed snapshot and
    * retry, because its merge was based on a superseded state. Returns
    * the new epoch. */
  def mergeCommit(spark: SparkSession, table: String, delta: DataFrame,
      key: String, nBuckets: Int = 32, evolve: Boolean = false): Long = {
    val base = TableCommit.epochOf(spark, table)
    val stage = s"${table}_c${java.lang.Long.toHexString(System.nanoTime())}"
    val merged = merge(spark, table, delta, key, evolve = evolve)
    writeSnapshot(merged, stage, key, nBuckets)
    try {
      TableCommit.commit(spark, table, base) {
        spark.sql(s"DROP TABLE IF EXISTS `$table`")
        spark.sql(s"ALTER TABLE `$stage` RENAME TO `$table`")
        base + 1
      }
    } catch { case t: Throwable =>
      spark.sql(s"DROP TABLE IF EXISTS `$stage`")
      throw t
    }
  }

  /** Catalog name the snapshot live at commit-epoch `epoch` is retained
    * under after a [[mergeCommitRetain]] supersedes it. */
  def versionTable(table: String, epoch: Long): String =
    s"${table}__v$epoch"

  /** [[mergeCommit]] with TIME TRAVEL: instead of dropping the
    * superseded snapshot, retain it under [[versionTable]] so
    * [[readAt]] can reproduce the corpus as of any retained epoch —
    * the Delta/Iceberg `VERSION AS OF` affordance, without which a
    * training run cannot pin the exact corpus state it read after later
    * refreshes land. Same single-winner [[TableCommit]] protocol; the
    * retention is one extra O(1) catalog rename inside the lock (no
    * data moves — the bucketed files stay where they are), so the
    * protocol still adds no scaling cost. Storage grows with retained
    * history; [[vacuumVersions]] is the bounded-retention step. */
  def mergeCommitRetain(spark: SparkSession, table: String,
      delta: DataFrame, key: String, nBuckets: Int = 32,
      evolve: Boolean = false): Long = {
    val base = TableCommit.epochOf(spark, table)
    val stage = s"${table}_c${java.lang.Long.toHexString(System.nanoTime())}"
    val merged = merge(spark, table, delta, key, evolve = evolve)
    writeSnapshot(merged, stage, key, nBuckets)
    try {
      TableCommit.commit(spark, table, base) {
        val retained = versionTable(table, base)
        // a crashed prior attempt (or a previous JVM whose catalog is
        // gone but whose warehouse dir survives) may have left the
        // retained name — the epoch CAS already proved we own `base`
        dropTableAndLocation(spark, retained)
        spark.sql(s"ALTER TABLE `$table` RENAME TO `$retained`")
        spark.sql(s"ALTER TABLE `$stage` RENAME TO `$table`")
        base + 1
      }
    } catch { case t: Throwable =>
      spark.sql(s"DROP TABLE IF EXISTS `$stage`")
      throw t
    }
  }

  /** Warehouse location of a retained version table (the catalog
    * lowercases managed-table names — match it). */
  private def versionLocation(spark: SparkSession, table: String,
      epoch: Long): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      versionTable(table, epoch).toLowerCase)

  /** Retained epochs visible on DISK under the warehouse directory —
    * the source of truth a fresh JVM has: in-memory catalogs forget
    * tables between sessions while the retained `__vN` directories
    * survive, so catalog-only resolution would misreport history. */
  private def retainedEpochsOnDisk(spark: SparkSession,
      table: String): Seq[Long] = {
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val f = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prefix = s"${table.toLowerCase}__v"
    (if (f.exists(wh)) f.listStatus(wh).toSeq else Nil)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .flatMap(s => scala.util.Try(
        s.getPath.getName.stripPrefix(prefix).toLong).toOption)
      .sorted
  }

  /** The snapshot as of commit `epoch`: the live table when `epoch` is
    * current, else the [[mergeCommitRetain]]-retained version — resolved
    * through the session catalog when registered, else from its
    * surviving warehouse directory (a FRESH JVM's in-memory catalog has
    * forgotten the retained tables; their files have not moved). Fails
    * with a clear message when the version was vacuumed or never
    * existed, rather than resolving to something else silently. */
  def readAt(spark: SparkSession, table: String, epoch: Long): DataFrame = {
    val current = TableCommit.epochOf(spark, table)
    if (epoch == current) spark.table(table)
    else if (spark.catalog.tableExists(versionTable(table, epoch)))
      spark.table(versionTable(table, epoch))
    else {
      val loc = versionLocation(spark, table, epoch)
      val f = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (f.exists(loc)) spark.read.parquet(loc.toString)
      else throw new IllegalArgumentException(
        s"no retained snapshot of '$table' at epoch $epoch (current " +
          s"$current): not in this session's catalog and no surviving " +
          s"warehouse directory at $loc — vacuumed, or written without " +
          "mergeCommitRetain")
    }
  }

  /** Drop retained versions older than the newest `keepLast` (0 drops
    * all history; the live table is never touched). Versions are
    * resolved from the DISK listing (union'd with the catalog), so a
    * fresh JVM vacuums the same history a long-lived session would.
    * Returns the epochs vacuumed. Readers of a vacuumed epoch fail
    * loudly in [[readAt]]. */
  def vacuumVersions(spark: SparkSession, table: String,
      keepLast: Int): Seq[Long] = {
    val current = TableCommit.epochOf(spark, table)
    // the catalog lowercases table names — match it
    val prefix = s"${table.toLowerCase}__v"
    val inCatalog = spark.catalog.listTables()
      .collect().map(_.name)
      .filter(_.startsWith(prefix))
      .flatMap(n => scala.util.Try(n.stripPrefix(prefix).toLong).toOption)
    val retained = (inCatalog ++ retainedEpochsOnDisk(spark, table))
      .distinct.sorted
    val cut = current - keepLast
    val drop = retained.filter(_ < cut)
    drop.foreach(e =>
      dropTableAndLocation(spark, versionTable(table, e)))
    drop.toSeq
  }

  /** Merge a CDC `delta` (schema: key, version, op 'U'|'D', payload… —
    * the snapshot's columns plus `op`) into snapshot `table`; returns the
    * merged standing corpus (key, version, payload…).
    *
    * With `evolve = true` the delta may carry payload columns the
    * snapshot lacks (and vice versa): the result schema is the UNION
    * (snapshot's columns first, then new delta columns in delta order),
    * and rows from the side missing a column null-fill it — Delta Lake's
    * `mergeSchema` semantics, which a long-lived corpus needs the first
    * time a crawler starts emitting a new field. A same-named column
    * with a DIFFERENT type fails loudly (no silent cast — a type change
    * is a migration, not an evolution). With `evolve = false` (default)
    * the delta must match the snapshot's payload exactly. */
  def merge(spark: SparkSession, table: String, delta: DataFrame,
      key: String, versionCol: String = "version",
      opCol: String = "op", evolve: Boolean = false): DataFrame = {
    val snap = spark.table(table)
    val snapPayload = snap.columns.filterNot(c => c == key || c == versionCol)
    val deltaPayload =
      delta.columns.filterNot(c => c == key || c == versionCol || c == opCol)
    if (!evolve) {
      // strict mode really is strict: a delta missing a snapshot payload
      // column must fail loudly, not null-fill it — a winning upsert
      // would silently erase that column for its key. Extra delta
      // columns are equally a schema change the caller didn't opt into.
      val missing = snapPayload.filterNot(delta.columns.contains)
      val extra = deltaPayload.filterNot(snapPayload.contains)
      if (missing.nonEmpty || extra.nonEmpty)
        throw new IllegalArgumentException(
          s"delta payload does not match snapshot '$table' exactly" +
            (if (missing.nonEmpty)
              s"; missing from delta: ${missing.mkString(", ")}" else "") +
            (if (extra.nonEmpty)
              s"; not in snapshot: ${extra.mkString(", ")}" else "") +
            " — pass evolve = true to union schemas")
    }
    val payload =
      if (!evolve) snapPayload
      else snapPayload ++ deltaPayload.filterNot(snapPayload.contains)
    val snapT = snap.schema.map(f => f.name -> f.dataType).toMap
    val deltaT = delta.schema.map(f => f.name -> f.dataType).toMap
    if (evolve) payload.foreach { c =>
      (snapT.get(c), deltaT.get(c)) match {
        case (Some(a), Some(b)) if a != b =>
          throw new IllegalArgumentException(
            s"schema evolution cannot change a column's type: '$c' is " +
              s"${a.simpleString} in snapshot '$table' but " +
              s"${b.simpleString} in the delta — migrate explicitly")
        case _ => ()
      }
    }
    // per-side payload columns in the SAME unioned order, null-filling
    // whatever that side lacks (typed from the side that has it) so the
    // two struct layouts stay identical
    def sideCols(has: String => Boolean, otherT: Map[String,
        org.apache.spark.sql.types.DataType]) =
      payload.map(c =>
        if (has(c)) col(c) else lit(null).cast(otherT(c)).as(c))
    val dPayloadCols = sideCols(delta.columns.contains, snapT)
    val sPayloadCols = sideCols(snap.columns.contains, deltaT)
    // identical struct layout on both sides so the winner comparison and
    // the final unpack are uniform: (version, opRank, op, payload…).
    // opRank is the explicit delete-beats-upsert tie rank — the op CHARS
    // order the wrong way ('U' > 'D'), so ranking on the raw op string
    // would let a same-version upsert shadow its delete
    val opRank = when(col(opCol) === "D", lit(1)).otherwise(lit(0))
    val dStruct = struct(
      (col(versionCol) +: opRank.as("op_rank") +: col(opCol) +:
        dPayloadCols): _*)
    val sStruct = struct(
      (col(versionCol) +: lit(0).as("op_rank") +: lit("U").as(opCol) +:
        sPayloadCols): _*)
    // one winner row per delta key BEFORE the join — the only shuffle of
    // delta-sized data; struct max = (version, op, payload…) lexicographic
    val dAgg = delta.groupBy(col(key)).agg(max(dStruct).as("dw"))
    val winner =
      when(col("dw").isNull, col("sw"))
        .when(col("sw").isNull, col("dw"))
        .when(col("dw").getField(versionCol) >=
          col("sw").getField(versionCol), col("dw"))
        .otherwise(col("sw"))
    snap.select(col(key), sStruct.as("sw"))
      .join(dAgg, Seq(key), "full_outer")
      .select(col(key), winner.as("w"))
      .where(col("w").getField(opCol) === "U")
      .select(col(key) +:
        col("w").getField(versionCol).as(versionCol) +:
        payload.map(c => col("w").getField(c).as(c)): _*)
  }
}
