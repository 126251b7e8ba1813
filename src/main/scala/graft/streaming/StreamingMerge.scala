package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.SnapshotMerge

/** Streaming counterpart of the batch CDC merge
  * ([[graft.operators.SnapshotMerge]]): a change stream (upserts +
  * deletes) maintains the standing bucketed snapshot table continuously —
  * the "CDC apply" loop of a lakehouse, fed from whatever the change
  * source is (a crawler's revisit queue, a takedown feed).
  *
  * Shape: `foreachBatch`. The merge rewrites a TABLE (not an append
  * stream), and last-writer-wins across arbitrarily late re-sends is not
  * expressible as a watermarked streaming aggregate — while inside a
  * micro-batch the events are just a delta frame, so the batch operator
  * applies verbatim. Batch and streaming answers therefore agree BY
  * CONSTRUCTION whatever the event batching, which
  * `StreamingMergeSpec` pins (same events, 1 batch vs N batches vs batch
  * operator — identical snapshots).
  *
  * The refresh is a stage-and-swap: each micro-batch merges into a
  * staging table, then swaps it in (drop + rename inside the catalog) —
  * `saveAsTable(Overwrite)` on the table being read would fail, and a
  * partial STAGE write must never replace a good snapshot. The
  * drop+rename pair is NOT atomic: a crash between the two statements
  * leaves only the fully-written stage table, so [[applyBatch]] opens by
  * self-healing that state (stage present + snapshot absent → the stage
  * IS the snapshot: rename it in and continue). Data is never lost; the
  * assumption is the streaming query's own single-writer refresh loop
  * (a concurrent reader can observe the table absent for the instant
  * between drop and rename — readers needing isolation snapshot the
  * table name per epoch). At 100 TB the rewrite touches every bucket,
  * so a production deployment widens the trigger interval (stacking
  * more events per rewrite — the batch operator supports a unioned
  * delta verbatim); the swap itself stays O(1) catalog metadata.
  */
object StreamingMerge {

  /** Merge one micro-batch of CDC events (key, version, op, payload…)
    * into `table`, swapping the refreshed snapshot in via the staged
    * rename above (self-healing if a previous swap crashed mid-pair). */
  def applyBatch(spark: SparkSession, table: String, events: DataFrame,
      key: String, nBuckets: Int = 32): Unit = {
    val stage = s"${table}_stage"
    // crash recovery: a prior run died between DROP and RENAME — the
    // stage table is the complete refreshed snapshot; finish its swap
    if (!spark.catalog.tableExists(table) &&
        spark.catalog.tableExists(stage))
      spark.sql(s"ALTER TABLE `$stage` RENAME TO `$table`")
    // bootstrap: no snapshot and no stage — the stream starts against a
    // table that was never seeded. Seed an empty snapshot (events schema
    // minus the op column) so the normal merge path, and its crash
    // recovery above, apply uniformly from the first micro-batch
    if (!spark.catalog.tableExists(table))
      SnapshotMerge.writeSnapshot(
        events.drop("op").limit(0), table, key, nBuckets)
    if (!events.isEmpty) {
      val merged = SnapshotMerge.merge(spark, table, events, key)
      SnapshotMerge.writeSnapshot(merged, stage, key, nBuckets)
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
      spark.sql(s"ALTER TABLE `$stage` RENAME TO `$table`")
    }
  }

  /** Wire a CDC event stream onto snapshot `table`: every micro-batch
    * applies through [[applyBatch]]. Caller starts the returned writer
    * (checkpointLocation, trigger). */
  def apply(spark: SparkSession, table: String, events: DataFrame,
      key: String, nBuckets: Int = 32): DataStreamWriter[Row] =
    events.writeStream.outputMode("update").foreachBatch {
      (batch: DataFrame, _: Long) =>
        applyBatch(spark, table, batch, key, nBuckets)
    }

  /** [[applyBatch]] under the commit protocol WITH time travel: each
    * non-empty micro-batch lands as one
    * [[SnapshotMerge.mergeCommitRetain]] commit, so the table's epoch
    * history IS the stream's batch history — any micro-batch boundary
    * state is reproducible via [[SnapshotMerge.readAt]] (the
    * per-refresh corpus cut a training run pins), and
    * [[SnapshotMerge.vacuumVersions]] bounds the retention.
    *
    * Replay safety (streams retry failed batches): the last applied
    * `batchId` is recorded in a commit-dir marker AFTER the commit, and
    * a batch ≤ the marker is skipped — exactly-once table content. The
    * one crash window (between commit and marker write) re-applies the
    * same delta, which is data-idempotent (the merge re-derives the
    * identical snapshot — `SnapshotMergeSpec` pins it) but retains one
    * extra epoch with identical content: at-least-once EPOCHS,
    * exactly-once DATA — stated rather than hidden. */
  def applyBatchRetain(spark: SparkSession, table: String,
      events: DataFrame, key: String, batchId: Long,
      nBuckets: Int = 32): Unit = {
    val applied = graft.operators.TableCommit
      .readMarker(spark, table, "stream").map(_.toLong)
    if (applied.exists(_ >= batchId)) return
    if (!spark.catalog.tableExists(table))
      SnapshotMerge.writeSnapshot(
        events.drop("op").limit(0), table, key, nBuckets)
    if (!events.isEmpty)
      SnapshotMerge.mergeCommitRetain(spark, table, events, key, nBuckets)
    graft.operators.TableCommit.writeMarker(spark, table, "stream",
      batchId.toString)
  }

  /** Wire a CDC stream onto `table` with per-micro-batch time travel —
    * the [[applyBatchRetain]] form of [[apply]]. */
  def applyRetain(spark: SparkSession, table: String, events: DataFrame,
      key: String, nBuckets: Int = 32): DataStreamWriter[Row] =
    events.writeStream.outputMode("update").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        applyBatchRetain(spark, table, batch, key, batchId, nBuckets)
    }
}
