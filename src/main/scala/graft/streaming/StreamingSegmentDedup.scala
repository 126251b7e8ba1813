package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.{SegmentDedup, TableCommit}

/** Streaming paragraph-granularity dedup — [[SegmentDedup]] (the d19
  * engine) run continuously: each micro-batch of documents is scored
  * against the standing segment-fingerprint snapshot (plus earlier docs
  * in the same batch), handed to `sink`, and then ADMITTED so later
  * batches dedup against it — the ingest-side unit dedup a crawler
  * pipeline runs, as a stream.
  *
  * Shape: `foreachBatch`, same rationale as [[StreamingMerge]]: the
  * probe joins a TABLE and admission rewrites it, neither expressible
  * as a watermarked streaming aggregate — while inside a micro-batch
  * the documents are just a delta frame, so the batch operator applies
  * verbatim and streaming == batch whatever the batching
  * (`StreamingSegmentDedupSpec` pins it).
  *
  * Replay safety: the last admitted batchId is recorded in a commit-dir
  * marker AFTER the admission, and a batch ≤ the marker is skipped —
  * [[SegmentDedup.appendCommit]] is additionally idempotent (anti-join
  * against the snapshot), so even the commit-to-marker crash window
  * cannot duplicate fingerprints; only the sink may observe a replayed
  * budget report (at-least-once reporting, exactly-once admission). */
object StreamingSegmentDedup {

  /** One micro-batch: score, report to `sink`, admit. */
  def applyBatch(spark: SparkSession, table: String, batch: DataFrame,
      batchId: Long, nBuckets: Int = 32)(
      sink: DataFrame => Unit): Unit = {
    val applied = TableCommit.readMarker(spark, table, "stream")
      .map(_.toLong)
    if (applied.exists(_ >= batchId)) return
    if (!spark.catalog.tableExists(table))
      SegmentDedup.writeSnapshot(batch.limit(0), table, nBuckets)
    if (!batch.isEmpty) {
      sink(SegmentDedup.dedupDelta(spark, batch, table))
      SegmentDedup.appendCommit(batch, table, nBuckets)
    }
    TableCommit.writeMarker(spark, table, "stream", batchId.toString)
  }

  /** Wire a (doc_id, text) document stream onto snapshot `table`.
    * Caller starts the returned writer (checkpointLocation, trigger). */
  def apply(spark: SparkSession, table: String, docsStream: DataFrame,
      nBuckets: Int = 32)(sink: DataFrame => Unit): DataStreamWriter[Row] =
    docsStream.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, table, batch, batchId, nBuckets)(sink)
    }
}
