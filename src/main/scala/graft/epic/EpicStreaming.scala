package graft.epic

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming wrapper around the batch pipeline (SURVEY §3.1's
  * Spark shape): readStream → foreachBatch { refresh watchlist; run
  * pixelsAndMeta; append both sinks }.
  *
  * Semantics mapped from the reference:
  *  - M3 watchlist freshness: the 5 s APScheduler re-read becomes a
  *    re-resolve per micro-batch — a watch added mid-stream joins from the
  *    next batch on;
  *  - M2 expiry: expireDue() runs at the head of every batch, so an expired
  *    watch stops producing rows in the same batch it flips to 'watched';
  *  - S6 buffered bulk insert: the 5 s timed window is the micro-batch
  *    trigger itself; each batch writes once per sink (parquet here; swap
  *    the two appends for JDBC writers with batchsize/retry in production —
  *    service_hub.py:49-64 semantics live in the sink, not the plan);
  *  - S5 dual append: pixels + metadata written from one cached batch so
  *    the image scan and the join run once, not twice.
  */
object EpicStreaming {

  /** Start the ingest query. `images` must be a *streaming* DataFrame with
    * EpicPipeline.imageSchema columns. `sink` defaults to the dual-parquet
    * append under `outDir`; pass [[jdbcBatchSink]] for the PG swap (S5). */
  def start(images: DataFrame, store: WatchStoreApi, outDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
      elevationLimitDeg: Double = 30.0,
      transientHook: DataFrame => DataFrame = identity,
      sink: Option[(DataFrame, DataFrame) => Unit] = None,
      epochSink: Option[(DataFrame, DataFrame, Long) => Unit] = None)
      : StreamingQuery = {
    images.writeStream
      .queryName("epic-ingest")
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // an epoch-aware sink (exactly-once JDBC) binds the engine's
        // batchId; the plain sink stays batch-id-blind (at-least-once)
        val bound = epochSink
          .map(es => (px: DataFrame, m: DataFrame) => es(px, m, batchId))
          .orElse(sink)
        processBatch(batch, store, outDir, elevationLimitDeg,
          transientHook = transientHook, sink = bound)
      }
      .start()
  }

  /** S5 JDBC swap: both frames through the PG-literal formatters, then
    * batched inserts with reconnect-retry (JdbcSink). The reference's
    * table names (create_pixel_tables.sql) are the defaults. */
  def jdbcBatchSink(jdbc: JdbcSink,
      pixelsTable: String = "epic_pixels",
      metaTable: String = "epic_img_metadata")
      : (DataFrame, DataFrame) => Unit = (pixels, meta) => {
    jdbc.append(EpicPipeline.toPgStrings(pixels), pixelsTable)
    jdbc.append(EpicPipeline.metaToPgStrings(meta), metaTable)
  }

  /** Exactly-once S5: pass as `epochSink` — each micro-batch's rows land
    * idempotently under its engine batchId, so foreachBatch replays after
    * a crash cannot duplicate (JdbcEpochSink's epoch-scrub pattern). */
  def jdbcExactlyOnceSink(jdbc: JdbcEpochSink,
      pixelsTable: String = "epic_pixels",
      metaTable: String = "epic_img_metadata")
      : (DataFrame, DataFrame, Long) => Unit = (pixels, meta, epoch) => {
    jdbc.appendOnce(EpicPipeline.toPgStrings(pixels), pixelsTable,
      s"epic:$pixelsTable", epoch)
    jdbc.appendOnce(EpicPipeline.metaToPgStrings(meta), metaTable,
      s"epic:$metaTable", epoch)
  }

  /** One micro-batch: expiry tick, watchlist snapshot, pipeline, dual
    * append. Exposed for deterministic replay tests (Trigger.AvailableNow
    * equivalence, SURVEY §5.3). */
  def processBatch(batch: DataFrame, store: WatchStoreApi, outDir: String,
      elevationLimitDeg: Double = 30.0,
      now: () => Timestamp = () => new Timestamp(System.currentTimeMillis()),
      transientHook: DataFrame => DataFrame = identity,
      sink: Option[(DataFrame, DataFrame) => Unit] = None): Unit = {
    val t = now()
    store.expireDue(t)                       // M2
    val watch = store.watchlist(t)           // M3: fresh every batch
    // No persist: columnar-caching multi-MB image arrays costs more than
    // the second source pass, and the metadata frame's lineage stops
    // before the explode/gather so its re-scan does almost no work.
    val (pixels, meta) =
      EpicPipeline.pixelsAndMeta(batch, watch, elevationLimitDeg)
    // A5: detect_transient extension point (service_hub.py:73-75 — an
    // identity map stage between ingest and store, reserved for matched
    // filters / z-score detectors over the pixel stream).
    val px = transientHook(pixels)
    sink match {
      case Some(s) => s(px, meta)
      case None =>
        px.write.mode("append").parquet(s"$outDir/epic_pixels")
        meta.write.mode("append").parquet(s"$outDir/epic_img_metadata")
    }
  }
}
