package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming per-source quota — the online form of r04's per-source cap
  * (C4/RefinedWeb anti-domination at INGEST time): each (source,
  * tumbling event-time window) admits at most `cap` documents; the rest
  * are dropped before they reach the expensive downstream stages
  * (dedup, scoring, export). A crawler that suddenly floods one domain
  * cannot displace the rest of that trigger's work.
  *
  * Scale shape: keyed state is ONE integer counter per (source, window)
  * — not the documents — and is evicted by event-time timeout once the
  * watermark passes the window end, so state is bounded by
  * (active sources × windows inside the watermark horizon) regardless
  * of stream length or rate. The stream shuffles once, on the state
  * key.
  *
  * Determinism: inside a micro-batch, a group's rows are admitted in
  * (ts, doc_id) order, so replaying the same triggers admits the same
  * documents. Across triggers admission is first-come — the only order
  * an infinite stream has (the batch r04's hash-rank selection needs
  * the whole window resident; the streaming form trades that for
  * bounded memory, the standard batch-vs-online split).
  */
object StreamingQuota {

  // carries the watermarked `ts` column itself (not a projection of it):
  // the unsupported-operation checker requires the event-time attribute
  // to reach the stateful operator's input
  case class DocIn(source: String, window_start: Long, doc_id: Long,
      ts: java.sql.Timestamp)
  case class Admitted(source: String, window_start: Long, doc_id: Long,
      ts_ms: Long)

  /** Admit up to `cap` docs per (source, tumbling `windowMs` window).
    * `docs` needs (source string, doc_id long, ts timestamp); watermark
    * is set here from `watermarkDelay`. */
  def admit(docs: DataFrame, cap: Int, windowMs: Long = 3600000L,
      watermarkDelay: String = "2 hours"): Dataset[Admitted] = {
    require(cap >= 1, s"quota cap must be >= 1 (got $cap)")
    require(windowMs >= 1L, s"window must be positive (got $windowMs)")
    val s = docs.sparkSession
    import s.implicits._
    docs
      .withWatermark("ts", watermarkDelay)
      .select(col("source"),
        ((unix_millis(col("ts")) cast "long") - pmod(unix_millis(col("ts")),
          lit(windowMs))).as("window_start"),
        col("doc_id"), col("ts"))
      .as[DocIn]
      .groupByKey(d => (d.source, d.window_start))
      .flatMapGroupsWithState[Int, Admitted](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((_, _), _, state) if state.hasTimedOut =>
          state.remove(); Iterator.empty
        case ((src, ws), rows, state) =>
          val admitted = state.getOption.getOrElse(0)
          val out = rows.toSeq.sortBy(d => (d.ts.getTime, d.doc_id))
            .take(math.max(0, cap - admitted))
          state.update(admitted + out.size)
          // evict once the watermark passes the window end; a timeout at
          // or below the current watermark is rejected by Spark, so late
          // stragglers in an already-closed window park one ms above it
          val end = ws + windowMs
          state.setTimeoutTimestamp(
            math.max(end, state.getCurrentWatermarkMs() + 1L))
          out.iterator.map(d => Admitted(src, ws, d.doc_id, d.ts.getTime))
      }
  }
}
