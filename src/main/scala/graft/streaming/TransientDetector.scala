package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming transient detection — the real implementation of
  * the reference's reserved `detect_transient` stage (service_hub.py:73-75
  * keeps an identity hook where "detection of transients" is declared to
  * go). No built-in operator expresses "running per-source baseline carried
  * ACROSS micro-batches", so this is `flatMapGroupsWithState`: state is one
  * Welford accumulator (n, mean, M2) per key, an observation whose z-score
  * against the accumulated baseline exceeds the threshold is emitted the
  * moment it arrives, and every observation then folds into the baseline.
  *
  * Scale shape: state is three doubles per key — O(watched pixels), not
  * O(stream length); idle keys expire via processing-time timeout so a
  * source removed from the watchlist frees its state. Keys shuffle once
  * (the groupByKey) and stay partition-local thereafter.
  */
object TransientDetector {

  /** One keyed scalar observation (adapt pixel frames by keying on
    * source_name+pixel_coord and reducing pixel_values to a statistic). */
  case class Obs(key: String, t: Timestamp, v: Double)

  /** Welford running-variance state. */
  case class BaselineState(n: Long, mean: Double, m2: Double)

  /** An observation flagged against the baseline it deviated from. */
  case class Transient(key: String, t: Timestamp, v: Double, z: Double,
      n_baseline: Long, baseline_mean: Double)

  /** Flag observations more than `zThreshold` sigma above the running
    * baseline, once at least `minBaseline` observations back the estimate.
    * State for a key expires (event-time timeout) once the watermark
    * passes `idleTimeoutMs` beyond the key's last activity — a source
    * dropped from the watchlist frees its executor state; event-time
    * timeout (not processing-time) keeps the engine idle between data. */
  def detect(obs: Dataset[Obs], zThreshold: Double = 5.0,
      minBaseline: Long = 5, watermark: String = "10 minutes",
      idleTimeoutMs: Long = 3600L * 1000L): Dataset[Transient] = {
    implicit val stateEnc = Encoders.product[BaselineState]
    implicit val outEnc = Encoders.product[Transient]
    implicit val keyEnc = Encoders.STRING

    def update(key: String, rows: Iterator[Obs],
        state: GroupState[BaselineState]): Iterator[Transient] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      var st = state.getOption.getOrElse(BaselineState(0L, 0.0, 0.0))
      val out = ArrayBuffer[Transient]()
      var lastEventMs = 0L
      // micro-batch rows are unordered; fold in event-time order so the
      // baseline an observation is judged against never includes later data
      rows.toSeq.sortBy(_.t.getTime).foreach { o =>
        if (st.n >= minBaseline) {
          val sd = math.sqrt(st.m2 / (st.n - 1))
          if (sd > 0) {
            val z = (o.v - st.mean) / sd
            if (z >= zThreshold)
              out += Transient(o.key, o.t, o.v, z, st.n, st.mean)
          }
        }
        val n1 = st.n + 1
        val d = o.v - st.mean
        val mean1 = st.mean + d / n1
        st = BaselineState(n1, mean1, st.m2 + d * (o.v - mean1))
        lastEventMs = math.max(lastEventMs, o.t.getTime)
      }
      state.update(st)
      // idle expiry anchored to the key's OWN last event time (not the
      // global watermark: in the first batch the watermark is still 0, and
      // a watermark-anchored timeout would "expire" the moment real event
      // times establish it). Clamped above the watermark as the API needs.
      state.setTimeoutTimestamp(
        math.max(lastEventMs, state.getCurrentWatermarkMs() + 1) +
          idleTimeoutMs)
      out.iterator
    }

    obs.withWatermark("t", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
