package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Deterministic watermark/late-data replay tests (SURVEY §5.3). */
class EventWindowsSpec extends SparkSpec {

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2022-08-31 10:$min%02d:00")

  test("append-mode window emits on watermark passage; late rows dropped") {
    import spark.implicits._
    val mem = MemoryStream[Ev](spark, 1)
    val q = EventWindows.windowedCounts(mem.toDF(),
      windowLength = "10 minutes", watermark = "5 minutes")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()

    // batch 1: two rows in window [10:00, 10:10)
    mem.addData(Ev(1, ts(1), 100, "click", 1.0), Ev(2, ts(3), 101, "click", 2.0))
    q.processAllAvailable()
    // nothing emitted yet: watermark (max 10:03 - 5 min) hasn't passed 10:10
    assert(spark.table("win_out").count() == 0)

    // batch 2: event at 10:20 pushes watermark to 10:15 → window closes
    mem.addData(Ev(3, ts(20), 102, "view", 1.0))
    q.processAllAvailable()
    val closed = spark.table("win_out").collect()
    assert(closed.length == 1)
    assert(closed.head.getAs[Long]("cnt") == 2L &&
      closed.head.getAs[Double]("sv") == 3.0)

    // batch 3: a LATE click at 10:02 — behind the 10:15 watermark → dropped,
    // the closed window is never revised
    mem.addData(Ev(4, ts(2), 103, "click", 50.0))
    q.processAllAvailable()
    assert(spark.table("win_out").collect()
      .count(_.getAs[String]("event_type") == "click") == 1)
    q.stop()
  }

  test("streaming sessions close on watermark passage (q21's stream form)") {
    import spark.implicits._
    val mem = MemoryStream[Ev](spark, 1)
    val q = EventWindows.sessions(mem.toDF(),
      gap = "10 minutes", watermark = "5 minutes")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    // user 100: events at 10:01 and 10:03 — one session [10:01, 10:13)
    mem.addData(Ev(1, ts(1), 100, "click", 1.0),
      Ev(2, ts(3), 100, "click", 1.0))
    q.processAllAvailable()
    assert(spark.table("sess_out").count() == 0) // still open
    // event far ahead closes it: watermark 10:55 > 10:03 + 10 min gap
    mem.addData(Ev(3, ts(59), 101, "view", 1.0))
    q.processAllAvailable()
    val rows = spark.table("sess_out").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("user_id") == 100L)
    assert(rows.head.getAs[Long]("n_events") == 2L)
    assert(rows.head.getAs[Timestamp]("s_start") == ts(1))
    q.stop()
  }

  test("transient detector flags z-score outliers against running state") {
    import spark.implicits._
    import TransientDetector.Obs
    val mem = MemoryStream[Obs](spark, 1)
    val q = TransientDetector.detect(mem.toDS(),
      zThreshold = 5.0, minBaseline = 5)
      .writeStream.format("memory").queryName("transients")
      .outputMode("append").start()
    // batch 1: a quiet baseline for pixel A (slight jitter → nonzero sd)
    mem.addData((1 to 6).map(i =>
      Obs("srcA:(32,32)", ts(i), 1.0 + 0.01 * (i % 2))): _*)
    q.processAllAvailable()
    assert(spark.table("transients").count() == 0)
    // batch 2: the baseline CARRIES ACROSS batches (flatMapGroupsWithState
    // state, not per-batch agg) — a 100× spike on A is flagged, pixel B has
    // no baseline yet so its identical value is not
    mem.addData(Obs("srcA:(32,32)", ts(10), 100.0),
      Obs("srcB:(05,05)", ts(10), 100.0))
    q.processAllAvailable()
    val hits = spark.table("transients").collect()
    assert(hits.length == 1)
    assert(hits.head.getAs[String]("key") == "srcA:(32,32)")
    assert(hits.head.getAs[Double]("z") > 5.0)
    assert(hits.head.getAs[Long]("n_baseline") == 6L)
    // batch 3: the spike folded into the baseline (higher mean/sd) — a
    // normal value afterwards is still not flagged
    mem.addData(Obs("srcA:(32,32)", ts(11), 1.0))
    q.processAllAvailable()
    assert(spark.table("transients").count() == 1)
    q.stop()
  }

  test("windowed KMV distinct merges across micro-batches and matches " +
      "the batch aggregate") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val mem = MemoryStream[Ev](spark, 1)
    val q = EventWindows.windowedDistinctUsers(mem.toDF(),
      windowLength = "10 minutes", watermark = "5 minutes", k = 8)
      .writeStream.format("memory").queryName("kmv_win")
      .outputMode("append").start()
    // 30 users for one window, spread over TWO micro-batches so the
    // sketch must merge partial buffers across batches
    val b1 = (1 to 15).map(u => Ev(u, ts(1), 100 + u, "click", 1.0))
    val b2 = (16 to 30).map(u => Ev(u, ts(4), 100 + u, "click", 1.0))
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    mem.addData(Ev(99, ts(20), 999, "view", 1.0)) // close the window
    q.processAllAvailable()
    val got = spark.table("kmv_win")
      .where(col("event_type") === "click").collect()
    assert(got.length == 1)
    val streamed = got.head.getAs[Double]("approx_users")
    val batch = (b1 ++ b2).toDF()
      .agg(graft.functions.KmvSketch.column(
        graft.functions.TextFunctions.fingerprint(
          col("user_id").cast("string")), 8))
      .as[Double].head()
    assert(streamed === batch)
    q.stop()
  }

  test("streaming dedup keeps first occurrence per (type, user)") {
    import spark.implicits._
    val mem = MemoryStream[Ev](spark, 1)
    val q = EventWindows.dedupUsers(mem.toDF(), watermark = "5 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    mem.addData(
      Ev(1, ts(1), 100, "click", 1.0),
      Ev(2, ts(2), 100, "click", 1.0), // duplicate user within watermark
      Ev(3, ts(2), 100, "view", 1.0),  // same user, different type → kept
      Ev(4, ts(3), 101, "click", 1.0))
    q.processAllAvailable()
    val rows = spark.table("dedup_out").collect()
    assert(rows.length == 3)
    q.stop()
  }
}
