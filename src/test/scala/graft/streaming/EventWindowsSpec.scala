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
