package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

case class QDoc(source: String, doc_id: Long, ts: Timestamp)

class StreamingQuotaSpec extends SparkSpec {

  private def t(min: Int) = new Timestamp(min * 60000L)

  test("caps each (source, window) and carries the count across batches") {
    import spark.implicits._
    val mem = MemoryStream[QDoc](spark, 1)
    val q = StreamingQuota.admit(mem.toDF(), cap = 2, windowMs = 3600000L)
      .writeStream.format("memory").queryName("quota_out")
      .outputMode("append").start()
    try {
      // batch 1: srcA floods window 0 with 3 docs, srcB sends 1
      mem.addData(QDoc("a", 11, t(5)), QDoc("a", 12, t(1)),
        QDoc("a", 13, t(3)), QDoc("b", 21, t(2)))
      q.processAllAvailable()
      val b1 = spark.table("quota_out").as[StreamingQuota.Admitted]
        .collect().sortBy(_.doc_id)
      // lowest (ts, doc_id) admitted first: 12 (t1), 13 (t3); 11 dropped
      assert(b1.filter(_.source == "a").map(_.doc_id).toSeq === Seq(12L, 13L))
      assert(b1.filter(_.source == "b").map(_.doc_id).toSeq === Seq(21L))
      // batch 2: srcA's window-0 quota is spent — nothing more admitted;
      // a NEW window admits fresh
      mem.addData(QDoc("a", 14, t(7)), QDoc("a", 31, t(65)))
      q.processAllAvailable()
      val b2 = spark.table("quota_out").as[StreamingQuota.Admitted]
        .collect().sortBy(_.doc_id)
      assert(!b2.map(_.doc_id).contains(14L))
      assert(b2.map(_.doc_id).contains(31L))
      // per-group admission never exceeds the cap
      val perGroup = b2.groupBy(a => (a.source, a.window_start))
        .map { case (_, xs) => xs.length }
      assert(perGroup.forall(_ <= 2))
    } finally q.stop()
  }

  test("admission inside a batch is deterministic by (ts, doc_id)") {
    import spark.implicits._
    val mem = MemoryStream[QDoc](spark, 1)
    val q = StreamingQuota.admit(mem.toDF(), cap = 1, windowMs = 3600000L)
      .writeStream.format("memory").queryName("quota_det")
      .outputMode("append").start()
    try {
      // same ts → doc_id breaks the tie; arrival order in addData must
      // not matter
      mem.addData(QDoc("x", 102, t(10)), QDoc("x", 101, t(10)))
      q.processAllAvailable()
      val got = spark.table("quota_det").as[StreamingQuota.Admitted]
        .collect().map(_.doc_id).toSeq
      assert(got === Seq(101L))
    } finally q.stop()
  }

  test("rejects a non-positive cap loudly") {
    import spark.implicits._
    val mem = MemoryStream[QDoc](spark, 1)
    intercept[IllegalArgumentException] {
      StreamingQuota.admit(mem.toDF(), cap = 0)
    }
  }
}
