package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SnapshotMerge

case class CdcEvent(k: Long, version: Long, op: String, v: String)

class StreamingMergeSpec extends SparkSpec {

  private def snapshot(table: String): Set[(Long, Long, String)] =
    spark.table(table).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  private def writeBase(table: String): Unit = {
    import spark.implicits._
    SnapshotMerge.writeSnapshot(
      Seq((1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "c"))
        .toDF("k", "version", "v"),
      table, "k", nBuckets = 2)
  }

  private val events = Seq(
    CdcEvent(2L, 2L, "U", "b2"),   // update
    CdcEvent(3L, 2L, "D", "x"),    // delete
    CdcEvent(4L, 1L, "U", "d"),    // insert
    CdcEvent(4L, 2L, "U", "d2"),   // later revision of the insert
    CdcEvent(5L, 9L, "D", "x"))    // delete of an absent key: no-op

  private val expectedFinal = Set(
    (1L, 1L, "a"), (2L, 2L, "b2"), (4L, 2L, "d2"))

  test("a CDC stream maintains the snapshot; any batching gives the " +
      "batch-merge answer") {
    import spark.implicits._

    // reference: the batch operator applied to all events at once
    writeBase("smerge_batch")
    try {
      val once = SnapshotMerge.merge(spark, "smerge_batch",
          events.toDF(), "k")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .toSet
      assert(once === expectedFinal)
    } finally spark.sql("DROP TABLE IF EXISTS smerge_batch")

    // streamed in three micro-batches, cutting MID-KEY (k=4's two
    // revisions arrive in different batches — the later one must win
    // across the batch boundary too)
    writeBase("smerge_stream")
    val ckpt = java.nio.file.Files
      .createTempDirectory("smerge_ckpt").toString
    val mem = MemoryStream[CdcEvent](spark, 100)
    val q = StreamingMerge(spark, "smerge_stream", mem.toDF(), "k",
        nBuckets = 2)
      .option("checkpointLocation", ckpt).start()
    try {
      mem.addData(events.take(2))
      q.processAllAvailable()
      assert(snapshot("smerge_stream") ===
        Set((1L, 1L, "a"), (2L, 2L, "b2")))
      mem.addData(events.slice(2, 4))
      q.processAllAvailable()
      assert(snapshot("smerge_stream") ===
        Set((1L, 1L, "a"), (2L, 2L, "b2"), (4L, 2L, "d2")))
      mem.addData(events.drop(4))
      q.processAllAvailable()
      assert(snapshot("smerge_stream") === expectedFinal)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS smerge_stream")
      spark.sql("DROP TABLE IF EXISTS smerge_stream_stage")
    }
  }

  test("a stream against a never-seeded table bootstraps an empty " +
      "snapshot (first micro-batch = plain insert)") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS smerge_boot")
    spark.sql("DROP TABLE IF EXISTS smerge_boot_stage")
    try {
      StreamingMerge.applyBatch(spark, "smerge_boot", events.toDF(), "k",
        nBuckets = 2)
      // no base rows: only the events' surviving upserts (k=3 deleted,
      // k=5's delete of an absent key a no-op)
      assert(snapshot("smerge_boot") ===
        Set((2L, 2L, "b2"), (4L, 2L, "d2")))
    } finally {
      spark.sql("DROP TABLE IF EXISTS smerge_boot")
      spark.sql("DROP TABLE IF EXISTS smerge_boot_stage")
    }
  }

  test("applyRetain: every micro-batch is a retained epoch — any batch " +
      "boundary state reads back via readAt, and a replayed batchId is " +
      "skipped (exactly-once content)") {
    import graft.operators.TableCommit
    import spark.implicits._
    val T = "smerge_tt"
    def cleanup(): Unit = {
      spark.catalog.listTables().collect().map(_.name)
        .filter(n => n == T || n.startsWith(s"${T}__v") ||
          n.startsWith(s"${T}_c"))
        .foreach(n => spark.sql(s"DROP TABLE IF EXISTS `$n`"))
      TableCommit.reset(spark, T)
    }
    cleanup()
    val ckpt = java.nio.file.Files
      .createTempDirectory("smerge_tt_ckpt").toString
    val mem = MemoryStream[CdcEvent](spark, 101)
    val q = StreamingMerge.applyRetain(spark, T, mem.toDF(), "k",
        nBuckets = 2)
      .option("checkpointLocation", ckpt).start()
    try {
      mem.addData(events.take(2))
      q.processAllAvailable()
      mem.addData(events.slice(2, 4))
      q.processAllAvailable()
      mem.addData(events.drop(4))
      q.processAllAvailable()
      // three non-empty batches → three commits; epoch history = the
      // stream's batch history
      assert(TableCommit.epochOf(spark, T) === 3L)
      def at(e: Long) = SnapshotMerge.readAt(spark, T, e).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(at(0L) === Set.empty)                      // bootstrap seed
      assert(at(1L) === Set((2L, 2L, "b2")))            // k=3 delete: no-op on empty
      assert(at(2L) === Set((2L, 2L, "b2"), (4L, 2L, "d2")))
      assert(at(3L) === Set((2L, 2L, "b2"), (4L, 2L, "d2")))
      assert(at(3L) === snapshot(T))
      // a replayed batch (stream retry re-delivers batchId 2) is skipped:
      // no new epoch, content unchanged
      StreamingMerge.applyBatchRetain(spark, T,
        events.slice(2, 4).toDF(), "k", batchId = 2L, nBuckets = 2)
      assert(TableCommit.epochOf(spark, T) === 3L)
      assert(snapshot(T) === at(3L))
      // vacuum bounds the stream's history like any retained table
      assert(SnapshotMerge.vacuumVersions(spark, T, keepLast = 1) ===
        Seq(0L, 1L))
    } finally {
      q.stop()
      cleanup()
    }
  }

  test("an empty micro-batch leaves the snapshot untouched") {
    writeBase("smerge_empty")
    try {
      val before = snapshot("smerge_empty")
      StreamingMerge.applyBatch(spark, "smerge_empty",
        spark.emptyDataFrame
          .select(lit(0L).as("k"), lit(0L).as("version"),
            lit("U").as("op"), lit("").as("v"))
          .where(lit(false)),
        "k", nBuckets = 2)
      assert(snapshot("smerge_empty") === before)
    } finally spark.sql("DROP TABLE IF EXISTS smerge_empty")
  }
}
