package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{SegmentDedup, TableCommit}

case class StreamDoc(doc_id: Long, text: String)

class StreamingSegmentDedupSpec extends SparkSpec {
  import spark.implicits._

  private val T = "ssegdedup_spec"

  private def words16(tag: String): String =
    (1 to 16).map(i => s"$tag$i").mkString(" ")

  private def cleanup(): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$T`")
    TableCommit.reset(spark, T)
  }

  test("a document stream dedups each batch against everything admitted " +
      "before it; replayed batches are skipped; streaming == batch") {
    cleanup()
    val reports = scala.collection.mutable.Map[Long, (Long, Long)]()
    val ckpt = java.nio.file.Files
      .createTempDirectory("ssegdedup_ckpt").toString
    val mem = MemoryStream[StreamDoc](spark, 102)
    val q = StreamingSegmentDedup(spark, T, mem.toDF()) { budget =>
      budget.collect().foreach(r =>
        reports(r.getLong(0)) = (r.getLong(2), r.getLong(3)))
    }.option("checkpointLocation", ckpt).start()
    try {
      // batch 0 bootstraps: everything fresh, then admitted
      mem.addData(Seq(StreamDoc(1L, words16("a")),
        StreamDoc(2L, words16("b"))))
      q.processAllAvailable()
      assert(reports(1L) === ((0L, 0L)) && reports(2L) === ((0L, 0L)))
      // batch 1: doc 10 repeats an ADMITTED segment (cross-batch dup);
      // doc 11 repeats doc 10's fresh half (within-batch dup)
      mem.addData(Seq(
        StreamDoc(10L, words16("a") + " " + words16("x")),
        StreamDoc(11L, words16("x"))))
      q.processAllAvailable()
      assert(reports(10L) === ((1L, 0L)),
        s"doc 10 must dup the admitted 'a' segment: ${reports(10L)}")
      assert(reports(11L) === ((0L, 1L)),
        s"doc 11 must dup doc 10's in-batch 'x' segment: ${reports(11L)}")
      // replay of batch 1 (stream retry): skipped — no snapshot growth
      spark.catalog.refreshTable(T) // writes came from the stream's clone
      val n = spark.table(T).count()
      StreamingSegmentDedup.applyBatch(spark, T,
        Seq(StreamDoc(10L, words16("a"))).toDF(), batchId = 1L)(_ => ())
      assert(spark.table(T).count() === n)
      // streaming == batch: the same documents through the batch
      // operator against a fresh snapshot give the same verdicts
      cleanupBatchTable()
      SegmentDedup.writeSnapshot(
        Seq(StreamDoc(1L, words16("a")), StreamDoc(2L, words16("b")))
          .toDF(), "ssegdedup_batch", nBuckets = 4)
      val batchVerdicts = SegmentDedup.dedupDelta(spark,
          Seq(StreamDoc(10L, words16("a") + " " + words16("x")),
            StreamDoc(11L, words16("x"))).toDF(), "ssegdedup_batch")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(2), r.getLong(3)))).toMap
      assert(batchVerdicts(10L) === reports(10L))
      assert(batchVerdicts(11L) === reports(11L))
    } finally {
      q.stop()
      cleanup()
      cleanupBatchTable()
    }
  }

  private def cleanupBatchTable(): Unit =
    spark.sql("DROP TABLE IF EXISTS ssegdedup_batch")
}
