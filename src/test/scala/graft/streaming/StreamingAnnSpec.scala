package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions.dot
import graft.operators.IvfIndex

case class QueryVec(vec_id: Long, v: Array[Double])

class StreamingAnnSpec extends SparkSpec {

  /** Deterministic corpus: 120 vectors in 4-d, varied directions. */
  private def corpus = (1 to 120).map { i =>
    QueryVec(i.toLong, Array(1.0 + i % 7, 2.0 + i % 5, 1.0 + i % 3, i % 11))
  }

  private def buildIndexAndCentroids() = {
    import spark.implicits._
    val e = corpus.toDF().select(col("vec_id"), col("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val cents = e.where(col("vec_id") <= 8)
      .select(col("vec_id").as("cid"), col("v").as("cv"),
        col("nrm").as("cn"))
    val assigned = e.join(broadcast(cents))
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"),
        round(dot(col("v"), col("cv")) / (col("nrm") * col("cn")), 6)
          .as("csim"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
          .orderBy(col("csim").desc, col("cid"))))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"))
    IvfIndex.write(assigned, "streaming_ann_index")
    cents
  }

  test("streaming probes equal the batch answer, whatever the batching") {
    import spark.implicits._
    val cents = buildIndexAndCentroids()
    val queries = Seq(3L, 31L, 59L, 87L, 115L)
      .map(i => corpus(i.toInt - 1))

    val batchAnswer = StreamingAnn.probeBatch(
        queries.toDF(), cents, "streaming_ann_index")
      .orderBy("q", "rk").collect().toSeq

    val got = mutable.ArrayBuffer[Row]()
    val mem = MemoryStream[QueryVec](spark, 1)
    val q = StreamingAnn.serve(mem.toDF(), cents, "streaming_ann_index") {
      res => got.synchronized { got ++= res.collect() }
    }
    try {
      // deliver the same queries split across two micro-batches
      mem.addData(queries.take(2))
      q.processAllAvailable()
      mem.addData(queries.drop(2))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = got.sortBy(r => (r.getLong(0), r.getInt(3)))
    assert(streamed.map(_.toSeq) == batchAnswer.map(_.toSeq))
    assert(batchAnswer.nonEmpty &&
      batchAnswer.map(_.getLong(0)).distinct.size == 5)
  }
}
