package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions.{dot, toDouble}
import graft.operators.HnswGraph

class StreamingGraphAnnSpec extends SparkSpec {

  test("streaming beam search equals the batch answer, whatever the " +
      "batching; a graph swap takes effect next trigger") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    // build + persist the graph exactly as the s11 query does
    graft.queries.LlmQueries.all("s11_ann_hnsw")(spark, dir).collect()
    val e = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))

    val queryIds = Seq(0L, 3L, 7L, 12L, 19L)
    val queryVecs = e.where(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id"), col("v"))
      .as[(Long, Seq[Double])].collect().toSeq

    val batchAnswer = {
      val qs = e.where(col("vec_id").isin(queryIds: _*))
        .select(col("vec_id").as("q"), col("v").as("qv"),
          col("nrm").as("qn"))
      HnswGraph.search(spark.table("s11_hnsw_graph"), e, qs)
        .orderBy(col("q"), col("rk")).collect().toSeq
    }

    val got = mutable.ArrayBuffer[Row]()
    val mem = MemoryStream[(Long, Seq[Double])](spark, 42)
    val q = StreamingGraphAnn.serve(
      mem.toDF().toDF("vec_id", "v"), e, "s11_hnsw_graph") { res =>
      got.synchronized { got ++= res.collect() }
    }
    try {
      mem.addData(queryVecs.take(2))
      q.processAllAvailable()
      mem.addData(queryVecs.drop(2))
      q.processAllAvailable()
      val streamed = got.sortBy(r => (r.getLong(0), r.getInt(1)))
      assert(streamed.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))) ===
        batchAnswer.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))))
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
