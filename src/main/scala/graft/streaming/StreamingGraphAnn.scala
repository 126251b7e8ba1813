package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.HnswGraph

/** Streaming serving over the persisted HNSW graph — the s11 analog of
  * [[StreamingAnn]] (which serves the IVF index): a query-vector stream
  * is answered per micro-batch by the fixed-schedule beam descent
  * against the standing src-bucketed graph table. Same rationale as
  * StreamingAnn's foreachBatch shape: the per-query top-k rank is a
  * non-time window an append stream cannot express, and serving wants
  * independent batch semantics anyway — every batch is a complete query
  * set, no cross-batch state. Search is deterministic per query
  * (6-rounded cosines, id tie-breaks, constant entry point), so a query
  * answers identically whichever micro-batch delivers it —
  * `StreamingGraphAnnSpec` pins streaming == batch on a split query
  * set. The graph table re-resolves every micro-batch, so an index
  * refresh (rebuild + [[graft.operators.TableCommit]] swap) takes
  * effect on the next trigger without restarting the serving query.
  */
object StreamingGraphAnn {

  /** Serve `queries` (vec_id, v: array<double>) against graph `table`
    * over `corpus` (vec_id, v, nrm): every micro-batch beam-descends
    * via [[HnswGraph.search]] and hands (q, rk, nb, sim) to `sink`. */
  def serve(queries: DataFrame, corpus: DataFrame, table: String,
      efUpper: Int = HnswGraph.DefaultEfUpper,
      ef0: Int = HnswGraph.DefaultEf0, k: Int = 5)(
      sink: DataFrame => Unit): StreamingQuery = {
    val spark = queries.sparkSession
    queries.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import org.apache.spark.sql.functions._
        val qs = batch
          .select(col("vec_id").as("q"), col("v").as("qv"))
          .withColumn("qn",
            sqrt(graft.functions.TextFunctions.dot(col("qv"), col("qv"))))
        // an HnswGraph.append from another session leaves this
        // session's file listing for the table stale — refresh per
        // trigger (O(listing)) so served results include the newest
        // appended vectors
        spark.catalog.refreshTable(table)
        sink(HnswGraph.search(spark.table(table), corpus, qs,
          efUpper, ef0, k))
      }
      .start()
  }
}
