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
        // appended vectors. A [[HnswGraph.compact]] swap is a
        // drop+rename pair, so a read landing exactly between the two
        // catalog ops sees no table for a moment — retry resolves
        // against the renamed-in rebuild (bounded; any other failure
        // propagates and fails the stream loudly).
        var attempt = 0
        var done = false
        while (!done) {
          try {
            spark.catalog.refreshTable(table)
            sink(HnswGraph.search(spark.table(table), corpus, qs,
              efUpper, ef0, k))
            done = true
          } catch {
            case e: org.apache.spark.sql.AnalysisException
                if e.getCondition != null &&
                  e.getCondition.contains("TABLE_OR_VIEW_NOT_FOUND") &&
                  attempt < 5 =>
              attempt += 1
              Thread.sleep(100L * attempt)
          }
        }
      }
      .start()
  }

  /** Ingest a delta-vector stream `(vec_id, v)` into the standing
    * graph: every micro-batch links its vectors into `graphTable`
    * ([[HnswGraph.append]] — bounded per-batch reverse-edge prune, one
    * file per touched bucket) and appends them to `corpusTable` (the
    * `(vec_id, v, nrm)` snapshot the graph serves over), then applies
    * the AUTO-COMPACT policy ([[graft.operators.CompactPolicy]]): when
    * any graph bucket holds more than `maxFilesPerBucket` files, the
    * graph is rebuild-compacted from the GROWN corpus
    * ([[HnswGraph.compact]] — heavy build staged outside the table
    * lock, O(1) committed swap inside; a concurrent append loses the
    * race cleanly with `ConcurrentWriteException`, which the
    * sequential per-stream batches here never trigger against
    * themselves). File count is the trigger — it is what actually
    * degrades (append staleness tracks batches 1:1 with files), it
    * survives restarts, and a compact re-arms it by restoring one
    * file per bucket.
    *
    * Build constants (sign bits, stride, degree) are derived from the
    * corpus size the STANDING graph was built from and re-derived at
    * every compact — the only point where a graph's constants may
    * legitimately change (append must match the standing graph;
    * [[HnswGraph.mFor]] may step up as the corpus crosses a doubling).
    * `onCompact` observes each swapped-in epoch. */
  def ingest(deltas: DataFrame, corpusTable: String, graphTable: String,
      nBuckets: Int = 8, maxFilesPerBucket: Int = 8,
      onCompact: Long => Unit = _ => ()): StreamingQuery = {
    import org.apache.spark.sql.functions._
    val spark = deltas.sparkSession
    var n = spark.table(corpusTable).count()
    deltas.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val delta = batch.select(col("vec_id"), col("v"))
          .withColumn("nrm",
            sqrt(graft.functions.TextFunctions.dot(col("v"), col("v"))))
        val standing = spark.table(corpusTable)
        val cells = HnswGraph.signCells(standing.unionByName(delta),
          HnswGraph.bitsFor(n))
        HnswGraph.append(graphTable, standing, delta, cells,
          m = HnswGraph.mFor(n), nBuckets = nBuckets,
          stride = HnswGraph.strideFor(n))
        delta.write.mode("append").format("parquet")
          .saveAsTable(corpusTable)
        // foreachBatch hands over a frame bound to a CLONED session;
        // writes issued through it invalidate the clone's relation
        // cache, not this (outer) session's — without the explicit
        // refresh, this session's next spark.table read serves the
        // stale pre-append file listing (measured: files on disk, count
        // unchanged) and a later compact would rebuild WITHOUT the
        // ingested vectors, silently dropping them from the graph
        spark.catalog.refreshTable(corpusTable)
        spark.catalog.refreshTable(graphTable)
        if (graft.operators.CompactPolicy.shouldCompact(
            spark, graphTable, maxFilesPerBucket)) {
          val e = spark.table(corpusTable)
          val nNow = e.count()
          val epoch = HnswGraph.compact(graphTable, e,
            HnswGraph.signCells(e, HnswGraph.bitsFor(nNow)),
            m = HnswGraph.mFor(nNow), nBuckets = nBuckets,
            stride = HnswGraph.strideFor(nNow))
          n = nNow
          onCompact(epoch)
        }
      }
      .start()
  }
}
