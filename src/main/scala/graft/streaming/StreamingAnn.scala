package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.TextFunctions.dot

/** Vector-store serving path: a stream of query vectors probes the
  * persisted [[graft.operators.IvfIndex]] — the online complement of the
  * batch s10 query. Each micro-batch scores its queries against the
  * broadcast centroid set, picks the nProbe nearest inverted lists, and
  * equi-joins the partitioned index on the list id, so each batch reads
  * only its probed lists (the same partition-pruned scan the batch path
  * pins in `PlanQualitySpec` S10) and untouched lists cost nothing.
  *
  * The probe runs inside `foreachBatch`: the per-query top-nProbe rank
  * is a non-time window, which an append stream cannot express — and
  * serving wants batch semantics per micro-batch anyway (every batch is
  * a complete, independent query set; no cross-batch state). Results are
  * deterministic per query (cosines rounded to 6, ties → lower id), so
  * a query answers identically whichever micro-batch delivers it —
  * [[StreamingAnnSpec]] pins streaming == batch on a split query set.
  */
object StreamingAnn {

  /** Answer one batch of queries `(vec_id, v: array<double>)` against
    * the index: per query, the top-`k` neighbors (by rounded cosine)
    * within its `nProbe` nearest centroid lists. `centroids` is
    * `(cid, cv, cn)` — K rows, broadcast. */
  def probeBatch(queries: DataFrame, centroids: DataFrame, table: String,
      k: Int = 5, nProbe: Int = 2): DataFrame = {
    val spark = queries.sparkSession
    val q = queries.select(col("vec_id").as("q"), col("v").as("qv"))
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
    val probes = q.join(broadcast(centroids))
      .select(col("q"), col("qv"), col("qn"), col("cid"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6)
          .as("csim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q")).orderBy(col("csim").desc, col("cid"))))
      .where(col("rn") <= nProbe)
      .select(col("q"), col("qv"), col("qn"), col("cid"))
    // cross-session appends (IvfIndex.appendCommit from another JVM's
    // writer or a cloned streaming session) leave this session's file
    // listing stale — refresh before resolving (O(listing))
    spark.catalog.refreshTable(table)
    val index = spark.table(table)
    val scored = broadcast(probes).join(index,
        probes("cid") === index("cid") && index("vec_id") =!= probes("q"))
      .select(col("q"), index("vec_id").as("nb"),
        round(dot(col("qv"), index("v")) / (col("qn") * index("nrm")), 6)
          .as("sim"))
    scored.select(col("q"), col("nb"), col("sim"),
        row_number().over(Window.partitionBy(col("q"))
          .orderBy(col("sim").desc, col("nb"))).as("rk"))
      .where(col("rk") <= k)
  }

  /** Serve a query-vector stream: every micro-batch is answered via
    * [[probeBatch]] and handed to `sink` (append to a results table,
    * push to a queue — the caller's choice). */
  def serve(queries: DataFrame, centroids: DataFrame, table: String,
      k: Int = 5, nProbe: Int = 2)(sink: DataFrame => Unit): StreamingQuery =
    queries.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(probeBatch(batch, centroids, table, k, nProbe))
      }
      .start()

  /** Ingest a delta-vector stream `(vec_id, v)` into the standing
    * index: every micro-batch routes its vectors to their nearest
    * centroid list ([[graft.operators.IvfIndex.assign]]) and appends
    * under the commit protocol, then applies the AUTO-COMPACT policy:
    * when any inverted list has accumulated more than
    * `maxFilesPerList` files ([[graft.operators.CompactPolicy]] —
    * appends are file-additive by design, and probe latency degrades
    * with footer reads and split planning, not bytes), the offending
    * lists are rewritten in place via [[graft.operators.IvfIndex
    * .compact]] and `onCompact` observes the result. The decision is
    * derived from the table layout itself (no in-memory counters), so
    * a restarted stream inherits the true compaction debt. Serving
    * queries race this safely: list compaction swaps files atomically
    * per directory ([[graft.operators.ParquetCompactor]]'s crash-safe
    * protocol) and [[probeBatch]] refreshes its listing per trigger.
    *
    * Replay safety (streams retry failed batches): the last applied
    * batchId lands in a commit-dir marker AFTER the append commit and
    * a batch ≤ the marker is skipped — without it, a checkpointed
    * restart re-appends the last batch's rows into the lists
    * (duplicate neighbors served forever). Same protocol and same
    * stated window as [[StreamingMerge.applyBatchRetain]]: a crash
    * between commit and marker re-appends once; unlike the merge the
    * append is not content-idempotent, so that single window is
    * at-least-once — bounded to one batch, and an offline re-[[graft
    * .operators.IvfIndex.write]] from the deduplicated source heals
    * it. */
  def ingest(deltas: DataFrame, centroids: DataFrame, table: String,
      maxFilesPerList: Int = 8,
      onCompact: Seq[graft.operators.ParquetCompactor.CompactionResult]
        => Unit = _ => ()): StreamingQuery = {
    val spark = deltas.sparkSession
    deltas.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val applied = graft.operators.TableCommit
          .readMarker(spark, table, "stream").map(_.toLong)
        if (!applied.exists(_ >= batchId)) {
          // two-level routing, same as the batch index build (r11): a
          // delta routed by a DIFFERENT rule than the standing index
          // would land near-duplicates in different lists than a
          // rebuild puts them
          graft.operators.IvfIndex.appendCommit(
            graft.operators.IvfIndex.assignTwoLevel(batch, centroids),
            table)
          graft.operators.TableCommit.writeMarker(spark, table, "stream",
            batchId.toString)
          if (graft.operators.CompactPolicy.shouldCompact(
              spark, table, maxFilesPerList))
            onCompact(graft.operators.IvfIndex.compact(spark, table,
              minFiles = 1))
        }
      }
      .start()
  }
}
