package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{BucketedLayout, HnswGraph, SegmentDedup,
  TableCommit}

/** A streaming admitter racing a BATCH REBUILD of the same standing
  * table through [[TableCommit]] — the deployment shape where a
  * continuous ingest stream and a periodic compaction/rebuild job share
  * one table. The protocol's contract: exactly one winner; the loser
  * gets a clean ConcurrentWriteException (never a silently mixed
  * snapshot). The race is staged deterministically: the rebuild records
  * the epoch its corpus read was BASED ON, the streaming admitter lands
  * a batch in between (epoch bumps), and the rebuild's commit must then
  * fail the CAS — the exact interleaving a wall-clock race only
  * sometimes produces.
  */
class StreamingBatchRaceSpec extends SparkSpec {

  test("segment-dedup: a streaming admission beats a batch rebuild " +
      "based on the superseded snapshot; admitted fingerprints survive") {
    import spark.implicits._
    val T = "race_seg_snapshot"
    graft.operators.SnapshotMerge.dropTableAndLocation(spark, T)
    // the replay marker + epoch survive in the commits dir across JVMs
    // — a previous run of this spec would otherwise make the admission
    // below skip as "already applied batch 0"
    TableCommit.reset(spark, T)
    val standing = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    SegmentDedup.writeSnapshot(standing, T, nBuckets = 4)

    // the batch rebuild reads its input AT this epoch
    val base = TableCommit.epochOf(spark, T)

    // streaming admitter lands a micro-batch (the foreachBatch body)
    val batch = Seq((2L, "epsilon zeta eta theta")).toDF("doc_id", "text")
    StreamingSegmentDedup.applyBatch(spark, T, batch, batchId = 0L,
      nBuckets = 4) { _ => () }
    assert(TableCommit.epochOf(spark, T) > base)
    val admitted = spark.table(T).count()

    // the rebuild, still based on `base`, must lose its CAS cleanly
    intercept[TableCommit.ConcurrentWriteException] {
      TableCommit.commit(spark, T, base) {
        fail("rebuild swap must not run after a superseding admission")
      }
    }
    // and the winner's admission is intact
    spark.catalog.refreshTable(T)
    assert(spark.table(T).count() === admitted)
  }

  test("graph-ANN: an append beats a compact based on the superseded " +
      "graph; the compact retried against the current epoch wins") {
    import spark.implicits._
    val T = "race_hnsw_graph"
    graft.operators.SnapshotMerge.dropTableAndLocation(spark, T)
    TableCommit.reset(spark, T)
    val e = (0L until 64L).map { i =>
      val v = Seq(1.0 + i % 7, 2.0 + i % 5, 1.0 + i % 3, (i % 11).toDouble)
      (i, v)
    }.toDF("vec_id", "v")
      .withColumn("nrm",
        sqrt(graft.functions.TextFunctions.dot(col("v"), col("v"))))
    val cells = HnswGraph.signCells(e, 3)
    HnswGraph.writeGraph(
      HnswGraph.build(e, cells, m = 4, stride = 8L), T, 64L)
    val base = TableCommit.epochOf(spark, T)

    // streaming append lands first
    val delta = Seq((1001L, Seq(1.5, 2.5, 1.5, 3.0))).toDF("vec_id", "v")
      .withColumn("nrm",
        sqrt(graft.functions.TextFunctions.dot(col("v"), col("v"))))
    val union = e.unionByName(delta)
    val allCells = HnswGraph.signCells(union, 3)
    HnswGraph.append(T, e, delta, allCells, m = 4, stride = 8L)

    // compact built against the pre-append corpus read loses
    intercept[TableCommit.ConcurrentWriteException] {
      HnswGraph.compact(T, e, cells, m = 4, stride = 8L,
        baseEpoch = Some(base))
    }
    // the appended node is still served
    assert(spark.table(T).where(col("src") === 1001L).count() > 0)

    // retried against the epoch it can actually see, the compact wins —
    // and the rebuild now INCLUDES the appended vector
    val epoch = HnswGraph.compact(T, union, allCells, m = 4, stride = 8L)
    assert(epoch === TableCommit.epochOf(spark, T))
    assert(spark.table(T).where(col("src") === 1001L).count() > 0)
  }
}
