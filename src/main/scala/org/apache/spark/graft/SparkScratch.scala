package org.apache.spark.graft

import org.apache.spark.{MapOutputTrackerMaster, SparkContext}
import org.apache.spark.storage.BroadcastBlockId

/** Compile-time bridge to Spark's `private[spark]` cleanup hooks — the
  * DETERMINISTIC replacement for the `System.gc()` nudge
  * `graft.operators.HnswGraph.build` used at slice boundaries (r13).
  *
  * A sliced NN-descent build runs each slice as its own job ending in an
  * eager localCheckpoint: once the checkpoint blocks exist, every
  * downstream consumer reads THEM, so the slice's shuffle files and
  * broadcast blocks are garbage by construction — but Spark only deletes
  * them when the ContextCleaner's weak references are enqueued, i.e.
  * after a full GC happens to run. The r13 x300 build relied on a
  * `System.gc()` between slices (empirically ~12 GB flat scratch); this
  * bridge instead hands the cleaner the exact ids to drop, so the bound
  * is enforced, not hoped for. It also destroys each slice's corpus
  * broadcasts the same way, which removes the r13-measured driver OOM:
  * ~300 accumulated ~300 MB raw-vector broadcasts awaiting GC at the
  * x300 geometry (SCALING_r13.json `x300_degree_law`).
  *
  * These are `private[spark]` members, not experimental APIs: the calls
  * do exactly what the ContextCleaner itself does when a reference is
  * GC'd (doCleanupShuffle / doCleanupBroadcast), just at a moment chosen
  * by the build instead of by the collector. If a released shuffle were
  * ever re-read (it cannot be, per the checkpoint argument above), the
  * reader gets a FetchFailed and Spark recomputes the map stage —
  * correct, merely slow — and a released broadcast re-read fails loudly;
  * neither can corrupt a result.
  *
  * SINGLE-BUILD ASSUMPTION (enforced where it can be): the id sets the
  * callers diff are context-GLOBAL, so anything a CONCURRENT query
  * creates inside a release window is released under it. For a foreign
  * shuffle that degrades to FetchFailed+recompute; for a foreign
  * BROADCAST it is stronger — the destroyed broadcast throws on re-read
  * and that query FAILS outright. Two graft builds serialize through
  * `HnswGraph.slicedBuildLock`; a concurrent non-build query cannot be
  * detected from here and is excluded by `HnswGraph.build`'s public
  * contract (sliced builds are dedicated offline jobs).
  */
object SparkScratch {

  /** Shuffle ids currently registered with the driver's map-output
    * tracker — every shuffle whose files may still be on disk. */
  def shuffleIds(sc: SparkContext): Set[Int] =
    sc.env.mapOutputTracker.asInstanceOf[MapOutputTrackerMaster]
      .shuffleStatuses.keySet.toSet

  /** Broadcast ids with blocks registered in the block manager master
    * (value blocks and torrent pieces alike collapse to the id). */
  def broadcastIds(sc: SparkContext): Set[Long] =
    sc.env.blockManager.master
      .getMatchingBlockIds(_.isInstanceOf[BroadcastBlockId],
        askStorageEndpoints = false)
      .collect { case b: BroadcastBlockId => b.broadcastId }
      .toSet

  /** Synchronously drop the given shuffles' files and broadcasts'
    * blocks — the ContextCleaner's own cleanup paths, invoked
    * deterministically. */
  def release(sc: SparkContext, shuffles: Set[Int],
      broadcasts: Set[Long]): Unit =
    sc.cleaner.foreach { c =>
      shuffles.foreach(id => c.doCleanupShuffle(id, blocking = true))
      broadcasts.foreach(id => c.doCleanupBroadcast(id, blocking = true))
    }
}
