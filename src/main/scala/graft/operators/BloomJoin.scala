package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BloomSketch

/** Bloom-pruned shuffle join — the runtime-filter move as an explicit
  * operator: before a large ⋈ medium equi-join shuffles the large side,
  * a Bloom sketch of the medium side's join keys filters the large side
  * MAP-SIDE, so rows that cannot match never enter the exchange.
  *
  * Semantically identical to the plain inner join: the filter has no
  * false negatives (every matching row survives) and its false
  * positives are dropped by the join itself. What changes is the
  * shuffle volume — with build-side selectivity s and FP rate ε, the
  * probe side exchanges (s + ε) of its rows instead of all of them.
  *
  * When to use which join:
  *  - medium side fits the broadcast threshold → plain broadcast join
  *    (no shuffle at all) beats this;
  *  - medium side too big to broadcast but its KEY SET sketches into a
  *    few MB → this: the bitmap is orders of magnitude smaller than a
  *    broadcast hash table (keys only, bits not entries), and the big
  *    side's exchange shrinks by the selectivity;
  *  - both sides huge and unselective → plain shuffle join; the sketch
  *    would pass everything.
  * Spark's own InjectRuntimeFilter (spark.sql.optimizer.runtime.
  * bloomFilter.enabled) makes the same transformation when statistics
  * justify it; this operator is the deterministic, always-on form with
  * an inspectable sketch, for pipelines that know their selectivity.
  *
  * The sketch build is one partial-aggregated pass over the medium
  * side's keys ([[BloomSketch]] — OR-merged bitmaps); the single-row
  * materialization is control-plane (the bitmap becomes a plan-constant
  * codegen'd predicate, never a row column).
  */
object BloomJoin {

  /** Inner equi-join `large ⋈ small` on `key`, large side Bloom-pruned
    * before its shuffle. Key can be any type xxhash64 accepts. */
  def inner(large: DataFrame, small: DataFrame, key: String,
      mBits: Int = 1 << 22): DataFrame = {
    val pruned = prune(large, small, large(key), small(key), mBits)
    pruned.join(small, key)
  }

  /** The pruning half alone: filter `probe` to rows whose `probeKey`
    * may appear among `build`'s `buildKey`s (no false negatives).
    * Exposed for joins that need their own shape downstream. */
  def prune(probe: DataFrame, build: DataFrame,
      probeKey: Column, buildKey: Column, mBits: Int = 1 << 22): DataFrame = {
    val words = build.select(xxhash64(buildKey).as("h")).na.drop()
      .agg(BloomSketch.column(col("h"), mBits).as("bf"))
      .head().getAs[scala.collection.Seq[Long]](0).toArray
    probe.where(BloomSketch.probeColumn(words, mBits, xxhash64(probeKey)))
  }
}
