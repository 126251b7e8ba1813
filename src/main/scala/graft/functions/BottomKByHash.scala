package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Per-group deterministic sample: the k (hash, value) pairs with the
  * LOWEST (hash, value) order — the grouped, payload-carrying sibling of
  * a04's global hash-rank sample and a02's KMV buffer. Because the kept
  * multiset depends only on the pair values (never on arrival or
  * partition order), any partitioning — and any later merge of partial
  * buffers — selects the same sample, so downstream order statistics
  * (quantile cutoffs, t14) are exactly replayable cross-engine.
  *
  * Scale shape: associative + commutative Aggregator — partial
  * aggregation runs map-side and only 2k-long buffers cross the shuffle,
  * one per (group × partition). This is the ONLY scale-safe way to take
  * a per-group sample: a `row_number() OVER (PARTITION BY g ORDER BY h)`
  * window funnels every row of a group through one partition first —
  * per-language groups of a 100 TB corpus would be single-partition
  * sorts — where this buffer never materializes a group anywhere.
  *
  * Buffer layout: flattened `[h0,v0,h1,v1,…]` sorted ascending by
  * (h, v), at most k pairs, duplicates kept (multiset semantics — an
  * oracle's `row_number ≤ k` replay keeps boundary ties the same way).
  */
class BottomKByHash(k: Int)
    extends Aggregator[(Long, Long), Array[Long], Array[Long]]
    with Serializable {
  require(k >= 1, s"bottom-k needs k >= 1 (got $k)")

  override def zero: Array[Long] = Array.emptyLongArray

  private def insert(acc: Array[Long], h: Long, v: Long): Array[Long] = {
    val npairs = acc.length / 2
    var i = 0
    while (i < npairs &&
      (acc(2 * i) < h || (acc(2 * i) == h && acc(2 * i + 1) <= v))) i += 1
    if (npairs == k && i == k) return acc
    val keep = math.min(npairs + 1, k)
    val out = new Array[Long](keep * 2)
    System.arraycopy(acc, 0, out, 0, 2 * i)
    out(2 * i) = h
    out(2 * i + 1) = v
    System.arraycopy(acc, 2 * i, out, 2 * i + 2, (keep - 1 - i) * 2)
    out
  }

  override def reduce(b: Array[Long], a: (Long, Long)): Array[Long] =
    insert(b, a._1, a._2)

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var acc = b1
    var i = 0
    while (i < b2.length / 2) { acc = insert(acc, b2(2 * i), b2(2 * i + 1)); i += 1 }
    acc
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object BottomKByHash {
  /** Column form: bottom_k_by_hash(hashCol, valueCol, k) →
    * array<bigint> of flattened (hash, value) pairs sorted by (hash, value). */
  def column(h: Column, v: Column, k: Int): Column =
    udaf(new BottomKByHash(k)).apply(h, v)
}
