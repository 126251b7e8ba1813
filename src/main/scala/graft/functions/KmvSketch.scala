package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** K-minimum-values (KMV) distinct-count sketch — approximate
  * COUNT(DISTINCT) in one pass with a k-long buffer per group.
  *
  * The estimator: hashes uniform on [0, M) imply the k-th smallest
  * distinct hash h_k sits near k/n · M, so n ≈ (k-1) · M / h_k (the
  * unbiased KMV form, Bar-Yossef et al. 2002). Groups with fewer than k
  * distinct hashes hold every value, so the count is exact there.
  *
  * Why this and not HyperLogLog: approx_count_distinct's HLL++ cannot be
  * replayed in another engine, so its answers are unverifiable. KMV over
  * the engine's own deterministic [[TextFunctions.fingerprint]] is exact
  * arithmetic — the DuckDB oracle reproduces the estimate bit-for-bit
  * (a02's oracle takes the k-th smallest distinct hash via row_number and
  * applies the same formula).
  *
  * Scale shape: the aggregate is associative and commutative — Spark
  * partial-aggregates map-side, and only k-long sorted buffers (not rows)
  * cross the shuffle. A 100 TB corpus costs one pass + one k·groups-sized
  * exchange, the same plan HLL would get, with ~1/√k relative error
  * (k = 64 → ~12%; raise k for precision, the buffer stays tiny).
  */
class KmvSketch(k: Int) extends Aggregator[Long, Array[Long], Double]
    with Serializable {
  // the estimator divides by the k-th smallest hash and k=1 degenerates
  // to 0 · M / h_1 = 0 for every group — fail construction, not mid-agg
  require(k >= 2, s"kmv needs k >= 2 (got $k)")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], a: Long): Array[Long] =
    KmvSketch.insert(k, b, a)

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var acc = b1
    var i = 0
    while (i < b2.length) { acc = KmvSketch.insert(k, acc, b2(i)); i += 1 }
    acc
  }

  override def finish(r: Array[Long]): Double =
    if (r.length < k) r.length.toDouble
    else (k - 1).toDouble * TextFunctions.Mod / r(k - 1)

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Double] = ExpressionEncoder[Double]()
}

object KmvSketch {
  /** Insert into a sorted distinct k-bounded buffer. */
  private[functions] def insert(k: Int, acc: Array[Long], x: Long): Array[Long] = {
    if (acc.length == k && x >= acc(k - 1)) return acc
    val idx = java.util.Arrays.binarySearch(acc, x)
    if (idx >= 0) return acc // already held
    val ins = -idx - 1
    val n = math.min(acc.length + 1, k)
    val out = new Array[Long](n)
    System.arraycopy(acc, 0, out, 0, ins)
    out(ins) = x
    System.arraycopy(acc, ins, out, ins + 1, n - ins - 1)
    out
  }

  /** Column form: kmv_distinct(hashCol, k). */
  def column(c: Column, k: Int): Column = udaf(new KmvSketch(k)).apply(c)

  /** Buffer form: the sorted k-minimum distinct hashes themselves —
    * the mergeable representation for sketch SET ALGEBRA (a06): two
    * groups' buffers union/sort/truncate with plain array functions
    * into the union's buffer, and the same estimator reads cardinality
    * off any merged buffer. */
  def bufferColumn(c: Column, k: Int): Column =
    udaf(new KmvBuffer(k)).apply(c)
}

/** [[KmvSketch]] that emits the buffer instead of the estimate. */
class KmvBuffer(k: Int) extends Aggregator[Long, Array[Long], Array[Long]]
    with Serializable {
  require(k >= 2, s"kmv needs k >= 2 (got $k)")
  override def zero: Array[Long] = Array.emptyLongArray
  override def reduce(b: Array[Long], a: Long): Array[Long] =
    KmvSketch.insert(k, b, a)
  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var acc = b1
    var i = 0
    while (i < b2.length) { acc = KmvSketch.insert(k, acc, b2(i)); i += 1 }
    acc
  }
  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
