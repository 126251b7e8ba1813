package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise sum of double arrays across rows — the Spark-native
  * re-expression of the reference's PL/pgSQL `array_add` sfunc +
  * `array_element_sum` aggregate (`sql_scripts/functions.sql:2-28`):
  * ragged inputs are zero-padded to the longer length, null slots count
  * as zero, and the aggregate is associative/commutative so Spark can
  * partial-aggregate map-side before the shuffle.
  */
object ArrayElementSum extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {

  override def zero: Array[Double] = Array.emptyDoubleArray

  private def add(acc: Array[Double], x: Seq[Double]): Array[Double] = {
    if (x == null) return acc
    val n = math.max(acc.length, x.length)
    val out = new Array[Double](n)
    System.arraycopy(acc, 0, out, 0, acc.length)
    var i = 0
    while (i < x.length) { out(i) += x(i); i += 1 }
    out
  }

  override def reduce(b: Array[Double], a: Seq[Double]): Array[Double] = add(b, a)

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] =
    add(b1, b2.toSeq)

  override def finish(r: Array[Double]): Seq[Double] = r.toSeq

  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()

  /** Column form: array_element_sum(arrCol). */
  def column(c: Column): Column = udaf(ArrayElementSum).apply(c)
}
