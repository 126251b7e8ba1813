package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types.{BooleanType, DataType}

import graft.plans.ColumnBridge

/** Bloom-filter membership sketch (Bloom 1970) — the set-membership
  * entry in the sketch family next to a02's KMV (cardinality), a03's CMS
  * (frequency) and a04's hash-rank sample (quantiles).
  *
  * Layout: `mBits` bits stored as 32-bit words inside Longs (bits 0–31
  * only). 32-bit words are deliberate: the DuckDB oracle rebuilds the
  * words with `bit_or(1::BIGINT << (p % 32))`, and DuckDB RAISES on
  * `1::BIGINT << 63` where the JVM wraps — capping shifts at 31 keeps
  * every word arithmetic-identical in both engines. `Probes` positions
  * per key come from double hashing on the engine's own deterministic
  * fingerprint (h1 + i·h2 mod m, Kirsch–Mitzenmacher), so the sketch
  * contents are pure integer arithmetic — no RNG, no platform hash.
  *
  * Scale shape: the build is an associative/commutative Aggregator —
  * partial bitmaps are OR-merged, so a 100 TB eval set costs one pass
  * plus one (mBits/8)-byte exchange per partition. The probe side never
  * joins: [[BloomProbe]] embeds the finished word array in the plan as a
  * reference object, so membership is a map-side codegen'd expression —
  * compare d07, whose broadcast semi-join must hash-probe a table. A
  * join would also copy the array into every probe row; the expression
  * ships it once per task.
  */
class BloomSketch(mBits: Int) extends Aggregator[Long, Array[Long], Array[Long]]
    with Serializable {
  require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
    s"bloom needs a power-of-two bit count >= 64 (got $mBits)")

  override def zero: Array[Long] = new Array[Long](mBits / 32)

  override def reduce(b: Array[Long], f: Long): Array[Long] = {
    BloomSketch.set(b, mBits, f); b
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object BloomSketch {
  /** Probe count. k=3 keeps the oracle's per-key UNNEST small; FP rate is
    * fill³ where fill = 1 - exp(-3n/m) — size mBits to the eval set. */
  final val Probes = 3

  /** The three bit positions of a fingerprint: double hashing
    * h1 = f mod m, h2 = 1 + (f mod (m-1)), pos_i = (h1 + i·h2) mod m.
    * h2 ∈ [1, m-1] is never 0 mod m, so consecutive positions differ.
    * floorMod, not %: PolyHash fingerprints are non-negative (where the
    * two agree, keeping the DuckDB replay exact) but BloomJoin feeds
    * xxhash64 keys, which go negative. */
  def positions(mBits: Int, f: Long): Array[Int] = {
    val h1 = java.lang.Math.floorMod(f, mBits.toLong)
    val h2 = 1L + java.lang.Math.floorMod(f, mBits.toLong - 1L)
    Array.tabulate(Probes)(i => ((h1 + i * h2) % mBits).toInt)
  }

  def set(words: Array[Long], mBits: Int, f: Long): Unit = {
    val ps = positions(mBits, f)
    var i = 0
    while (i < ps.length) {
      words(ps(i) >>> 5) |= 1L << (ps(i) & 31); i += 1
    }
  }

  /** True iff every probe bit of `f` is set — no false negatives ever;
    * false positives at the designed rate. */
  def probe(words: Array[Long], mBits: Int, f: Long): Boolean = {
    val h1 = java.lang.Math.floorMod(f, mBits.toLong)
    val h2 = 1L + java.lang.Math.floorMod(f, mBits.toLong - 1L)
    var i = 0
    while (i < Probes) {
      val pos = ((h1 + i * h2) % mBits).toInt
      if (((words(pos >>> 5) >>> (pos & 31)) & 1L) == 0L) return false
      i += 1
    }
    true
  }

  /** Aggregator column form: bloom_build(fpCol) → array<bigint> words. */
  def column(c: Column, mBits: Int): Column =
    udaf(new BloomSketch(mBits)).apply(c)

  /** Map-side membership test against a finished sketch. */
  def probeColumn(words: Array[Long], mBits: Int, c: Column): Column =
    ColumnBridge.column(BloomProbe(words, mBits, ColumnBridge.expression(c)))
}

/** Codegen'd membership probe: the finished word array rides the plan as
  * a task-level reference object (addReferenceObj) — evaluated inside
  * whole-stage codegen with zero joins and zero per-row copies. */
case class BloomProbe(words: Array[Long], mBits: Int, child: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else BloomSketch.probe(words, mBits, v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
    val cGen = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${cGen.code}
        boolean ${ev.isNull} = ${cGen.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.BloomSketch.probe(
            $ref, $mBits, ${cGen.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
