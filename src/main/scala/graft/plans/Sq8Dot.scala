package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dequantize-and-dot of two SQ8 byte-code arrays as one codegen'd
  * Catalyst expression — the hot kernel of `HnswGraph.build`'s
  * quantized pair scorer (`sq8 = true`).
  *
  * Semantics are EXACTLY the interpreted higher-order form it replaces
  * (`dot(transform(sequence(1, size(c)), i -> mn_i + ((cast(c_i as
  * double) + 128.0) * (mx_i - mn_i)) / 255.0), …)`, a strict left fold
  * over per-element products — see `HnswGraph.scorePairsSq8Interp`):
  * per element, dequantize both codes with the identical
  * `mn + ((b + 128.0) * (mx - mn)) / 255.0` association, multiply, and
  * accumulate `((0 + d0) + d1) + …` in index order, so results are
  * bit-identical to the HOF form (pinned by `HnswSq8BuildSpec`). The
  * difference is purely mechanical: one primitive loop over the byte
  * arrays inside whole-stage codegen versus, per scored pair, two
  * `transform` lambda evaluations each allocating a 64-element double
  * array plus ~4 interpreter frames per element. The r13 x300 campaign
  * measured that overhead as the sq8 rung's blocker: each scored pair
  * priced ~3–5× a primitive double dot, and the 600k-vector build was
  * still inside its NN-descent rounds when the session ended
  * (SCALING_r13.json `x300_degree_law`); this expression is the
  * prescribed fix.
  *
  * The [mn, mx] per-dimension bounds are plan constants (2·dims
  * doubles), embedded as reference objects — the codes broadcast,
  * the bounds ride the serialized plan, exactly as the HOF form's
  * literal arrays did.
  */
case class Sq8Dot(left: Expression, right: Expression,
    mn: Seq[Double], mx: Seq[Double])
  extends Expression {

  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  @transient private lazy val mnArr: Array[Double] = mn.toArray
  @transient private lazy val mxArr: Array[Double] = mx.toArray

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) return null
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    // Loud on length mismatch (corrupt code array, stale mn/mx bounds):
    // a truncated loop would return a PLAUSIBLE-BUT-WRONG similarity,
    // where the interpreted element_at form this kernel replaced threw.
    // Same invariant posture as the rest of the repo; the codegen body
    // emits the identical check.
    if (aa.numElements() != mnArr.length ||
        bb.numElements() != mnArr.length)
      throw new IllegalArgumentException(
        s"Sq8Dot: code lengths ${aa.numElements()}/${bb.numElements()}" +
          s" != bounds length ${mnArr.length}")
    val n = mnArr.length
    var s = 0.0
    var i = 0
    while (i < n) {
      val lo = mnArr(i)
      val span = mxArr(i) - lo
      val da = lo + ((aa.getByte(i) + 128.0d) * span) / 255.0d
      val db = lo + ((bb.getByte(i) + 128.0d) * span) / 255.0d
      s += da * db
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val lGen = left.genCode(ctx)
    val rGen = right.genCode(ctx)
    val mnRef = ctx.addReferenceObj("sq8mn", mnArr, "double[]")
    val mxRef = ctx.addReferenceObj("sq8mx", mxArr, "double[]")
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val lo = ctx.freshName("lo")
    val span = ctx.freshName("span")
    val da = ctx.freshName("da")
    val db = ctx.freshName("db")
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
        ${lGen.code}
        ${rGen.code}
        boolean ${ev.isNull} = ${lGen.isNull} || ${rGen.isNull};
        $javaType ${ev.value} = 0.0;
        if (!${ev.isNull}) {
          if (${lGen.value}.numElements() != $mnRef.length ||
              ${rGen.value}.numElements() != $mnRef.length) {
            throw new IllegalArgumentException(
              "Sq8Dot: code lengths " + ${lGen.value}.numElements() +
              "/" + ${rGen.value}.numElements() +
              " != bounds length " + $mnRef.length);
          }
          int $n = $mnRef.length;
          for (int $i = 0; $i < $n; $i++) {
            double $lo = $mnRef[$i];
            double $span = $mxRef[$i] - $lo;
            double $da = $lo +
              ((${lGen.value}.getByte($i) + 128.0D) * $span) / 255.0D;
            double $db = $lo +
              ((${rGen.value}.getByte($i) + 128.0D) * $span) / 255.0D;
            ${ev.value} += $da * $db;
          }
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1))
}

object Sq8Dot {
  def apply(a: Column, b: Column, mn: Seq[Double],
      mx: Seq[Double]): Column =
    ColumnBridge.column(Sq8Dot(
      ColumnBridge.expression(a), ColumnBridge.expression(b), mn, mx))
}
