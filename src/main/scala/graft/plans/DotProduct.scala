package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sequential-fold dot product of two double arrays as a codegen'd Catalyst
  * expression — the hot kernel of cosine similarity search and embedding
  * near-dedup.
  *
  * Semantics are EXACTLY `aggregate(zip_with(a, b, _*_), 0.0, _+_)` (a
  * strict left fold, `((0 + a0·b0) + a1·b1) + …`), so results are
  * bit-identical to the interpreted higher-order form and to the DuckDB
  * oracle's `list_reduce(list_prepend(0.0, …))`. The difference is purely
  * mechanical: one primitive loop in whole-stage codegen versus ~2 lambda
  * frames and an allocated intermediate array per pair — on an O(n²)
  * similarity join that interpreter overhead dominated the runtime.
  */
case class DotProduct(left: Expression, right: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) return null
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    val n = math.min(aa.numElements(), bb.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += aa.getDouble(i) * bb.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGen = left.genCode(ctx)
    val rGen = right.genCode(ctx)
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
        ${lGen.code}
        ${rGen.code}
        boolean ${ev.isNull} = ${lGen.isNull} || ${rGen.isNull};
        $javaType ${ev.value} = 0.0;
        if (!${ev.isNull}) {
          int $n = java.lang.Math.min(${lGen.value}.numElements(),
            ${rGen.value}.numElements());
          for (int $i = 0; $i < $n; $i++) {
            ${ev.value} += ${lGen.value}.getDouble($i) *
              ${rGen.value}.getDouble($i);
          }
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1))
}

object DotProduct {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
