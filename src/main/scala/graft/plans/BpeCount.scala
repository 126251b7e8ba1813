package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.BpeCodec

/** Exact BPE token count over an arbitrary-size merge table as a
  * codegen'd Catalyst expression. The codec (symbol tables + pair-rank
  * hash map built from the merge list) rides along as a plan-constant
  * reference object — `ctx.addReferenceObj` — so generated code stays
  * inside whole-stage codegen and the table ships to executors once per
  * stage like a broadcast variable, NOT once per rule per row like the
  * replace-chain Column form. That chain form
  * (TextFunctions.bpeTokenCount) compiles one `replace` node per rule:
  * correct and oracle-replayable at the ~35-rule t11 fixture, impossible
  * at a realistic 30–50k-merge vocabulary — which is exactly the scale
  * this expression exists for (t19). `BpeCodecSpec` pins the two forms
  * equal on the t11 fixture, and t11 itself runs through THIS expression
  * against its unchanged replace-chain DuckDB oracle.
  */
case class BpeCount(child: Expression, codec: BpeCodec)
  extends Expression {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    codec.countTokens(v.asInstanceOf[UTF8String].toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cGen = child.genCode(ctx)
    val codecRef = ctx.addReferenceObj("bpeCodec", codec,
      classOf[BpeCodec].getName)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
        ${cGen.code}
        boolean ${ev.isNull} = ${cGen.isNull};
        $javaType ${ev.value} = 0L;
        if (!${ev.isNull}) {
          ${ev.value} = $codecRef.countTokens(${cGen.value}.toString());
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object BpeCount {
  def apply(text: Column, codec: BpeCodec): Column =
    ColumnBridge.column(BpeCount(ColumnBridge.expression(text), codec))
}
