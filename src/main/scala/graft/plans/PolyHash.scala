package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial string hash as a codegen'd Catalyst expression:
  * h = fold(chars, 0, (acc, cp) → (acc·31 + codepoint) mod 1e9+7).
  *
  * Exact replacement for the interpreted
  * `aggregate(split(s, ""), 0L, (acc, ch) → (acc*31 + ascii(ch)) % M)`
  * higher-order form (TextFunctions.fingerprint): same fold order, same
  * codepoint values, same modulus — so minhash/simhash/fingerprint results
  * and their DuckDB oracles are unchanged. The HOF form allocates a
  * per-character string array and two lambda frames per character; this is
  * one loop over the string, which matters when every 3-word shingle of a
  * 100 TB corpus goes through it.
  */
case class PolyHash(child: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    PolyHash.hash(v.asInstanceOf[UTF8String].toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cGen = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
        ${cGen.code}
        boolean ${ev.isNull} = ${cGen.isNull};
        $javaType ${ev.value} = 0L;
        if (!${ev.isNull}) {
          ${ev.value} = graft.plans.PolyHash.hash(${cGen.value}.toString());
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object PolyHash {
  final val Mod = 1000000007L

  /** Codepoint-wise rolling hash (matches split("")+ascii semantics). */
  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  def apply(c: Column): Column =
    ColumnBridge.column(PolyHash(ColumnBridge.expression(c)))
}
