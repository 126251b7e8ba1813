package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial string hash as a codegen'd Catalyst expression:
  * h = fold(chars, 0, (acc, cp) → (acc·base + codepoint) mod `mod`).
  *
  * At the default (base 31, mod 1e9+7) this is an exact replacement for
  * the interpreted
  * `aggregate(split(s, ""), 0L, (acc, ch) → (acc*31 + ascii(ch)) % M)`
  * higher-order form (TextFunctions.fingerprint): same fold order, same
  * codepoint values, same modulus — so minhash/simhash/fingerprint results
  * and their DuckDB oracles are unchanged. The HOF form allocates a
  * per-character string array and two lambda frames per character; this is
  * one loop over the string, which matters when every 3-word shingle of a
  * 100 TB corpus goes through it.
  *
  * The (base, mod) parameters exist for the ~2^60 IDENTITY keys
  * (TextFunctions.fingerprintWide): two independent sub-2^30 hashes
  * combined into one key, where a single mod-1e9+7 hash would birthday-
  * collide at the corpus scales this engine targets. Both moduli must
  * keep acc·base + cp < 2^63 (any prime < 2^31 does: acc < 2^31,
  * base ≤ a few hundred → product < 2^40).
  */
case class PolyHash(child: Expression, base: Long = 31L,
    mod: Long = PolyHash.Mod) extends Expression {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    PolyHash.hash(v.asInstanceOf[UTF8String].toString, base, mod)
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
          ${ev.value} = graft.plans.PolyHash.hash(
            ${cGen.value}.toString(), ${base}L, ${mod}L);
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
  def hash(s: String, base: Long = 31L, mod: Long = Mod): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * base + cp) % mod
      i += Character.charCount(cp)
    }
    h
  }

  def apply(c: Column): Column =
    ColumnBridge.column(PolyHash(ColumnBridge.expression(c)))

  def apply(c: Column, base: Long, mod: Long): Column =
    ColumnBridge.column(PolyHash(ColumnBridge.expression(c), base, mod))
}
