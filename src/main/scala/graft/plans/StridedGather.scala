package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Strided gather over a flattened image cube (J3,
  * epic_services/watch_dog.py:442-455: `img_array[:, :, :, y-1, x-1]`).
  *
  * For a row-major [complex, npol, nchan, y, x] cube stored as
  * array<float> OR as a raw little-endian float32 `binary` blob, returns
  * the length-`planes` vector `[image[(k·ydim + y)·xdim + x] : k ← 0…planes)`
  * as array<double> — all chan/pol/complex samples of one sky pixel.
  *
  * Why a custom Expression instead of `transform(sequence(...), ...)`:
  * the higher-order-function form allocates a lambda frame and an index
  * array per pixel row and is interpreted per element; this node compiles
  * (doGenCode) to one tight primitive loop inside whole-stage codegen —
  * the hot path runs per patch pixel per image, 2·npol·nchan reads each.
  *
  * Why the binary variant matters at 100 TB: parquet decodes an
  * array<float> cube element-by-element (~MB-scale assembly per image
  * row), while a binary blob is one buffer copy — the gather then touches
  * only the 2·npol·nchan·n² bytes it needs. This is the "prune into the
  * binary decode" design the survey calls for (SURVEY §7.3).
  */
case class StridedGather(
    image: Expression, planes: Expression, y: Expression, x: Expression,
    ydim: Expression, xdim: Expression)
  extends Expression {

  override def children: Seq[Expression] =
    Seq(image, planes, y, x, ydim, xdim)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // Always nullable: out-of-range pixel indices yield null rather than
  // throwing. This matters because the optimizer may evaluate the gather
  // BEFORE the FOV filters (InferFiltersFromGenerate clones the exploded
  // expression into a pushed-down `size(...) > 0` guard), so the
  // expression must be total; OOB patches are always discarded by the
  // in-FOV predicates downstream.
  override def nullable: Boolean = true

  // lazy: children are unresolved at construction time (Column API / SQL)
  private lazy val binaryInput: Boolean = image.dataType == BinaryType

  override def eval(input: InternalRow): Any = {
    val imgV = image.eval(input)
    val planesV = planes.eval(input)
    val yV = y.eval(input)
    val xV = x.eval(input)
    val ydimV = ydim.eval(input)
    val xdimV = xdim.eval(input)
    if (imgV == null || planesV == null || yV == null || xV == null ||
      ydimV == null || xdimV == null) return null
    val p = planesV.asInstanceOf[Int]
    val yy = yV.asInstanceOf[Int]
    val xx = xV.asInstanceOf[Int]
    val yd = ydimV.asInstanceOf[Int]
    val xd = xdimV.asInstanceOf[Int]
    val out = new Array[Double](p)
    if (binaryInput) {
      val bytes = imgV.asInstanceOf[Array[Byte]]
      val len = bytes.length >> 2
      var k = 0
      while (k < p) {
        val idx = (k * yd + yy) * xd + xx
        if (idx < 0 || idx >= len) return null
        out(k) = StridedGather.floatAtLE(bytes, idx)
        k += 1
      }
    } else {
      val img = imgV.asInstanceOf[ArrayData]
      val len = img.numElements()
      var k = 0
      while (k < p) {
        val idx = (k * yd + yy) * xd + xx
        if (idx < 0 || idx >= len) return null
        out(k) = img.getFloat(idx).toDouble
        k += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val imgGen = image.genCode(ctx)
    val planesGen = planes.genCode(ctx)
    val yGen = y.genCode(ctx)
    val xGen = x.genCode(ctx)
    val ydGen = ydim.genCode(ctx)
    val xdGen = xdim.genCode(ctx)
    val arr = ctx.freshName("gatherArr")
    val k = ctx.freshName("k")
    val idx = ctx.freshName("idx")
    val len = ctx.freshName("len")
    val anyNull = Seq(imgGen, planesGen, yGen, xGen, ydGen, xdGen)
      .map(_.isNull).mkString(" || ")
    val javaType = CodeGenerator.javaType(dataType)
    val lenExpr = if (binaryInput) s"${imgGen.value}.length >> 2"
      else s"${imgGen.value}.numElements()"
    val readExpr = if (binaryInput) {
      s"graft.plans.StridedGather.floatAtLE(${imgGen.value}, $idx)"
    } else {
      s"(double) ${imgGen.value}.getFloat($idx)"
    }
    ev.copy(code =
      code"""
        ${imgGen.code}
        ${planesGen.code}
        ${yGen.code}
        ${xGen.code}
        ${ydGen.code}
        ${xdGen.code}
        boolean ${ev.isNull} = $anyNull;
        $javaType ${ev.value} = null;
        if (!${ev.isNull}) {
          int $len = $lenExpr;
          double[] $arr = new double[${planesGen.value}];
          for (int $k = 0; $k < ${planesGen.value}; $k++) {
            int $idx = ($k * ${ydGen.value} + ${yGen.value}) * ${xdGen.value}
              + ${xGen.value};
            if ($idx < 0 || $idx >= $len) { ${ev.isNull} = true; break; }
            $arr[$k] = $readExpr;
          }
          if (!${ev.isNull}) {
            ${ev.value} =
              new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
          }
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(image = newChildren(0), planes = newChildren(1), y = newChildren(2),
      x = newChildren(3), ydim = newChildren(4), xdim = newChildren(5))
}

object StridedGather {

  /** Little-endian float32 read at element index `idx` of a raw blob —
    * called from generated code, keep signature stable. */
  def floatAtLE(bytes: Array[Byte], idx: Int): Double = {
    val o = idx << 2
    java.lang.Float.intBitsToFloat(
      (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24))
      .toDouble
  }

  /** Column API: strided_gather(image, planes, y, x, ydim, xdim). */
  def apply(image: Column, planes: Column, y: Column, x: Column,
      ydim: Column, xdim: Column): Column =
    ColumnBridge.column(StridedGather(
      ColumnBridge.expression(image), ColumnBridge.expression(planes),
      ColumnBridge.expression(y), ColumnBridge.expression(x),
      ColumnBridge.expression(ydim), ColumnBridge.expression(xdim)))
}
