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
  * array<float>, returns the length-`planes` vector
  * `[image[(k·ydim + y)·xdim + x] : k ← 0…planes)` as array<double> —
  * all chan/pol/complex samples of one sky pixel.
  *
  * Why a custom Expression instead of `transform(sequence(...), ...)`:
  * the higher-order-function form allocates a lambda frame and an index
  * array per pixel row and is interpreted per element; this node compiles
  * (doGenCode) to one tight primitive loop inside whole-stage codegen —
  * the hot path runs per patch pixel per image, 2·npol·nchan reads each.
  */
case class StridedGather(
    image: Expression, planes: Expression, y: Expression, x: Expression,
    ydim: Expression, xdim: Expression)
  extends Expression {

  override def children: Seq[Expression] =
    Seq(image, planes, y, x, ydim, xdim)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = children.exists(_.nullable)

  override def eval(input: InternalRow): Any = {
    val imgV = image.eval(input)
    val planesV = planes.eval(input)
    val yV = y.eval(input)
    val xV = x.eval(input)
    val ydimV = ydim.eval(input)
    val xdimV = xdim.eval(input)
    if (imgV == null || planesV == null || yV == null || xV == null ||
      ydimV == null || xdimV == null) return null
    val img = imgV.asInstanceOf[ArrayData]
    val p = planesV.asInstanceOf[Int]
    val yy = yV.asInstanceOf[Int]
    val xx = xV.asInstanceOf[Int]
    val yd = ydimV.asInstanceOf[Int]
    val xd = xdimV.asInstanceOf[Int]
    val out = new Array[Double](p)
    var k = 0
    while (k < p) {
      out(k) = img.getFloat((k * yd + yy) * xd + xx).toDouble
      k += 1
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
    val anyNull = Seq(imgGen, planesGen, yGen, xGen, ydGen, xdGen)
      .map(_.isNull).mkString(" || ")
    val javaType = CodeGenerator.javaType(dataType)
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
          double[] $arr = new double[${planesGen.value}];
          for (int $k = 0; $k < ${planesGen.value}; $k++) {
            $arr[$k] = (double) ${imgGen.value}.getFloat(
              ($k * ${ydGen.value} + ${yGen.value}) * ${xdGen.value} + ${xGen.value});
          }
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(image = newChildren(0), planes = newChildren(1), y = newChildren(2),
      x = newChildren(3), ydim = newChildren(4), xdim = newChildren(5))
}

object StridedGather {
  /** Column API: strided_gather(image, planes, y, x, ydim, xdim). */
  def apply(image: Column, planes: Column, y: Column, x: Column,
      ydim: Column, xdim: Column): Column =
    ColumnBridge.column(StridedGather(
      ColumnBridge.expression(image), ColumnBridge.expression(planes),
      ColumnBridge.expression(y), ColumnBridge.expression(x),
      ColumnBridge.expression(ydim), ColumnBridge.expression(xdim)))
}
