package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Whole-patch pixel gather (J3, epic_services/watch_dog.py:442-455): for a
  * patch centered at float pixel (cx, cy) with half-width `half`, returns
  * the full (2·half+1)² grid of per-pixel gathers as
  * `array<struct<dx:int, dy:int, values:array<double>>>` — dx outer loop,
  * dy inner, matching the reference's meshgrid order.
  *
  * Why one expression per PATCH instead of [[StridedGather]] per PIXEL
  * inside a `transform(offsets, …)` lambda: higher-order-function lambdas
  * are interpreted, and every interpreted eval of the lambda body re-reads
  * the `image` child from the input row — for a binary cube that is a full
  * blob copy (`UnsafeRow.getBinary` copies), i.e. ~1.4 MB of memcpy+garbage
  * PER PATCH OFFSET at the reference's 22-channel shape. Measured on the
  * ingest bench this was ~12 GB of allocation per 256-image micro-batch and
  * dominated the batch time (~30 s of a 35 s batch). This node reads the
  * blob reference ONCE per row and loops n²·planes in one tight kernel
  * (`doGenCode` emits a single static call — no per-offset re-extraction,
  * no lambda frames), leaving the gather at its true cost: a few μs/row.
  *
  * Accepts the cube as `array<float>` or as a raw little-endian float32
  * `binary` blob (the 100 TB layout — see [[StridedGather]] scaladoc).
  * Total function: a flat index out of range yields a null `values` for
  * that offset (never throws), because the optimizer may clone the gather
  * into a pre-filter guard and evaluate it before the FOV cuts.
  */
case class PatchGather(
    image: Expression, planes: Expression, cy: Expression, cx: Expression,
    half: Expression, ydim: Expression, xdim: Expression)
  extends Expression {

  override def children: Seq[Expression] =
    Seq(image, planes, cy, cx, half, ydim, xdim)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("dx", IntegerType, nullable = false),
    StructField("dy", IntegerType, nullable = false),
    StructField("values", ArrayType(DoubleType, containsNull = false)))),
    containsNull = false)

  override def nullable: Boolean = true

  // lazy: children are unresolved at construction time (Column API / SQL)
  private lazy val binaryInput: Boolean = image.dataType == BinaryType

  override def eval(input: InternalRow): Any = {
    val imgV = image.eval(input)
    val planesV = planes.eval(input)
    val cyV = cy.eval(input)
    val cxV = cx.eval(input)
    val halfV = half.eval(input)
    val ydimV = ydim.eval(input)
    val xdimV = xdim.eval(input)
    if (imgV == null || planesV == null || cyV == null || cxV == null ||
      halfV == null || ydimV == null || xdimV == null) return null
    if (binaryInput)
      PatchGather.gatherBinary(imgV.asInstanceOf[Array[Byte]],
        planesV.asInstanceOf[Int], cyV.asInstanceOf[Double],
        cxV.asInstanceOf[Double], halfV.asInstanceOf[Int],
        ydimV.asInstanceOf[Int], xdimV.asInstanceOf[Int])
    else
      PatchGather.gatherArray(imgV.asInstanceOf[ArrayData],
        planesV.asInstanceOf[Int], cyV.asInstanceOf[Double],
        cxV.asInstanceOf[Double], halfV.asInstanceOf[Int],
        ydimV.asInstanceOf[Int], xdimV.asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gens = children.map(_.genCode(ctx))
    val anyNull = gens.map(_.isNull).mkString(" || ")
    val javaType = CodeGenerator.javaType(dataType)
    val helper = if (binaryInput) "gatherBinary" else "gatherArray"
    val args = gens.map(_.value).mkString(", ")
    ev.copy(code =
      code"""
        ${gens.map(_.code).mkString("\n")}
        boolean ${ev.isNull} = $anyNull;
        $javaType ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.plans.PatchGather.$helper($args);
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(image = newChildren(0), planes = newChildren(1), cy = newChildren(2),
      cx = newChildren(3), half = newChildren(4), ydim = newChildren(5),
      xdim = newChildren(6))
}

object PatchGather {

  /** Binary-blob kernel — called from generated code, keep signature
    * stable. Flat-index bounds semantics match [[StridedGather]]. */
  def gatherBinary(bytes: Array[Byte], planes: Int, cy: Double, cx: Double,
      half: Int, ydim: Int, xdim: Int): ArrayData = {
    val len = bytes.length >> 2
    val n = 2 * half + 1
    val elems = new Array[Any](n * n)
    var e = 0
    var dx = -half
    while (dx <= half) {
      val xx = (cx + dx).toInt
      var dy = -half
      while (dy <= half) {
        val yy = (cy + dy).toInt
        val vals = new Array[Double](planes)
        var ok = true
        var k = 0
        while (ok && k < planes) {
          val idx = (k * ydim + yy) * xdim + xx
          if (idx < 0 || idx >= len) ok = false
          else { vals(k) = StridedGather.floatAtLE(bytes, idx); k += 1 }
        }
        elems(e) = new GenericInternalRow(Array[Any](dx, dy,
          if (ok) new GenericArrayData(vals) else null))
        e += 1
        dy += 1
      }
      dx += 1
    }
    new GenericArrayData(elems)
  }

  /** array<float> kernel — called from generated code, keep signature
    * stable. */
  def gatherArray(img: ArrayData, planes: Int, cy: Double, cx: Double,
      half: Int, ydim: Int, xdim: Int): ArrayData = {
    val len = img.numElements()
    val n = 2 * half + 1
    val elems = new Array[Any](n * n)
    var e = 0
    var dx = -half
    while (dx <= half) {
      val xx = (cx + dx).toInt
      var dy = -half
      while (dy <= half) {
        val yy = (cy + dy).toInt
        val vals = new Array[Double](planes)
        var ok = true
        var k = 0
        while (ok && k < planes) {
          val idx = (k * ydim + yy) * xdim + xx
          if (idx < 0 || idx >= len) ok = false
          else { vals(k) = img.getFloat(idx).toDouble; k += 1 }
        }
        elems(e) = new GenericInternalRow(Array[Any](dx, dy,
          if (ok) new GenericArrayData(vals) else null))
        e += 1
        dy += 1
      }
      dx += 1
    }
    new GenericArrayData(elems)
  }

  /** Column API: patch_gather(image, planes, cy, cx, half, ydim, xdim). */
  def apply(image: Column, planes: Column, cy: Column, cx: Column,
      half: Column, ydim: Column, xdim: Column): Column =
    ColumnBridge.column(PatchGather(
      ColumnBridge.expression(image), ColumnBridge.expression(planes),
      ColumnBridge.expression(cy), ColumnBridge.expression(cx),
      ColumnBridge.expression(half), ColumnBridge.expression(ydim),
      ColumnBridge.expression(xdim)))
}

/** Named optimizer fence: value- and codegen-transparent, but marked
  * non-deterministic so Catalyst will not substitute the wrapped expression
  * through the projection into derived predicates.
  *
  * Exists for exactly one reason: `InferFiltersFromGenerate` turns an
  * `explode(pixel_data)` into a pushed-down `size(pixel_data) > 0` guard by
  * CLONING the generator child into a Filter — which would evaluate the
  * whole patch gather a second time for every row (and, before the
  * PatchGather consolidation, bloated whole-stage codegen ~10×). The fence
  * makes that substitution illegal while keeping the expression itself
  * deterministic, codegen-fused, and honestly named in `explain()` output
  * (the previous spelling — `when(monotonically_increasing_id() >= 0, …)` —
  * worked but masqueraded as data logic).
  *
  * Trade-off (documented, deliberate): the non-determinism marker also
  * blocks legitimate rewrites through the fenced projection. Use it only
  * immediately above expensive leaf kernels whose recomputation is the
  * thing being prevented.
  */
case class OptimizerFence(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  // the fence: stops rule-based substitution through this node
  override lazy val deterministic: Boolean = false
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object OptimizerFence {
  def apply(c: Column): Column =
    ColumnBridge.column(OptimizerFence(ColumnBridge.expression(c)))
}
