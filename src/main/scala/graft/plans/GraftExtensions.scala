package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Floor, Least, Literal, Subtract, Add}

/** SparkSessionExtensions wiring for the engine's custom expressions, so
  * SQL users get them too:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)  // or
  *   .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * ...
  * spark.sql("SELECT strided_gather(image, 16, y, x, 64, 64) FROM cubes")
  * spark.sql("SELECT nearest_pix(33.5)")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("strided_gather"),
      new ExpressionInfo(classOf[StridedGather].getName, "strided_gather"),
      (args: Seq[Expression]) => {
        require(args.length == 6,
          "strided_gather(image, planes, y, x, ydim, xdim)")
        StridedGather(args(0), args(1), args(2), args(3), args(4), args(5))
      }))
    ext.injectFunction((
      new FunctionIdentifier("nearest_pix"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "nearest_pix"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "nearest_pix(p)")
        val p = args.head
        // floor(p + least(p - floor(p), 0.5)) — watch_dog.py:281-286
        Floor(Add(p, Least(Seq(Subtract(p, Floor(p)), Literal(0.5d)))))
      }))
  }
}
