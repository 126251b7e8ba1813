package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayDistinct, Cast, Divide, Expression, ExpressionInfo, Floor, Least, Literal, Multiply, RegExpReplace, Round, Size, Sqrt, StringSplit, StringTrim, Subtract}
import org.apache.spark.sql.types.DoubleType

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
  * spark.sql("SELECT fingerprint(text), cosine_sim(a.v, b.v) ...")
  * }}}
  *
  * For a session that already exists (extensions only apply at build
  * time), `GraftExtensions.register(spark)` adds the same functions to
  * its live registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
}

object GraftExtensions {

  /** Every SQL function the engine contributes — the same codegen
    * expressions the DataFrame surface uses, so SQL results replay in the
    * DuckDB oracle bit-for-bit. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "strided_gather" -> ((args: Seq[Expression]) => {
      require(args.length == 6,
        "strided_gather(image, planes, y, x, ydim, xdim)")
      StridedGather(args(0), args(1), args(2), args(3), args(4), args(5))
    }),
    "patch_gather" -> ((args: Seq[Expression]) => {
      require(args.length == 7,
        "patch_gather(image, planes, cy, cx, half, ydim, xdim)")
      PatchGather(args(0), args(1), args(2), args(3), args(4), args(5),
        args(6))
    }),
    "nearest_pix" -> ((args: Seq[Expression]) => {
      require(args.length == 1, "nearest_pix(p)")
      val p = args.head
      // floor(p + least(p - floor(p), 0.5)) — watch_dog.py:281-286
      Floor(Add(p, Least(Seq(Subtract(p, Floor(p)), Literal(0.5d)))))
    }),
    "fingerprint" -> ((args: Seq[Expression]) => {
      require(args.length == 1, "fingerprint(text)")
      PolyHash(args.head)
    }),
    "dot_product" -> ((args: Seq[Expression]) => {
      require(args.length == 2, "dot_product(a, b)")
      DotProduct(args(0), args(1))
    }),
    "cosine_sim" -> ((args: Seq[Expression]) => {
      require(args.length == 2, "cosine_sim(a, b)")
      val (a, b) = (args(0), args(1))
      Divide(DotProduct(a, b),
        Multiply(Sqrt(DotProduct(a, a)), Sqrt(DotProduct(b, b))))
    }),
    "redact_pii" -> ((args: Seq[Expression]) => {
      require(args.length == 1, "redact_pii(text)")
      // t07's fixed pattern order: e-mail → '+'-anchored phone → IPv4
      val email = RegExpReplace(args.head,
        Literal("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"),
        Literal("[EMAIL]"))
      val phone = RegExpReplace(email,
        Literal("\\+[0-9][0-9().-]{6,}[0-9]"), Literal("[PHONE]"))
      RegExpReplace(phone,
        Literal("\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"), Literal("[IP]"))
    }),
    "token_count" -> ((args: Seq[Expression]) => {
      require(args.length == 1, "token_count(text)")
      Size(new StringSplit(StringTrim(args.head), Literal("\\s+")))
    }),
    "quality_score" -> ((args: Seq[Expression]) => {
      require(args.length == 1, "quality_score(text)")
      // t02's formula: distinct-token ratio × length saturation, 4 dp
      val w = new StringSplit(StringTrim(args.head), Literal("\\s+"))
      def d(e: Expression) = Cast(e, DoubleType)
      Round(Multiply(
        Divide(d(Size(ArrayDistinct(w))), d(Size(w))),
        Least(Seq(Divide(d(Size(w)), Literal(100.0d)), Literal(1.0d)))),
        Literal(4))
    }))

  /** Register into a live session's function registry (the extensions
    * mechanism only applies while the session is being built). */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder)
    }
    // typed Aggregators go through the UDF registry, not the expression
    // registry — registered here so SQL users get the mergeable sketches
    spark.udf.register("kmv_distinct",
      org.apache.spark.sql.functions.udaf(new graft.functions.KmvSketch(64)))
    spark.udf.register("array_element_sum",
      org.apache.spark.sql.functions.udaf(graft.functions.ArrayElementSum))
  }
}
