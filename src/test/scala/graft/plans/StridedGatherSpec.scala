package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

import graft.SparkSpec

class StridedGatherSpec extends SparkSpec {

  test("gather equals the transform/element_at reference form") {
    import spark.implicits._
    // 3 planes of a 4x5 grid, values = k*100 + y*5 + x
    val img = (for { k <- 0 until 3; y <- 0 until 4; x <- 0 until 5 }
      yield (k * 100 + y * 5 + x).toFloat)
    val df = Seq((img, 2, 3)).toDF("image", "y", "x")
    val custom = df.select(StridedGather(col("image"), lit(3),
      col("y"), col("x"), lit(4), lit(5)).as("v")).as[Seq[Double]].head()
    val hof = df.select(transform(sequence(lit(0), lit(2)),
      k => element_at(col("image"),
        ((k * 4 + col("y")) * 5 + col("x") + 1).cast(IntegerType))
        .cast(DoubleType)).as("v")).as[Seq[Double]].head()
    assert(custom == hof)
    assert(custom == Seq(13.0, 113.0, 213.0))
  }

  test("null inputs propagate to a null result") {
    import spark.implicits._
    val df = Seq((Seq(1f, 2f), Option.empty[Int])).toDF("image", "y")
    val got = df.select(StridedGather(col("image"), lit(1), col("y"),
      lit(0), lit(1), lit(2)).as("v")).collect().head
    assert(got.isNullAt(0))
  }

  test("codegen path survives whole-stage compilation on a larger frame") {
    import spark.implicits._
    val img = (0 until 2 * 3 * 4).map(_.toFloat)
    val rows = (0 until 1000).map(i => (img, i % 3, i % 4))
    val sum = rows.toDF("image", "y", "x")
      .select(StridedGather(col("image"), lit(2), col("y"), col("x"),
        lit(3), lit(4)).as("v"))
      .select(aggregate(col("v"), lit(0.0d), (a, b) => a + b).as("s"))
      .agg(org.apache.spark.sql.functions.sum("s")).as[Double].head()
    assert(sum > 0)
  }

  test("functions resolve in SQL once registered (extensions builders)") {
    // GraftExtensions wires these same builders via injectFunction at
    // session build; a session already exists JVM-wide here, so use the
    // live-registry path (same builder list either way).
    new GraftExtensions().apply(new SparkSessionExtensions) // wiring sanity
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT strided_gather(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)," +
        " CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)), 2, 0, 1, 1, 2)")
      .collect().head.getSeq[Double](0).toSeq
    assert(viaSql == Seq(2.0, 4.0))
    // whole-patch form: 1×1 patch (half=0) at (cy,cx)=(0,1) over the same
    // 2-plane 1×2 cube — one struct, values = the strided gather above
    val patch = spark.sql(
      "SELECT patch_gather(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)," +
        " CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))," +
        " 2, CAST(0 AS DOUBLE), CAST(1 AS DOUBLE), 0, 1, 2)")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(patch.length == 1)
    assert(patch.head.getInt(0) == 0 && patch.head.getInt(1) == 0)
    assert(patch.head.getSeq[Double](2).toSeq == Seq(2.0, 4.0))
    assert(spark.sql("SELECT nearest_pix(CAST(33.5 AS DOUBLE))").collect()
      .head.getAs[Number](0).doubleValue() == 34.0)
    assert(spark.sql("SELECT nearest_pix(CAST(-0.5 AS DOUBLE))").collect()
      .head.getAs[Number](0).doubleValue() == 0.0)
    // text/similarity kernels: same arithmetic as the DataFrame surface
    assert(spark.sql("SELECT fingerprint('ab')").collect().head.getLong(0)
      == (97L * 31 + 98) % 1000000007L)
    assert(spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d))")
      .collect().head.getDouble(0) == 11.0)
    assert(math.abs(spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d))")
      .collect().head.getDouble(0) - 1.0) < 1e-12)
  }
}
