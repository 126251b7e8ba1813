package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ArrayElementSumSpec extends SparkSpec {

  test("ragged arrays zero-pad like the reference's array_add") {
    import spark.implicits._
    // functions.sql:14-17 — shorter array padded with 0, nulls coalesce to 0
    val df = Seq(
      (1, Seq(1.0, 2.0, 3.0)),
      (1, Seq(10.0)),
      (1, Seq(-1.0, 5.0))).toDF("g", "arr")
    val got = df.groupBy("g").agg(ArrayElementSum.column(col("arr")).as("s"))
      .select("s").as[Seq[Double]].collect().head
    assert(got == Seq(10.0, 7.0, 3.0))
  }

  test("merge across partitions is order-insensitive (partial agg safe)") {
    import spark.implicits._
    val rows = (1 to 100).map(i => (i % 3, Seq.tabulate(i % 5 + 1)(_.toDouble + i)))
    val one = rows.toDF("g", "arr").coalesce(1)
      .groupBy("g").agg(ArrayElementSum.column(col("arr")).as("s"))
      .orderBy("g").select("s").as[Seq[Double]].collect().toSeq
    val many = rows.toDF("g", "arr").repartition(7)
      .groupBy("g").agg(ArrayElementSum.column(col("arr")).as("s"))
      .orderBy("g").select("s").as[Seq[Double]].collect().toSeq
    assert(one == many)
  }

  test("empty group contributes an empty array") {
    import spark.implicits._
    val got = Seq((1, Seq.empty[Double])).toDF("g", "arr")
      .groupBy("g").agg(ArrayElementSum.column(col("arr")).as("s"))
      .select("s").as[Seq[Double]].collect().head
    assert(got == Seq.empty[Double])
  }
}
