package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {

  test("zValue interleaves bits exactly (a even positions, b odd)") {
    import spark.implicits._
    // a=1010b -> bits 6,2 set = 68; b=0110b -> bits 5,3 set = 40
    val z = Seq((10L, 6L)).toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b"), 4).as("z"))
      .as[Long].head()
    assert(z === 108L)
  }

  test("inputs are masked to the requested width (no cross-bucket collisions)") {
    import spark.implicits._
    val z = Seq((10L + 16L, 6L + 32L)).toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b"), 4).as("z"))
      .as[Long].head()
    assert(z === 108L) // same as (10, 6): high bits dropped, not folded in
  }

  test("z-sort keeps quadrants range-disjoint (the data-skipping property)") {
    import spark.implicits._
    val grid = for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)
    val zs = grid.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b"), 4).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def quadrant(a: Long, b: Long) = (a / 8, b / 8)
    val byQ = zs.groupBy { case (a, b, _) => quadrant(a, b) }
      .map { case (q, pts) => q -> (pts.map(_._3).min, pts.map(_._3).max) }
    // each quadrant occupies one contiguous, non-overlapping z range — a
    // file holding one quadrant has tight min/max bounds on BOTH columns
    val ranges = byQ.values.toSeq.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
  }
}
