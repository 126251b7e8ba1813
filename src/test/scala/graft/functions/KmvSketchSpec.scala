package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KmvSketchSpec extends SparkSpec {

  test("buffer keeps the k smallest distinct values, sorted") {
    val sk = new KmvSketch(4)
    val buf = Seq(9L, 3L, 7L, 3L, 1L, 8L, 2L, 9L)
      .foldLeft(sk.zero)(sk.reduce)
    assert(buf.toSeq === Seq(1L, 2L, 3L, 7L))
  }

  test("k < 2 is rejected at construction, not mid-aggregation") {
    intercept[IllegalArgumentException](new KmvSketch(0))
    intercept[IllegalArgumentException](new KmvSketch(1))
  }

  test("merge equals feeding both streams into one sketch") {
    val sk = new KmvSketch(4)
    val left = Seq(5L, 1L, 9L).foldLeft(sk.zero)(sk.reduce)
    val right = Seq(2L, 5L, 11L, 4L).foldLeft(sk.zero)(sk.reduce)
    val both = Seq(5L, 1L, 9L, 2L, 5L, 11L, 4L).foldLeft(sk.zero)(sk.reduce)
    assert(sk.merge(left, right).toSeq === both.toSeq)
  }

  test("small groups are exact; large groups use the k-th minimum") {
    val sk = new KmvSketch(4)
    val small = Seq(10L, 20L).foldLeft(sk.zero)(sk.reduce)
    assert(sk.finish(small) === 2.0d)
    val big = Seq(1L, 2L, 3L, 4L, 5L).foldLeft(sk.zero)(sk.reduce)
    assert(sk.finish(big) === 3.0d * TextFunctions.Mod / 4L)
  }

  test("sketch merges across streaming micro-batches: final estimate " +
      "equals the batch answer over all data") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val mem = MemoryStream[Long](spark, 1)
    val batch1 = (0L until 500L).map(i => (i * 2654435761L) % TextFunctions.Mod)
    val batch2 = (300L until 900L).map(i => (i * 2654435761L) % TextFunctions.Mod)
    val agg = mem.toDF().toDF("h")
      .agg(KmvSketch.column(col("h"), 64).as("est"))
    val q = agg.writeStream.format("memory").queryName("kmv_stream")
      .outputMode("complete").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
      val streamed = spark.table("kmv_stream").as[Double].head()
      val batch = (batch1 ++ batch2).toDF("h")
        .agg(KmvSketch.column(col("h"), 64)).as[Double].head()
      assert(streamed === batch)
    } finally q.stop()
  }

  test("estimate lands within 3/sqrt(k) of the true distinct count") {
    import spark.implicits._
    val n = 20000
    // deterministic pseudo-uniform hashes with duplicates mixed in
    val hashes = (0 until n).map(i =>
      (1L * i * 2654435761L) % TextFunctions.Mod) ++
      (0 until 1000).map(i => (1L * i * 2654435761L) % TextFunctions.Mod)
    val est = hashes.toDF("h")
      .agg(KmvSketch.column(col("h"), 256)).as[Double].head()
    val truth = hashes.distinct.size.toDouble
    assert(math.abs(est - truth) / truth < 3.0 / math.sqrt(256))
  }
}
