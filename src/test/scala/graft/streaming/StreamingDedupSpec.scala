package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

case class Doc(doc_id: Long, text: String)

class StreamingDedupSpec extends SparkSpec {

  private val base = "the quick brown fox jumps over the lazy dog " +
    "while seven wizards brew strong potions at midnight"
  private val unrelated = "completely different subject matter entirely " +
    "numerical linear algebra on distributed sparse matrices"

  test("withBands: identical docs share all 4 band keys; unrelated none") {
    import spark.implicits._
    val df = Seq(Doc(1, base), Doc(2, base), Doc(3, unrelated)).toDF()
    val bands = StreamingDedup.withBands(df)
      .select(col("doc_id"), col("band")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    assert(bands(1) == bands(2))
    assert(bands(1).size == 4)
    assert(bands(1).intersect(bands(3)).isEmpty)
  }

  test("near-dup arriving in a LATER batch pairs with the seen document") {
    import spark.implicits._
    val mem = MemoryStream[Doc](spark, 1)
    val q = StreamingDedup.candidates(mem.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData(Doc(1, base), Doc(3, unrelated))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 0) // nothing seen yet
      // state carries: doc 2 arrives a batch later and must hit doc 1
      mem.addData(Doc(2, base))
      q.processAllAvailable()
      val rows = spark.table("dedup_out")
        .select("a", "b", "est", "overflow").distinct().collect()
      assert(rows.nonEmpty)
      assert(rows.forall(r => !r.getBoolean(3)))
      // identical text → identical signature → est 1.0, pair (1, 2);
      // the unrelated doc never pairs
      assert(rows.forall(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
      assert(rows.forall(_.getDouble(2) == 1.0))
    } finally q.stop()
  }

  test("bucket cap emits an overflow marker instead of unbounded state") {
    import spark.implicits._
    val mem = MemoryStream[StreamingDedup.SigDoc](spark, 1)
    val q = StreamingDedup.detect(mem.toDS(), estThreshold = 0.5,
        maxPerBucket = 2)
      .writeStream.format("memory").queryName("dedup_ovf")
      .outputMode("append").start()
    try {
      val sig = (1 to 16).map(_.toLong)
      mem.addData(
        StreamingDedup.SigDoc("b0", 1, sig),
        StreamingDedup.SigDoc("b0", 2, sig),
        StreamingDedup.SigDoc("b0", 3, sig))
      q.processAllAvailable()
      val out = spark.table("dedup_ovf").collect()
      // docs 1+2 pair normally; doc 3 hits the cap and is marked, with the
      // bucket fill recorded instead of a similarity
      val pairs = out.filter(!_.getAs[Boolean]("overflow"))
      val ovf = out.filter(_.getAs[Boolean]("overflow"))
      assert(pairs.map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
        .toSeq == Seq((1L, 2L)))
      assert(ovf.map(_.getAs[Long]("b")).toSeq == Seq(3L))
      assert(ovf.head.getAs[Double]("est") == 2.0)
    } finally q.stop()
  }
}
