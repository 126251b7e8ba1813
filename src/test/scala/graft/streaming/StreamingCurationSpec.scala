package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

case class TimedDoc(doc_id: Long, ts: Timestamp, text: String)

class StreamingCurationSpec extends SparkSpec {

  private def t(s: Long) = new Timestamp(1700000000000L + s * 1000)

  test("stateless stages redact, score, and filter like the batch pipeline") {
    import spark.implicits._
    val docs = Seq(
      // english, high quality, PII inside → kept, redacted
      TimedDoc(1, t(0), "the archive holds a ledger mail bob@x.example.org " +
        "and more plain words follow here to lift quality"),
      // german-voted → dropped
      TimedDoc(2, t(1), "der kaiser und der berg und der fluss"),
      // english but one-word spam → distinct-token ratio drops it
      TimedDoc(3, t(2), "the the the the the the the the")).toDF()
    // minQuality 0.1: the kept doc has 17 tokens, and quality saturates
    // on length (17/100) — the default 0.3 floor is calibrated for the
    // corpus's 300-char documents, not this fixture
    val out = StreamingCuration.scored(docs, minQuality = 0.1).collect()
    assert(out.map(_.getLong(0)).toSet === Set(1L))
    val text = out.head.getString(2)
    assert(text.contains("[EMAIL]") && !text.contains("bob@"))
  }

  test("streaming curate == batch curate on the same corpus (parity)") {
    import spark.implicits._
    // real corpus slice with synthetic event times; duplicate texts exist
    // at sf0.001 (d01 finds them), so the dedup stage does real work
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .map { case (id, tx) => TimedDoc(id, t(id), tx) }.toSeq
    val mem = MemoryStream[TimedDoc](spark, 1)
    val q = StreamingCuration.curate(mem.toDF())
      .writeStream.format("memory").queryName("curated_out")
      .outputMode("append").start()
    try {
      mem.addData(docs)
      q.processAllAvailable()
      val streamed = spark.table("curated_out")
      val batch = StreamingCuration.scored(
          spark.read.parquet(s"$sf0001/documents.parquet")
            .withColumn("ts", lit(t(0))))
        .withColumn("fp", graft.functions.TextFunctions.fingerprint(col("text")))
        .dropDuplicates("fp")
      // exact-unique survivor SETS agree (which doc_id survives a dup
      // group is arrival-order-dependent in a stream — compare texts)
      val a = streamed.select("text").as[String].collect().toSet
      val b = batch.select("text").as[String].collect().toSet
      assert(a === b && a.nonEmpty)
      // and the quality/token columns carried through
      assert(streamed.where(col("quality") < 0.3).isEmpty)
    } finally q.stop()
  }

  test("curateNearDup flags near-dups AND exact dups (est 1.0) post-filter") {
    import spark.implicits._
    val base = "the archive ledger holds a long plain english record of " +
      "daily trades and the clerks sign each page before closing time"
    val near = base.replace("closing", "opening") // one token differs
    val mem = MemoryStream[TimedDoc](spark, 1)
    val q = StreamingCuration.curateNearDup(mem.toDF(), minQuality = 0.1)
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    try {
      mem.addData(
        TimedDoc(1, t(0), base),
        TimedDoc(2, t(1), base), // exact dup of 1
        TimedDoc(3, t(2), near), // near dup of 1
        TimedDoc(4, t(3), "the a completely unrelated document about rivers " +
          "and mountains with plenty of distinct vocabulary to stand alone"),
        TimedDoc(5, t(4), "der kaiser und der berg und der fluss")) // filtered
      q.processAllAvailable()
      val flagged = spark.table("neardup_out")
        .where(!col("overflow"))
        .select(col("a"), col("b"), col("est"))
        .as[(Long, Long, Double)].collect()
      // the exact dup collides at est = 1.0 in every band
      assert(flagged.exists { case (a, b, e) => a == 1 && b == 2 && e == 1.0 })
      // the near dup collides in at least one band above threshold
      assert(flagged.exists { case (a, b, _) => a == 1 && b == 3 })
      // the unrelated survivor and the filtered-out german doc never pair
      assert(!flagged.exists { case (a, b, _) => a == 4 || b == 4 || b == 5 })
    } finally q.stop()
  }

  test("streaming decontaminate == batch d07 on the same corpus (parity)") {
    import spark.implicits._
    // the batch split: docs with doc_id % 10 == 7 are the eval set, the
    // rest is the training stream — identical to LlmQueries.d07
    val k = 8
    val all = spark.read.parquet(s"$sf0001/documents.parquet")
    def shingleFps(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("w"))
      .where(size(col("w")) >= k)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("w")) - (k - 1)),
          i => concat_ws(" ",
            (0 until k).map(j => element_at(col("w"), i + j)): _*))).as("s"))
      .select(col("doc_id"),
        graft.functions.TextFunctions.fingerprint(col("s")).as("f"))
      .dropDuplicates("doc_id", "f")
    val evalFps = shingleFps(all.where(col("doc_id") % 10 === 7))
      .select(col("f")).distinct()
    val trainDocs = all.where(col("doc_id") % 10 =!= 7)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .map { case (id, tx) => TimedDoc(id, t(0), tx) }
    val mem = MemoryStream[TimedDoc](spark, 1)
    val q = StreamingCuration.decontaminate(mem.toDF(), evalFps,
        watermark = "10 seconds", windowDur = "10 seconds")
      .writeStream.format("memory").queryName("decon_out")
      .outputMode("append").start()
    try {
      mem.addData(trainDocs.toSeq)
      q.processAllAvailable()
      // advance the watermark far past the window so the counts emit
      mem.addData(TimedDoc(-1L, t(100000),
        "a a a a a a a a watermark advancer"))
      q.processAllAvailable()
      val streamed = spark.table("decon_out")
        .select("doc_id", "n_contaminated_shingles")
        .as[(Long, Long)].collect().toMap
      val batch = graft.queries.LlmQueries.all("d07_decontaminate")(
          spark, sf0001)
        .as[(Long, Long)].collect().toMap
      assert(batch.nonEmpty, "batch d07 found nothing at sf0.001 — " +
        "parity test is vacuous")
      assert(streamed === batch)
    } finally q.stop()
  }

  test("exact-dedup state evicts by watermark, not forever") {
    import spark.implicits._
    val mem = MemoryStream[TimedDoc](spark, 1)
    val q = StreamingCuration
      .curate(mem.toDF(), watermark = "10 seconds", minQuality = 0.0)
      .writeStream.format("memory").queryName("curated_wm")
      .outputMode("append").start()
    try {
      val txt = "the a plain english document body with words enough"
      mem.addData(TimedDoc(1, t(0), txt))
      q.processAllAvailable()
      // far past the watermark horizon: the fingerprint state for doc 1
      // has been evicted, so the SAME text is admitted again — bounded
      // state is the designed trade (exactly the reference point of
      // dropDuplicatesWithinWatermark)
      mem.addData(TimedDoc(2, t(1000), txt))
      q.processAllAvailable()
      mem.addData(TimedDoc(3, t(2000), txt))
      q.processAllAvailable()
      val n = spark.table("curated_wm").count()
      assert(n >= 2, s"expected re-admission after eviction, got $n rows")
    } finally q.stop()
  }
}
