package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SequencePackerSpec extends SparkSpec {

  test("two-level prefix sum matches the naive global window exactly") {
    import spark.implicits._
    // keys deliberately sparse + unordered input; weights include zeros
    val rows = Seq((7L, 10L), (0L, 3L), (129L, 0L), (64L, 5L), (65L, 2048L),
      (200L, 1L), (63L, 7L), (128L, 11L))
    val df = rows.toDF("k", "w")
    val got = SequencePacker
      .withPrefixSum(df, "k", "w", "p", blockSize = 64L)
      .select("k", "p").as[(Long, Long)].collect().toMap
    val want = df
      .withColumn("p", coalesce(sum(col("w")).over(
        Window.orderBy(col("k"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("k", "p").as[(Long, Long)].collect().toMap
    assert(got === want)
    assert(got(0L) === 0L && got(7L) === 3L && got(63L) === 13L &&
      got(64L) === 20L)
  }

  test("pack assigns sequence ids and offsets by running token total") {
    import spark.implicits._
    val df = Seq((0L, 1000L), (1L, 1000L), (2L, 100L), (3L, 2048L))
      .toDF("doc_id", "n_tokens")
    val out = SequencePacker.pack(df, "doc_id", "n_tokens", seqLen = 2048L)
      .select("doc_id", "seq_id", "seq_off").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    // doc0 starts at 0 → seq 0 off 0; doc1 at 1000 → seq 0 off 1000;
    // doc2 at 2000 → seq 0 off 2000; doc3 at 2100 → seq 1 off 52
    assert(out === Array((0L, 0L, 0L), (1L, 0L, 1000L), (2L, 0L, 2000L),
      (3L, 1L, 52L)))
  }

  test("packing from exact BPE token counts (the t11 tokenizer) keeps " +
      "every invariant: offsets in-bounds, docs contiguous, totals exact") {
    import spark.implicits._
    import graft.functions.TextFunctions.bpeTokenCount
    val seqLen = 64L
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .limit(200)
      .select(col("doc_id"), bpeTokenCount(col("text")).as("n_tokens"))
    val out = SequencePacker.pack(docs, "doc_id", "n_tokens",
        seqLen = seqLen, blockSize = 16L)
      .select("doc_id", "n_tokens", "seq_id", "seq_off")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.length === 200)
    // exact replay: running total in doc_id order IS the packing
    var run = 0L
    out.foreach { case (id, n, seqId, seqOff) =>
      assert(n > 0, s"doc $id: BPE count must be positive")
      assert(seqId === run / seqLen && seqOff === run % seqLen,
        s"doc $id: got (seq $seqId, off $seqOff), want position $run")
      run += n
    }
  }

  test("no stage funnels the corpus through a single partition") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i, i % 7)).toDF("k", "w")
    val plan = SequencePacker
      .withPrefixSum(df, "k", "w", "p", blockSize = 64L)
      .queryExecution.executedPlan.toString
    val winLines = plan.linesIterator.filter(_.contains("Window")).toSeq
    // exactly the two windows of the two-level scan…
    assert(winLines.count(_.contains("windowspecdefinition")) === 2)
    // …the GLOBAL (unpartitioned) one runs over the per-block SUMS — a
    // rows/blockSize-sized frame — never over the raw rows…
    assert(winLines.exists(_.contains("sum(graft_bsum")))
    // …and the window that does see raw rows is partitioned by block
    // (its spec lists the partition columns before the sort spec)
    val rawWin = winLines.filter(_.contains("sum(w#"))
    assert(rawWin.nonEmpty && rawWin.forall(_.contains("], [graft_blk")))
  }
}
