package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.BpeCount

class BpeCodecSpec extends SparkSpec {

  /** Independent reference encoder: the bracketed rank-order replace
    * chain as plain string manipulation — structurally the algorithm the
    * t11 DuckDB oracle replays, sharing no code with BpeCodec's
    * lowest-rank-first encode loop. */
  private def chainCount(word: String,
      merges: Seq[(String, String)]): Long = {
    if (word.isEmpty) return 0L
    var s = word.codePoints().toArray
      .map(cp => "[" + new String(Character.toChars(cp)) + "]").mkString
    merges.foreach { case (a, b) =>
      s = s.replace(s"[$a][$b]", s"[$a$b]")
    }
    s.count(_ == '[').toLong
  }

  private def chainDocCount(text: String,
      merges: Seq[(String, String)]): Long =
    text.trim.split("\\s+").map(chainCount(_, merges)).sum

  test("encode loop == replace chain == HOF Column form on the t11 " +
      "fixture over the corpus") {
    val codec = new BpeCodec(TextFunctions.BpeMerges)
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val rows = docs.select(col("doc_id"), col("text"),
        BpeCount(col("text"), codec).as("expr_n"),
        TextFunctions.bpeTokenCount(col("text")).as("hof_n"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val text = r.getString(1)
      assert(r.getLong(2) === r.getLong(3),
        s"expr vs HOF for doc ${r.getLong(0)}")
      assert(r.getLong(2) ===
        chainDocCount(text, TextFunctions.BpeMerges),
        s"expr vs plain chain for doc ${r.getLong(0)}")
    }
  }

  test("synthetic 40k vocabulary is well-formed with unique outputs") {
    val merges = BpeVocab.synthetic(40000)
    assert(merges.length === 40000)
    val known = scala.collection.mutable.HashSet[String](
      ('a' to 'z').map(_.toString): _*)
    merges.foreach { case (a, b) =>
      assert(known.contains(a), s"left '$a' not yet produced")
      assert(known.contains(b), s"right '$b' not yet produced")
      assert(known.add(a + b), s"duplicate output '${a + b}'")
    }
  }

  test("encode loop matches the independent chain encoder on the 40k " +
      "table (corpus words, random words, unknown chars)") {
    val merges = BpeVocab.synthetic(40000)
    val codec = new BpeCodec(merges)
    val corpusWords = graft.ScaleData.Vocab.toSeq
    val r = new java.util.Random(7)
    val randomWords = (1 to 60).map(_ =>
      (1 to (1 + r.nextInt(18))).map(_ => ('a' + r.nextInt(26)).toChar)
        .mkString)
    val oddWords = Seq("héllo", "a1b2", "ZZtop", "", "ab-cd", "ééé")
    (corpusWords ++ randomWords ++ oddWords).foreach { w =>
      assert(codec.countWord(w) === chainCount(w, merges),
        s"divergence on '$w'")
    }
  }

  test("counts shrink as the vocabulary grows (compression direction) " +
      "and never fall below 1 per nonempty word") {
    val small = new BpeCodec(BpeVocab.synthetic(500))
    val big = new BpeCodec(BpeVocab.synthetic(40000))
    val r = new java.util.Random(11)
    (1 to 40).foreach { _ =>
      val w = (1 to (3 + r.nextInt(12)))
        .map(_ => ('a' + r.nextInt(26)).toChar).mkString
      val (ns, nb) = (small.countWord(w), big.countWord(w))
      assert(nb <= ns, s"bigger vocab grew count on '$w'")
      assert(nb >= 1L)
    }
  }

  test("merges.txt round-trip preserves the table") {
    val merges = BpeVocab.synthetic(1000)
    val p = java.nio.file.Files.createTempFile("merges", ".txt").toString
    BpeVocab.save(merges, p)
    assert(BpeVocab.load(p) === merges)
  }

  test("a t18-TRAINED vocabulary feeds straight back into tokenizing " +
      "(train → merges.txt → encode loop)") {
    val trained = graft.queries.LlmQueries
      .all("t18_bpe_train")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(trained.nonEmpty)
    val p = java.nio.file.Files.createTempFile("trained", ".txt").toString
    BpeVocab.save(trained, p)
    val codec = new BpeCodec(BpeVocab.load(p))
    // the trained merges compress real corpus words (fewer tokens than
    // chars) and agree with the independent chain encoder
    graft.ScaleData.Vocab.foreach { w =>
      val n = codec.countWord(w)
      assert(n === chainCount(w, trained), s"divergence on '$w'")
      assert(n >= 1 && n <= w.length)
    }
    assert(graft.ScaleData.Vocab.map(codec.countWord).sum <
      graft.ScaleData.Vocab.map(_.length.toLong).sum)
  }
}
