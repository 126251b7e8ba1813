package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.BpeCodec

/** Trainer→codec CLOSURE at a realistic vocabulary size — the r9 item:
  * t18/BpeTrainer prove training and BpeCodec/t19 prove encoding, but
  * nothing yet proved the two compose at vocab scale: a ≥5k-merge table
  * LEARNED by the batched trainer must (a) be well-formed in exactly
  * the sense the codec's loop⇔chain equivalence requires, (b) reproduce
  * deterministically, and (c) feed straight into the codegen encode
  * path at corpus throughput. The 31-word driver corpus can only yield
  * ~100 merges, so the training input is a deterministic synthetic
  * corpus with a rich character distribution (the same approach as
  * BpeCodecSpec's synthetic 40k table — but here the table is TRAINED,
  * not constructed).
  */
/** Deterministic pseudo-random corpus words — standalone object so the
  * dataset closure serializes without dragging the suite along. */
object BpeClosureWords extends Serializable {
  def word(i: Long): String = {
    var z = i * 0x9e3779b97f4a7c15L + 0x100000001b3L
    def next(): Int = {
      z = (z ^ (z >>> 27)) * 0xbf58476d1ce4e5b9L
      ((z >>> 33) % 26).toInt.abs
    }
    val len = 6 + (next() % 9)
    val sb = new StringBuilder
    (0 until len).foreach(_ => sb.append(('a' + next()).toChar))
    sb.toString
  }
}

class BpeClosureSpec extends SparkSpec {

  private def word(i: Long): String = BpeClosureWords.word(i)

  /** Reference chain encoding: apply each rule once in rank order,
    * replacing all left-to-right non-overlapping occurrences — the
    * t11-oracle form the codec's loop is equivalent to on well-formed
    * tables. Works on symbol sequences so multi-char symbols stay
    * atomic. */
  private def chainCount(merges: Seq[(String, String)], w: String): Int = {
    var syms = w.map(_.toString).toVector
    merges.foreach { case (a, b) =>
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms.length
  }

  test("a trained 5k-merge vocabulary is well-formed, reproducible, " +
      "and closes through the codec at corpus throughput") {
    import spark.implicits._
    val nWords = 20000
    val docs = spark.range(nWords).map { i =>
      // repetition count gives the trainer a skewed frequency table
      // without extra rows: wordTable counts per-text occurrences
      val w = BpeClosureWords.word(i)
      Seq.fill(1 + (i % 13).toInt)(w).mkString(" ")
    }.toDF("text")

    val nMerges = 5000
    val merges = BpeTrainer.train(docs, nMerges, batch = 256)
    assert(merges.size === nMerges,
      s"corpus too poor to learn $nMerges merges (got ${merges.size})")

    // (a) WELL-FORMED in the codec's sense: ranks are 1..n in order,
    // every output is lhs+rhs, and every operand is a base char or the
    // output of an EARLIER rule — the precondition under which the
    // codec's lowest-rank-first loop equals the rank-order chain
    assert(merges.map(_.rank) === (1 to nMerges))
    val seen = scala.collection.mutable.HashSet[String]()
    merges.foreach { m =>
      assert(m.merged === m.lhs + m.rhs)
      for (op <- Seq(m.lhs, m.rhs))
        assert(op.length == 1 || seen.contains(op),
          s"rank ${m.rank}: operand '$op' is neither a base char nor " +
            "an earlier output — table not well-formed")
      seen += m.merged
    }
    // counts never increase with rank among equal-count runs is NOT
    // guaranteed across batches; what IS guaranteed: within one batch
    // the accepted counts are non-increasing. Spot-check global sanity:
    // the first merge has the highest count of all
    assert(merges.head.nOcc === merges.map(_.nOcc).max)

    // (b) REPRODUCIBLE: training is a pure function of the corpus
    val again = BpeTrainer.train(docs, 200, batch = 256)
    assert(again === merges.take(200))

    // (c) CLOSURE: the learned table drives the codec, and the codec's
    // lowest-rank-first loop matches the rank-order chain replay on
    // trained words, unseen words, and adversarial compositions
    val codec = new BpeCodec(merges.map(m => (m.lhs, m.rhs)))
    val table = merges.map(m => (m.lhs, m.rhs))
    (0 until 300).foreach { k =>
      val w = word(k * 67L % nWords)
      assert(codec.countWord(w) === chainCount(table, w), s"word $w")
    }
    Seq("", "zzzzzzzzzz", word(1) + word(2), "a" * 40).foreach { w =>
      assert(codec.countWord(w) === chainCount(table, w), s"word '$w'")
    }

    // throughput: the learned table rides the codegen BpeCount path
    // over the sf0.01 corpus (the t19 shape with a TRAINED vocabulary)
    val corpus = graft.Tables.load(spark, "/root/testdata/sf0.01",
      "documents")
    val t0 = System.nanoTime()
    val total = corpus
      .select(graft.plans.BpeCount(col("text"), codec).as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(total > 0)
    info(f"trained-table BpeCount: $total tokens in $secs%.2f s " +
      f"(${total / secs}%.0f tokens/s)")
    // generous floor — the assertion pins "codegen path, not a
    // per-row interpreter", not a host-dependent number
    assert(total / secs > 10000, f"throughput collapsed: $secs%.2f s")
  }
}
