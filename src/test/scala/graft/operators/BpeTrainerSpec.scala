package graft.operators

import graft.SparkSpec
import graft.functions.BpeCodec

class BpeTrainerSpec extends SparkSpec {

  private def docs = graft.Tables.load(spark, sf0001, "documents")

  test("batch = 1 IS sequential BPE: reproduces t18's oracle-checked " +
      "merges exactly") {
    val ours = BpeTrainer.train(docs, 8, batch = 1)
    val t18 = graft.queries.LlmQueries.all("t18_bpe_train")(spark, sf0001)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    assert(ours.map(m => (m.rank, m.lhs, m.rhs, m.nOcc)) === t18.toSeq)
  }

  test("batched training is deterministic, well-formed, and rank-ordered") {
    val a = BpeTrainer.train(docs, 16, batch = 4)
    val b = BpeTrainer.train(docs, 16, batch = 4)
    assert(a === b)
    assert(a.size >= 8, s"corpus exhausted early: ${a.size}")
    assert(a.map(_.rank) === (1 to a.size))
    // well-formed: every operand is a base char or an EARLIER-ranked
    // output (same-round outputs are excluded by the non-interaction
    // filter, so strict order holds)
    val known = scala.collection.mutable.HashSet[String](
      ('a' to 'z').map(_.toString): _*)
    a.foreach { m =>
      assert(known.contains(m.lhs), s"rank ${m.rank}: unknown lhs ${m.lhs}")
      assert(known.contains(m.rhs), s"rank ${m.rank}: unknown rhs ${m.rhs}")
      assert(m.merged === m.lhs + m.rhs)
      known += m.merged
    }
    // non-interaction within a round is observable globally: counts are
    // positive and non-increasing batch over batch is NOT guaranteed,
    // but every count is a real corpus pair count
    assert(a.forall(_.nOcc > 0))
  }

  test("a batch-trained vocabulary feeds the encode loop and compresses") {
    val merges = BpeTrainer.train(docs, 16, batch = 8)
      .map(m => (m.lhs, m.rhs))
    val codec = new BpeCodec(merges)
    val words = graft.ScaleData.Vocab
    assert(words.map(codec.countWord).sum < words.map(_.length.toLong).sum)
  }
}
