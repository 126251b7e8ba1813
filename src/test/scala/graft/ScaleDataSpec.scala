package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the scale-corpus generator the BASELINE.md scaling claims are
  * measured on: every row is a pure function of (seed, id), so the
  * recorded exponents stay reproducible — an accidental edit to the
  * distributional family must fail HERE, not silently shift the next
  * probe. Constants below were profiled from the driver's sf0.1 corpus
  * (see ScaleData's scaladoc). */
class ScaleDataSpec extends AnyFunSuite {

  test("documents are pure in doc_id: stable fingerprints, profile in " +
      "family bounds") {
    val docs = (0L until 5000L).map(ScaleData.doc)
    // pure function: regenerating any row gives the identical text
    assert(Seq(0L, 17L, 4999L).forall(i =>
      ScaleData.doc(i).text == docs(i.toInt).text))
    // family profile: vocab, lengths, langs, sources
    val words = docs.flatMap(_.text.split(" ")).toSet
    assert(words.subsetOf(ScaleData.Vocab.toSet))
    val lens = docs.map(_.text.split(" ").length)
    assert(lens.min >= 10 && lens.max <= 100)
    val en = docs.count(_.lang == "en").toDouble / docs.size
    assert(en > 0.36 && en < 0.46, s"en share $en drifted")
    assert(docs.map(_.source).distinct.size == 20)
    // planted near-dups: ~5% of docs mutate an earlier one; the exact
    // trickle of identical copies rides the 1/31 same-word redraw
    val texts = docs.map(_.text)
    val exactDups = texts.size - texts.distinct.size
    assert(exactDups >= 4 && exactDups <= 30, s"exact dups $exactDups")
    assert(docs.forall(d => d.n_chars == d.text.length))
  }

  test("embeddings are pure in vec_id: unit norm, weak label clusters") {
    val embs = (0L until 2000L).map(ScaleData.emb)
    assert(Seq(0L, 999L).forall { i =>
      ScaleData.emb(i).embedding.toSeq == embs(i.toInt).embedding.toSeq
    })
    assert(embs.forall(e =>
      math.abs(math.sqrt(
        e.embedding.map(x => x.toDouble * x.toDouble).sum) - 1.0) < 1e-4))
    assert(embs.map(_.label).distinct.sorted == (0 to 9))
  }
}
