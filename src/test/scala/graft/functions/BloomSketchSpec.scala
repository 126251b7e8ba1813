package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.LlmQueries

/** Behavior specs for the Bloom membership sketch (a05): merge
  * invariance (the property that makes the distributed partial-aggregate
  * build correct), the no-false-negative guarantee, and the query-level
  * estimate-vs-exact contract. The oracle gate proves the bitmap itself
  * is bit-identical to DuckDB's bit_or replay. */
class BloomSketchSpec extends SparkSpec {

  private val M = 1 << 12

  test("partial bitmaps OR-merge to the single-pass build") {
    val sk = new BloomSketch(M)
    val fps = (0L until 500L).map(i => (i * 7919L + 13L) % 1000000007L)
    val whole = fps.foldLeft(sk.zero)(sk.reduce)
    val (a, b) = fps.splitAt(137)
    val merged = sk.merge(
      a.foldLeft(sk.zero)(sk.reduce), b.foldLeft(sk.zero)(sk.reduce))
    assert(java.util.Arrays.equals(whole, merged))
  }

  test("no false negatives; FP rate stays near design") {
    val sk = new BloomSketch(M)
    val inserted = (0L until 300L).map(i => (i * 104729L + 7L) % 1000000007L)
    val words = inserted.foldLeft(sk.zero)(sk.reduce)
    assert(inserted.forall(BloomSketch.probe(words, M, _)))
    val absent = (0L until 2000L).map(i => (i * 15485863L + 3L) % 1000000007L)
      .filterNot(inserted.contains)
    val fp = absent.count(BloomSketch.probe(words, M, _)).toDouble / absent.size
    // fill = 1-exp(-3*300/4096) ≈ 0.197 → design FP ≈ 0.8%; allow slack
    assert(fp < 0.05, s"false-positive rate $fp")
  }

  test("probe positions never exceed the bitmap") {
    val probes = Seq(0L, 1L, 31L, 32L, 63L, 1000000006L, 4194303L, 4194304L)
    probes.foreach { f =>
      val ps = BloomSketch.positions(M, f)
      assert(ps.forall(p => p >= 0 && p < M), s"f=$f -> ${ps.toSeq}")
    }
  }

  test("a05 bloom counts dominate d07 exact counts at sf0.001") {
    val exact = LlmQueries.all("d07_decontaminate")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = LlmQueries.all("a05_bloom_decontaminate")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every exactly-contaminated doc is flagged with its full exact count
    // (no false negatives), and per doc bloom >= exact
    val gotExact = got.map(r => r._1 -> r._3).toMap
    exact.foreach { case (doc, n) =>
      assert(gotExact.get(doc).contains(n), s"doc $doc exact $n vs $gotExact")
    }
    got.foreach { case (doc, nb, ne, nfp) =>
      assert(nb >= ne && nfp == nb - ne, s"doc $doc: $nb/$ne/$nfp")
      assert(nb > 0L)
    }
    // docs with zero exact contamination appear only via false positives
    assert(got.map(_._1).toSet.intersect(exact.keySet) === exact.keySet)
  }

  test("a05 probes map-side: only the exact-readout join is in the plan") {
    val plan = LlmQueries.all("a05_bloom_decontaminate")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the membership test itself is the codegen'd expression, not a join
    assert(plan.toLowerCase.contains("bloomprobe"), plan)
  }
}
