package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Behavior specs for k-NN label propagation (s09) and the cross-source
  * shingle-overlap matrix (d13). The oracle gate proves engine-vs-DuckDB
  * equality; these pin the semantics against independent pure-Scala
  * recomputations and the plan shapes (holdout side broadcast; overlap
  * join keyed on fingerprint, no cartesian). */
class KnnSourceOverlapSpec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("s09 matches a pure-Scala knn-vote replay at sf0.001") {
    val vecs = graft.Tables.load(spark, sf0001, "embeddings")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    def nrm(a: Array[Double]): Double = math.sqrt(dot(a, a))
    val hold = vecs.filter(_._1 % 5 == 0)
    val lab = vecs.filter(_._1 % 5 != 0)
    val expected = hold.sortBy(_._1).map { case (q, tl, qv) =>
      val knn = lab.map { case (nb, l, v) =>
        (round6(dot(qv, v) / (nrm(qv) * nrm(v))), nb, l)
      }.sortBy { case (sim, nb, _) => (-sim, nb) }.take(10)
      val (bestLabel, votes) = knn.groupBy(_._3)
        .map { case (l, xs) => (l, xs.length.toLong) }
        .toSeq.sortBy { case (l, n) => (-n, l) }.head
      (q, bestLabel, votes, if (bestLabel == tl) 1 else 0)
    }.toSeq
    val got = LlmQueries.all("s09_knn_label")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
      .toSeq
    assert(got === expected)
    // the accuracy READOUT is the query's point: on this synthetic corpus
    // labels are independent of embedding geometry, so accuracy sits at
    // the 1/K≈0.1 chance line — assert it is measured and plausible as a
    // chance-level reading, not degenerate (all-correct / all-wrong would
    // both indicate a broken vote)
    val acc = got.count(_._4 == 1).toDouble / got.length
    assert(acc > 0.0 && acc < 0.5, s"knn accuracy $acc")
    // every holdout vector got exactly one prediction
    assert(got.map(_._1).toSet ===
      vecs.map(_._1).filter(_ % 5 == 0).toSet)
  }

  test("s09 broadcasts the holdout side — no cartesian product") {
    val plan = LlmQueries.all("s09_knn_label")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("d13 matches a pure-Scala set-overlap recomputation at sf0.001") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // (the SparkSpec polyHash folds UTF-8 bytes; the removed local copy
    // folded chars — identical on this ASCII-pinned corpus)
    val bySource = docs.groupBy(_._2).map { case (src, ds) =>
      val fps = ds.flatMap { case (_, _, t) =>
        val w = t.trim.split("\\s+").toSeq
        if (w.size >= 3) w.sliding(3).map(s => polyHash(s.mkString(" ")))
        else Iterator.empty
      }.toSet
      (src, fps)
    }
    val srcs = bySource.keys.toSeq.sorted
    val expected = (for {
      a <- srcs; b <- srcs if a < b
      common = (bySource(a) & bySource(b)).size if common > 0
    } yield {
      val union = bySource(a).size + bySource(b).size - common
      (a, b, common.toLong, round6(common.toDouble / union.toDouble))
    }).sortBy { case (a, b, _, _) => (a, b) }
    val got = LlmQueries.all("d13_source_overlap")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got === expected)
  }

  test("d13 intersection joins on the fingerprint key — no cartesian") {
    val plan = LlmQueries.all("d13_source_overlap")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
