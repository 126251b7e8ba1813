package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Behavior specs for the hash-rank quantile sketch (a04), BM25 scoring
  * (t13) and spherical k-means (s08). The oracle gate proves
  * engine-vs-DuckDB equality; these pin the semantics against independent
  * pure-Scala recomputations and pin the plan shapes that matter at scale
  * (top-k never global-sorts; centroid joins never go cartesian).
  */
class SketchRankClusterSpec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("a04 quantiles are exact order statistics of the bottom-k-by-hash " +
      "sample") {
    val rows = graft.Tables.load(spark, sf0001, "lineitem")
      .select(col("l_extendedprice"),
        concat_ws("|", col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey")).as("kstr"))
      .collect().map(r => (r.getDouble(0), r.getString(1)))
    val sample = rows.map { case (v, k) => (polyHash(k), k, v) }
      .sortBy { case (fp, k, v) => (fp, k, v) }.take(128)
    val byValue = sample.map { case (_, k, v) => (v, k) }.sorted
    val n = byValue.length
    val expected = Seq(0.25, 0.5, 0.75, 0.95).map { p =>
      (p, byValue((math.floor(p * (n - 1))).toInt)._1)
    }
    val got = LlmQueries.all("a04_hashrank_quantiles")(spark, sf0001)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    assert(got === expected)
  }

  test("a04 sample selection is merge-invariant: bottom-k of a split " +
      "corpus equals bottom-k of the whole") {
    val rows = graft.Tables.load(spark, sf0001, "lineitem")
      .select(concat_ws("|", col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey")).as("kstr"))
      .collect().map(_.getString(0)).map(k => (polyHash(k), k))
    val whole = rows.sorted.take(128).toSet
    val (a, b) = rows.partition(_._1 % 2 == 0) // arbitrary split
    val merged = (a.sorted.take(128) ++ b.sorted.take(128))
      .sorted.take(128).toSet
    assert(merged === whole)
  }

  test("a04 plans the sample as TakeOrderedAndProject, not a global sort") {
    val plan = LlmQueries.all("a04_hashrank_quantiles")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("t13 matches a pure-Scala BM25 recomputation at sf0.001") {
    val terms = Seq("join", "spark", "vector") // sorted — the fold order
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split("\\s+").toSeq))
    val nDocs = docs.length.toDouble
    val avgdl = docs.map(_._2.size.toDouble).sum / docs.length.toDouble
    val tf = docs.flatMap { case (id, w) =>
      val dl = w.size.toDouble
      terms.flatMap { t =>
        val c = w.count(_ == t)
        if (c > 0) Some((id, dl, t, c.toDouble)) else None
      }
    }
    val df = tf.groupBy(_._3).map { case (t, xs) => (t, xs.length.toDouble) }
    val expected = tf.groupBy(_._1).map { case (id, xs) =>
      val score = xs.sortBy(_._3).foldLeft(0.0) {
        case (acc, (_, dl, t, c)) =>
          val idf = (nDocs - df(t) + 0.5) / (df(t) + 0.5)
          acc + (idf * (c * 2.2)) / (c + 1.2 * (0.25 + 0.75 * dl / avgdl))
      }
      (id, round6(score))
    }.toSeq.sortBy { case (id, sc) => (-sc, id) }.take(10)
      .zipWithIndex.map { case ((id, sc), i) => (i + 1, id, sc) }
    val got = LlmQueries.all("t13_bm25")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expected)
  }

  test("t13 plans the top-k as TakeOrderedAndProject and broadcasts the " +
      "df/stats sides") {
    val plan = LlmQueries.all("t13_bm25")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("s08 matches a pure-Scala spherical k-means replay at sf0.001") {
    val K = 8
    val vecs = graft.Tables.load(spark, sf0001, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(f => math.floor(f.toDouble * 1e6)).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    def nrm(a: Array[Double]): Double = math.sqrt(dot(a, a))
    val cents0 = vecs.filter(_._1 < K).sortBy(_._1)
    def assign(cs: Seq[(Long, Array[Double])]): Map[Long, (Long, Double)] =
      vecs.map { case (id, v) =>
        val best = cs.map { case (cid, cv) =>
          (round6(dot(v, cv) / (nrm(v) * nrm(cv))), cid)
        }.maxBy { case (sim, cid) => (sim, -cid) }
        (id, (best._2, best._1))
      }.toMap
    val a0 = assign(cents0.map { case (id, v) => (id, v) }.toSeq)
    val sums = vecs.groupBy { case (id, _) => a0(id)._1 }
      .map { case (cid, members) =>
        val s = new Array[Double](64)
        members.foreach { case (_, v) =>
          var i = 0; while (i < 64) { s(i) += v(i); i += 1 }
        }
        (cid, s)
      }.toSeq.sortBy(_._1)
    val a1 = assign(sums)
    val expected = vecs.map(_._1).sorted
      .map(id => (id, a1(id)._1, a1(id)._2)).toSeq
    val got = LlmQueries.all("s08_spherical_kmeans")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expected)
  }

  test("s08 refinement moves at least one vector off its init assignment " +
      "(the Lloyd step is not a no-op)") {
    val out = LlmQueries.all("s08_spherical_kmeans")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.map(_._1).distinct.length === out.length) // one row per vec
    assert(out.map(_._2).distinct.length > 1) // clusters not degenerate
  }

  test("s08 centroid joins broadcast — corpus side never shuffles, no " +
      "cartesian product") {
    val plan = LlmQueries.all("s08_spherical_kmeans")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
