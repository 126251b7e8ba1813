package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.LlmQueries

/** Behavior specs for the per-group bottom-k-by-hash sample and the t14
  * quality-tier census built on it. The oracle gate proves t14's
  * engine-vs-DuckDB equality; these pin merge invariance (the property
  * that makes the distributed build partition-independent) and the
  * windowless plan shape. */
class BottomKByHashSpec extends SparkSpec {

  test("partial buffers merge to the single-pass sample") {
    val sk = new BottomKByHash(7)
    val pairs = (0L until 200L).map(i =>
      ((i * 7919L + 3L) % 997L, (i * 104729L) % 50L))
    val whole = pairs.foldLeft(sk.zero)(sk.reduce)
    // any split point yields the same kept multiset
    Seq(1, 50, 137, 199).foreach { cut =>
      val (a, b) = pairs.splitAt(cut)
      val merged = sk.merge(
        a.foldLeft(sk.zero)(sk.reduce), b.foldLeft(sk.zero)(sk.reduce))
      assert(java.util.Arrays.equals(whole, merged), s"cut=$cut")
    }
    // and arrival order never matters
    val shuffled = scala.util.Random.shuffle(pairs).foldLeft(sk.zero)(sk.reduce)
    assert(java.util.Arrays.equals(whole, shuffled))
  }

  test("kept pairs are the k lowest by (hash, value), duplicates kept") {
    val sk = new BottomKByHash(3)
    val got = Seq((5L, 1L), (1L, 9L), (1L, 9L), (1L, 2L), (9L, 0L))
      .foldLeft(sk.zero)(sk.reduce)
    assert(got.toSeq === Seq(1L, 2L, 1L, 9L, 1L, 9L))
  }

  test("t14 matches a pure-Scala cutoff/tier replay at sf0.001") {
    val k = 99
    val sc = LlmQueries.all("t05_trigram_lm")(spark, sf0001)
      .select(col("doc_id"), col("n_trigrams"))
      .collect().map(r => r.getLong(0)).toSet // just doc coverage sanity
    assert(sc.nonEmpty)
    val scores = graft.Tables.load(spark, sf0001, "documents")
      .select("doc_id", "lang", "text").collect()
      .flatMap { r =>
        val (id, lang, text) = (r.getLong(0), r.getString(1), r.getString(2))
        if (text.length < 3) None else Some((id, lang, text))
      }
    // independent per-doc score via the same integer LM arithmetic
    val tri = scores.flatMap { case (id, _, t) =>
      (0 to t.length - 3).map(i => (id, t.substring(i, i + 3)))
    }
    val c3 = tri.groupBy(_._2).map { case (tg, xs) => tg -> xs.length.toLong }
    val bigAll = scores.flatMap { case (_, _, t) =>
      (0 to t.length - 2).map(i => t.substring(i, i + 2))
    }
    val c2 = bigAll.groupBy(identity).map { case (bg, xs) => bg -> xs.length.toLong }
    val perDoc = tri.groupBy(_._1).map { case (id, xs) =>
      val vs = xs.map { case (_, tg) =>
        c3(tg) * 1000000L / c2(tg.substring(0, 2))
      }
      id -> vs.sum / vs.length
    }
    val byLang = scores.map { case (id, lang, _) => (id, lang) }.toMap
    val rows = perDoc.toSeq.map { case (id, ppm) =>
      (id, byLang(id), ppm, graft.plans.PolyHash.hash(id.toString))
    }
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (lang, xs) =>
      val samp = xs.sortBy { case (id, _, ppm, fp) => (fp, ppm, id) }
        .take(k).map(_._3).sorted
      val lo = samp((samp.length - 1) / 3)
      val hi = samp(2 * (samp.length - 1) / 3)
      xs.map { case (_, _, ppm, _) =>
        (lang, if (ppm > hi) 1 else if (ppm > lo) 2 else 3, ppm)
      }.groupBy { case (l, t, _) => (l, t) }.toSeq.map { case ((l, t), g) =>
        val ps = g.map(_._3)
        (l, t, g.length.toLong, ps.min, ps.max, ps.sum / ps.length)
      }
    }.sortBy { case (l, t, _, _, _, _) => (l, t) }
    val got = LlmQueries.all("t14_quality_tiers")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === expected)
  }

  test("t14 plans without a window — cutoffs aggregate, corpus maps") {
    val plan = LlmQueries.all("t14_quality_tiers")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
