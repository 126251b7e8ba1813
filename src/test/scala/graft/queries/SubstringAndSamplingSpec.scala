package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Behavior specs for the substring-span miner (d12), the temperature
  * sampler (r03) and the SQ8 ANN tier (s07). The oracle gate proves
  * engine-vs-DuckDB equality; these pin the semantics against independent
  * recomputations (pure-Scala span mining, exact integer quota replay,
  * recall vs the exact brute-force ranking). */
class SubstringAndSamplingSpec extends SparkSpec {

  test("d12 matches a pure-Scala span recomputation at sf0.001") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val wins = docs.toSeq.flatMap { case (id, t) =>
      val w = t.trim.split("\\s+").toSeq
      if (w.size >= 6) w.sliding(6).map(s => (id, s.mkString(" ")))
      else Iterator.empty
    }
    val expected = wins.groupBy(_._2).iterator.map { case (span, occ) =>
      (span, occ.map(_._1).distinct.size.toLong, occ.size.toLong)
    }.filter(_._2 >= 2).toSeq
      .sortBy { case (span, nd, no) => (-nd, -no, span) }
      .take(100)
    val got = LlmQueries.all("d12_substring_spans")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy { case (span, nd, no) => (-nd, -no, span) }
    assert(got === expected)
  }

  test("r03 replays the exact integer largest-remainder quota allocation") {
    val out = LlmQueries.all("r03_temperature_sample")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // ranks are contiguous 1..n within each source
    out.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq, src)
    }
    // independent quota replay: weight = floor(sqrt(char mass)), budget
    // 200 split base + largest-remainder, selection capped by stratum size
    val stats = graft.Tables.load(spark, sf0001, "documents")
      .groupBy("source")
      .agg(sum("n_chars").as("mass"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val wgt = stats.map { case (s, m, n) =>
      (s, math.floor(math.sqrt(m.toDouble)).toLong, n)
    }
    val sw = wgt.map(_._2).sum
    val base = wgt.map { case (s, w, n) => (s, 200L * w / sw, 200L * w % sw, n) }
    val leftn = 200L - base.map(_._2).sum
    val quota = base.sortBy { case (s, _, r, _) => (-r, s) }.zipWithIndex
      .map { case ((s, b, _, n), i) =>
        (s, b + (if (i < leftn) 1L else 0L), n)
      }
    assert(quota.map(_._2).sum === 200L)
    val expectedCounts = quota.collect {
      case (s, q, n) if math.min(q, n) > 0 => (s, math.min(q, n))
    }.toMap
    val gotCounts = out.groupBy(_._1).map { case (s, rs) =>
      (s, rs.length.toLong)
    }
    assert(gotCounts === expectedCounts)
  }

  test("s07 SQ8 candidates carry high recall against the exact ranking") {
    val exact = LlmQueries.all("s01_ann_cosine_topk")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val sq8 = LlmQueries.all("s07_ann_sq8_topk")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(sq8.length === 50) // 10 queries × top-5, like s01
    // 8-bit quantization over 64 dims keeps the true top-5 inside the
    // 20-candidate re-rank set nearly always; the floor is deliberately
    // below the measured value (48/50) so only a real regression trips it
    val hits = sq8.count(exact.contains)
    assert(hits >= 40, s"SQ8 recall@5 too low: $hits/50")
  }
}
