package graft.queries

import graft.SparkSpec

/** Pins t15's rule semantics against an independent pure-Scala
  * recomputation (the oracle gate separately proves DuckDB equality).
  * All comparisons are the cross-multiplied integer forms — a doc on a
  * ratio boundary must get the same flag from all three evaluators. */
class GopherRulesSpec extends SparkSpec {

  test("t15 matches a pure-Scala rule replay at sf0.001") {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val expected = graft.Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map { r =>
        val (id, text) = (r.getLong(0), r.getString(1))
        val w = text.trim.split("\\s+").toSeq
        val nWords = w.length.toLong
        val sumLen = w.map(_.length.toLong).sum
        val nSym = text.count(_ == '#').toLong +
          "\\Q...\\E".r.findAllMatchIn(text).length.toLong
        val lines = text.split("\n", -1).toSeq
        val nLines = lines.length.toLong
        val nBullet = lines.count { l =>
          val t = l.dropWhile(_ == ' ')
          t.startsWith("-") || t.startsWith("*")
        }.toLong
        val nEll = lines.count(_.endsWith("...")).toLong
        val nAlpha = w.count(_.exists(_.isLetter)).toLong
        val nStop = stops.count(w.contains).toLong
        val f = Seq(
          nWords >= 50 && nWords <= 100000,
          sumLen >= 3 * nWords && sumLen <= 10 * nWords,
          10 * nSym < nWords,
          10 * nBullet < 9 * nLines,
          10 * nEll < 3 * nLines,
          10 * nAlpha > 8 * nWords,
          nStop >= 2).map(b => if (b) 1 else 0)
        (id, nWords, f(0), f(1), f(2), f(3), f(4), f(5), f(6), f.product)
      }.sortBy(_._1).toSeq
    val got = LlmQueries.all("t15_gopher_rules")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6), r.getInt(7),
        r.getInt(8), r.getInt(9))).toSeq
    assert(got === expected)
    // the battery discriminates on this corpus: word-count is the rule
    // with both outcomes here (synthetic docs straddle the 50-word
    // floor; the others are uniform on this clean generator — real webs
    // aren't, and parity above covers their arithmetic either way)
    assert(got.map(_._3).toSet.size == 2,
      s"degenerate outcomes: wc=${got.map(_._3).toSet}")
  }
}
