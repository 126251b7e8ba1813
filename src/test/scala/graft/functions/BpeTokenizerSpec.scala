package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions.{bpeTokenCount, BpeMerges}

class BpeTokenizerSpec extends SparkSpec {

  private def countOf(text: String): Long = {
    import spark.implicits._
    Seq(text).toDF("text")
      .select(bpeTokenCount(col("text")).as("n")).as[Long].head()
  }

  test("merges table is well-formed: every symbol is a base char or an " +
      "earlier merge's output") {
    val known = scala.collection.mutable.Set[String]()
    BpeMerges.foreach { case (a, b) =>
      for (s <- Seq(a, b))
        assert(s.length == 1 || known.contains(s),
          s"symbol '$s' used before it is produced")
      known += a + b
    }
  }

  test("hand-computed word merges") {
    // the: [t][h][e] -(t,h)-> [th][e] -(th,e)-> [the]
    assert(countOf("the") === 1L)
    // and: [a][n][d] -(a,n)-> [an][d] -(an,d)-> [and]
    assert(countOf("and") === 1L)
    // cat: [c][a][t] -(a,t)-> [c][at]
    assert(countOf("cat") === 2L)
    // hello: [h][e][l][l][o] -(h,e)-> [he][l][l][o] -(l,l)-> [he][ll][o]
    assert(countOf("hello") === 3L)
    // running: (i,n) then (in,g) -> [r][u][n][n][ing]
    assert(countOf("running") === 5L)
    // sentence = sum over words
    assert(countOf("the cat and the hat") === 1 + 2 + 1 + 1 + 2)
  }

  test("replace-all is left-to-right non-overlapping (BPE merge " +
      "semantics), and later rules see earlier outputs") {
    // ininin: (i,n) applied to every occurrence in one pass -> 3 symbols
    assert(countOf("ininin") === 3L)
    // overlapping candidates consume left-first: "ananan" with (a,n)
    // gives [an][an][an] = 3, and then (an,d) has no 'd' to bind
    assert(countOf("ananan") === 3L)
    // rank order wins over longest-match: (h,e) ranks before (w,h), so
    // 'whe' -> [w][he], NOT [wh][e] -> [whe] — exactly what the reference
    // lowest-rank-first loop does
    assert(countOf("whe") === 2L)
    // 'when': (e,n) rank 9 beats (h,e) rank 27 -> [w][h][en], then
    // (w,h) rank 29 still applies -> [wh][en]
    assert(countOf("when") === 2L)
  }

  test("t18 training agrees with an independent reference BPE trainer " +
      "on the corpus") {
    // independent trainer: per round, count adjacent symbol pairs across
    // word frequencies, pick the max (ties → minimum BRACKETED pair
    // string, the engine's comparison key), fuse left-to-right
    import spark.implicits._
    val wordCounts = graft.Tables.load(spark, sf0001, "documents")
      .select(explode(TextFunctions.tokens(col("text"))).as("w"))
      .where(col("w").rlike("^[a-z]+$"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    assert(wordCounts.nonEmpty)
    var vocab: Seq[(Vector[String], Long)] =
      wordCounts.toSeq.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val expected = Seq.newBuilder[(Int, String, String, String, Long)]
    for (r <- 1 to 8) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      if (counts.nonEmpty) {
        val ((a, b), n) = counts.toSeq.minBy { case ((x, y), c) =>
          (-c, s"[$x][$y]")
        }
        expected += ((r, a, b, a + b, n))
        vocab = vocab.map { case (syms, c) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += a + b; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), c)
        }
      }
    }
    val got = graft.queries.LlmQueries.t18BpeTrain(spark, sf0001)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got === expected.result())
    // training must actually compound: some learned symbol is length ≥ 3
    // (a merge consuming an earlier merge's output)
    assert(got.exists(_._4.length >= 3), got)
  }

  test("agrees with a reference BPE encoder (lowest-rank-first loop) on " +
      "corpus words") {
    // reference implementation: repeatedly merge the lowest-ranked
    // adjacent pair present, all occurrences left-to-right
    val rank = BpeMerges.zipWithIndex.map { case ((a, b), i) =>
      (a, b) -> i
    }.toMap
    def encode(word: String): Int = {
      var syms = word.map(_.toString).toVector
      var continue = true
      while (continue && syms.length > 1) {
        val present = syms.zip(syms.tail).flatMap(p => rank.get(p).map(p -> _))
        if (present.isEmpty) continue = false
        else {
          val (best, _) = present.minBy(_._2)
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && (syms(i), syms(i + 1)) == best) {
              out += syms(i) + syms(i + 1); i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.result()
        }
      }
      syms.length
    }
    import spark.implicits._
    val words = graft.Tables.load(spark, sf0001, "documents")
      .limit(50)
      .select(explode(TextFunctions.tokens(col("text"))).as("w"))
      .distinct().as[String].collect()
    assert(words.nonEmpty)
    val viaSql = words.toSeq.toDF("text")
      .select(col("text"), bpeTokenCount(col("text")).as("n"))
      .as[(String, Long)].collect().toMap
    words.foreach { w =>
      assert(viaSql(w) === encode(w).toLong,
        s"word '$w': sql ${viaSql(w)} vs reference ${encode(w)}")
    }
  }
}
