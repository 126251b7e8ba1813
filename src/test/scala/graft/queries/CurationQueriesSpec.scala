package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Behavior specs for the round-6 curation operators (t07–t09, d07, p02,
  * r01). The oracle gate proves engine-vs-DuckDB equality on the driver
  * corpus; these specs pin the SEMANTICS on crafted inputs the synthetic
  * corpus cannot exercise (real PII strings, exact chunk boundaries,
  * contamination ground truth). */
class CurationQueriesSpec extends SparkSpec {

  test("t07 regexes redact real PII and leave clean text byte-identical") {
    import spark.implicits._
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "\\+[0-9][0-9().-]{6,}[0-9]"
    val ipRe = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
    def redact(c: org.apache.spark.sql.Column) =
      regexp_replace(regexp_replace(regexp_replace(c,
        emailRe, "[EMAIL]"), phoneRe, "[PHONE]"), ipRe, "[IP]")
    val got = Seq(
      "mail jane.doe+spam@sub.example.co.uk now",
      "call +44 (0) 20-7946-0958 plz",          // phone with spaces stops at space
      "call +1-800-555-0199 plz",
      "host 192.168.100.1 port 80",
      "v4.2.1 is not an ip, 1.2.3.4.5 greedy-matches its first four octets",
      "no pii here at all")
      .toDF("t").select(redact(col("t"))).as[String].collect()
    assert(got(0) === "mail [EMAIL] now")
    assert(got(2) === "call [PHONE] plz")
    assert(got(3) === "host [IP] port 80")
    // documented behavior, shared with the oracle: the phone class is
    // anchored on '+' and excludes spaces, so a spaced number redacts
    // only up to the space-free prefix… nothing here matches ("+44 " has
    // a 1-digit body) — the string survives
    assert(got(1) === "call +44 (0) 20-7946-0958 plz")
    assert(got(4) === "v4.2.1 is not an ip, [IP].5 greedy-matches its first four octets")
    assert(got(5) === "no pii here at all")
  }

  test("t12 hashed classifier replays as an independent Scala fold") {
    def weight(j: Long): Long = (j * 2654435761L) % 2001 - 1000
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, t) =>
      val w = t.trim.split("\\s+")
      val logit = w.map(tok => weight(polyHash(tok) % 1024)).sum
      (id, w.length.toLong, logit, if (logit > 0) 1L else 0L)
    }.sortBy(_._1).toSeq
    val got = graft.queries.LlmQueries.all("t12_hashed_classifier")(
      spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expected)
    // the derived model must actually separate: both classes present
    assert(expected.exists(_._4 == 1L) && expected.exists(_._4 == 0L))
  }

  test("t17 extracts the document bytes exactly, dropping nav/footer lines") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // precondition for the closed-form expectation below: the synthetic
    // corpus carries no markup / entity / boilerplate look-alikes (if a
    // future corpus does, the extraction rule still applies identically
    // on both engines — only this spec's shortcut needs revisiting)
    assert(docs.forall { case (_, t) =>
      !t.contains('<') && !t.contains('&') && !t.contains(" | ") &&
        t.trim.nonEmpty })
    val expected = docs.map { case (id, t) =>
      val content = s"Doc & Title $id ${t.trim}"
      (id, 2L, 2L, content.length.toLong, polyHash(content))
    }.sortBy(_._1).toSeq
    val got = graft.queries.LlmQueries.t17HtmlExtract(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === expected)
  }

  test("p07 shuffle is a complete deterministic permutation, not id order") {
    val out = graft.queries.LlmQueries.p07CorpusShuffle(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = out.length
    assert(n > 0 && out.map(_._3).toSeq === (1L to n).toSeq)
    assert(out.map(_._1).distinct.length === n)
    val expect = out.map(_._1)
      .sortBy(id => (polyHash(s"shuffle:42:$id"), id)).toSeq
    assert(out.sortBy(_._3).map(_._1).toSeq === expect)
    // the permutation must actually permute (id order would mean the
    // hash degenerated)
    assert(out.map(_._1).toSeq !== out.map(_._1).sorted.toSeq)
  }

  test("r05 DSIR scores replay as an independent Scala fold and favor " +
      "the target language") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val feats = docs.flatMap { case (id, lang, t) =>
      val w = t.trim.split("\\s+")
      if (w.length < 2) Nil
      else w.sliding(2).map(p =>
        (id, lang, polyHash(p.mkString(" ")) % 4096L)).toSeq
    }
    val cr = feats.groupBy(_._3).map { case (b, xs) => b -> xs.length.toLong }
    val ct = feats.filter(_._2 == "en").groupBy(_._3)
      .map { case (b, xs) => b -> xs.length.toLong }
    val wgt = cr.map { case (b, c) =>
      b -> ((ct.getOrElse(b, 0L) + 1L) * 1000000L) / (c + 1L)
    }
    val expected = feats.groupBy(x => (x._1, x._2)).map {
      case ((id, lang), xs) =>
        (id, lang, xs.length.toLong, xs.map(x => wgt(x._3)).sum / xs.length)
    }.toSeq.sortBy(x => (-x._4, x._1)).take(100)
      .zipWithIndex.map { case ((id, lang, nf, s), i) =>
        (i + 1L, id, lang, nf, s)
      }
    val got = graft.queries.LlmQueries.all("r05_dsir_select")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === expected)
    // importance selection must overrepresent the target slice relative
    // to its corpus share, or the weights aren't doing anything
    val enTop = got.count(_._3 == "en")
    val enAll = docs.count(_._2 == "en")
    assert(enTop * docs.length > enAll * got.length,
      s"en top-share $enTop/${got.length} vs base $enAll/${docs.length}")
  }

  test("m06 packs interleaved image+text budgets as an exact running " +
      "total over t11's token counts") {
    val t11 = graft.queries.LlmQueries.all("t11_bpe_tokens")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = graft.queries.LlmQueries.m06InterleavedPack(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.nonEmpty)
    var running = 0L
    got.sortBy(_._1).foreach {
      case (id, nTok, nImg, cost, seqId, seqOff) =>
        assert(nTok === t11(id), s"doc $id token count diverges from t11")
        assert(nImg === id % 3)
        assert(cost === nTok + 64L * nImg)
        // the packer's (seq_id, seq_off) IS the exclusive running total
        assert(seqId === running / 2048L && seqOff === running % 2048L,
          s"doc $id packed at $seqId/$seqOff, expected from total $running")
        running += cost
    }
  }

  test("p08 epoch manifest composes shuffle order, exact token costs " +
      "and packing consistently") {
    val pos = graft.queries.LlmQueries.p07CorpusShuffle(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val bpe = graft.queries.LlmQueries.all("t11_bpe_tokens")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = graft.queries.LlmQueries.p08EpochManifest(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.nonEmpty && got.length === pos.size)
    var running = 0L
    got.sortBy(_._2).foreach {
      case (id, p, nBpe, seqId, seqOff, shard) =>
        assert(p === pos(id), s"doc $id manifest position diverges from p07")
        assert(nBpe === bpe(id), s"doc $id token cost diverges from t11")
        assert(seqId === running / 2048L && seqOff === running % 2048L,
          s"doc $id packed at $seqId/$seqOff, expected from total $running")
        assert(shard === seqId % 8L)
        running += nBpe
    }
  }

  test("t07 on the corpus: every injected PII instance is found") {
    val out = graft.queries.LlmQueries.t07PiiRedact(spark, sf0001)
    assert(out.where(col("n_emails") =!= 1 || col("n_phones") =!= 1 ||
      col("n_ips") =!= 1).isEmpty)
  }

  test("t08 chunks tile every document with 50-char overlap") {
    val out = graft.queries.LlmQueries.t08ChunkSplit(spark, sf0001)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nc"), max("chunk_idx").as("mx"),
        min("chunk_len").as("mn"), max("chunk_len").as("mxl"))
    // contiguous indices, every chunk ≤ 200 chars, only the tail short
    assert(out.where(col("mx") =!= col("nc") - 1).isEmpty)
    assert(out.where(col("mxl") > 200).isEmpty)
    val perDoc = graft.queries.LlmQueries.t08ChunkSplit(spark, sf0001)
    // a chunk shorter than 200 must be the last chunk of its doc
    val shortNonLast = perDoc.as("c").join(out.as("s"), "doc_id")
      .where(col("chunk_len") < 200 && col("chunk_idx") < col("mx"))
    // boundary arithmetic: with stride 150 the final chunk still starts
    // inside the text (start ≤ len), so zero-length chunks cannot occur
    assert(shortNonLast.isEmpty)
    assert(perDoc.where(col("chunk_len") <= 0).isEmpty)
  }

  test("d07 flags exactly the docs sharing an 8-token run with the eval set") {
    import spark.implicits._
    val out = graft.queries.LlmQueries.d07Decontaminate(spark, sf0001)
      .as[(Long, Long)].collect().toMap
    // never flags eval docs themselves
    assert(out.keys.forall(_ % 10 != 7))
    // ground truth on the tiny corpus via brute force over token windows
    val docs = spark.read
      .parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    def grams(t: String): Set[Seq[String]] = {
      val w = t.trim.split("\\s+").toSeq
      if (w.size < 8) Set.empty else w.sliding(8).map(_.toSeq).toSet
    }
    val evalGrams = docs.filter(_._1 % 10 == 7).flatMap(d => grams(d._2)).toSet
    val want = docs.filter(_._1 % 10 != 7)
      .map(d => d._1 -> grams(d._2).count(evalGrams.contains))
      .filter(_._2 > 0).toMap
    assert(out === want.map { case (k, v) => k -> v.toLong })
  }

  test("r01 keeps every en doc in buckets 0-1 and others in 0-4, stably") {
    val out = graft.queries.LlmQueries.r01StratifiedSample(spark, sf0001)
    assert(out.where(col("lang") === "en" && col("bucket") >= 2).isEmpty)
    assert(out.where(col("lang") =!= "en" && col("bucket") >= 5).isEmpty)
    // deterministic: a second run selects the identical id set
    val a = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = graft.queries.LlmQueries.r01StratifiedSample(spark, sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b && a.nonEmpty)
  }

  test("p06 never splits a dup cluster, covers every doc, and is stable") {
    val split = graft.queries.LlmQueries.p06LeakageSplit(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val nDocs = graft.Tables.load(spark, sf0001, "documents").count()
    assert(split.length.toLong === nDocs)
    assert(split.map(_._3).toSet.subsetOf(Set("train", "val", "test")))
    // the whole point: one split per split_key, so no near-dup cluster
    // straddles a split boundary — and clustered docs DO share keys here
    val perKey = split.groupBy(_._2).map { case (_, g) => g.map(_._3).toSet }
    assert(perKey.forall(_.size == 1))
    assert(split.groupBy(_._2).exists(_._2.length > 1))
    // clusters from d08 agree: every cluster member carries the cluster id
    val cl = graft.queries.LlmQueries.d08DupClusters(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val keyOf = split.map(t => t._1 -> t._2).toMap
    cl.foreach { case (doc, cid) => assert(keyOf(doc) === cid) }
    // content-keyed: a rerun reproduces the identical assignment
    val again = graft.queries.LlmQueries.p06LeakageSplit(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(split.toSeq === again.toSeq)
    // 80/10/10 in expectation: train strictly dominates each holdout
    val n = split.groupBy(_._3).map { case (k, g) => k -> g.length }
    assert(n("train") > n.getOrElse("val", 0) &&
      n("train") > n.getOrElse("test", 0))
  }

  test("p02 packs the corpus with no gaps: starts are the running total") {
    import spark.implicits._
    val rows = graft.queries.LlmQueries.p02SequencePack(spark, sf0001)
      .select("doc_id", "n_tokens", "seq_id", "seq_off")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    var run = 0L
    rows.foreach { case (_, n, sid, soff) =>
      assert(sid === run / 2048 && soff === run % 2048)
      run += n
    }
  }
}
