package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}

import graft.Tables
import graft.functions.{ArrayElementSum, BloomSketch, BottomKByHash}
import graft.functions.TextFunctions._

/** LLM-training-data pipeline operators over the `documents` and
  * `embeddings` tables: deduplication (exact, n-gram Jaccard, MinHash+LSH,
  * SimHash, embedding cosine), similarity search (brute-force + LSH-bucketed
  * ANN), and text analysis (tokens, quality, language-ID, fingerprinting).
  *
  * Scale design (100 TB):
  *  - similarity self-joins key on the shingle/band/bucket hash — Spark
  *    shuffles both sides by that key, so each pair is produced on exactly
  *    one executor, no broadcast of the corpus anywhere;
  *  - MinHash-LSH and the LSH-bucketed ANN are the scale path: candidate
  *    generation is an equi-join on band/bucket (linear-ish), and the
  *    expensive exact check runs only on candidates;
  *  - every hash is explicit arithmetic (TextFunctions), so results are
  *    reproducible in the DuckDB oracle and across engines/partitionings.
  */
object LlmQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  // ---- shared building blocks -------------------------------------------

  /** (doc_id, f): distinct 3-word-shingle fingerprints per document.
    *
    * The dedup is expressed as hash-partition-by-f + dropDuplicates
    * instead of a plain distinct(): HashPartitioning(f) satisfies the
    * dedup's ClusteredDistribution(doc_id, f) — same-key rows co-locate —
    * so the whole downstream family (df-cap window over f, the
    * fingerprint self-join on f) reuses this ONE shuffle of the largest
    * intermediate in the dedup pipeline, where distinct() would partition
    * by (doc_id, f) and force a second full reshuffle by f right after. */
  private def shingleFps(d: DataFrame): DataFrame =
    d.select(col("doc_id"), tokens(col("text")).as("w"))
      .where(size(col("w")) >= 3)
      .select(col("doc_id"), explode(shingles3(col("w"))).as("s"))
      .select(col("doc_id"), fingerprint(col("s")).as("f"))
      .repartition(col("f"))
      .dropDuplicates("doc_id", "f")

  /** Session-cached, persisted intermediates over the CANONICAL corpus at
    * `dir`. The dedup family shares whole pipeline stages — five queries
    * (d02/d03/d04/d08/d10) consume the shingle-fingerprint table, and
    * d08/d10 re-derive d03's verified pair list wholesale — so a sweep
    * must pay each stage once, not once per consuming query. This is the
    * materialize-once shape a real pipeline uses anyway: signature and
    * pair tables are tiny next to the corpus, and re-deriving them
    * re-reads everything. Keyed by (session, dir, stage): test corpora are
    * immutable per run, so there is no invalidation. Queries over
    * FILTERED corpora (p01) build their own stages. */
  private val stageCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), DataFrame]()
  /** NOT computeIfAbsent: stage builders consume other cached stages
    * (lsh_pairs → shingle_fps), and a nested computeIfAbsent on the same
    * ConcurrentHashMap throws "Recursive update" whenever the two keys
    * land in the same bin — which depends on the session's identity hash,
    * i.e. it is a per-JVM coin flip (caught as a once-in-seven-runs
    * verify flake in r7). Build OUTSIDE the map update; putIfAbsent
    * resolves the benign double-build race. */
  private def cachedStage(s: SparkSession, dir: String, stage: String)(
      build: => DataFrame): DataFrame = {
    val key = (s, dir, stage)
    val existing = stageCache.get(key)
    if (existing != null) existing
    else {
      val built = build
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val prev = stageCache.putIfAbsent(key, built)
      if (prev != null) { built.unpersist(); prev } else built
    }
  }

  /** Unpersist and drop every cached stage — call when a sweep is done
    * with the dedup family (Bench does, before the ingest phase) so the
    * persisted blocks don't occupy executor memory for the rest of the
    * session. Safe to call at any point: the next consumer rebuilds. */
  def clearStageCache(): Unit = {
    val it = stageCache.values().iterator()
    while (it.hasNext) { it.next().unpersist(); it.remove() }
  }

  /** Unpersist and drop ONE cached stage so Bench's outlier re-run can
    * re-time that build in isolation. Upstream stages stay cached, so
    * the re-timing measures the same work the original row did (stages
    * are forced in dependency order, each on warm dependencies);
    * downstream consumers already materialized and keep their blocks.
    * `stage` is the cache key (the bench row name minus `stage_`). */
  def dropStage(s: SparkSession, dir: String, stage: String): Unit = {
    val df = stageCache.remove((s, dir, stage))
    if (df != null) df.unpersist()
  }

  /** Every session-cached shared stage over the canonical corpus at
    * `dir`, in dependency order, as (name, materialize) thunks. Bench
    * times each as its own row BEFORE the query sweep: without this,
    * whichever consuming query ran first absorbed the build cost, so
    * per-query seconds wandered with sweep order (the r7 d13/l02/s08
    * "weak" calls were exactly this attribution drift). Forcing with
    * count() materializes the persisted blocks the same way the first
    * consumer would. */
  def sharedStages(s: SparkSession, dir: String): Seq[(String, () => Long)] =
    sharedStageFrames(s, dir).map { case (n, f) => (n, () => f().count()) }

  /** The shared-stage frames themselves (same names/order as
    * [[sharedStages]]) — for plan capture and other non-timing
    * consumers that want the DataFrame, not the forcing action. */
  def sharedStageFrames(s: SparkSession, dir: String)
      : Seq[(String, () => DataFrame)] =
    Seq(
      ("stage_shingle_fps", () => corpusFps(s, dir)),
      ("stage_lsh_pairs", () => corpusLshPairs(s, dir)),
      ("stage_jaccard_pairs", () => corpusJaccardPairs(s, dir)),
      ("stage_lm_doc_scores", () => lmDocScores(s, dir)),
      ("stage_contam_fps", () => contamFps(s, dir)),
      ("stage_dsir_feats", () => dsirFeats(s, dir)),
      ("stage_source_fps", () => sourceFps(s, dir)),
      ("stage_dup_labels", () => corpusDupLabels(s, dir)),
      ("stage_hnsw_graph", () => corpusHnswGraph(s, dir)))

  /** (doc_id, f) shingle fingerprints of the full corpus — d02/d03/d04/
    * d08/d10. */
  private def corpusFps(s: SparkSession, dir: String): DataFrame =
    cachedStage(s, dir, "shingle_fps")(shingleFps(docs(s, dir)))

  /** d03's verified MinHash-LSH near-dup pairs (a, b, jac) — also the
    * edge list d08 clusters and the found-set d10 scores. */
  private def corpusLshPairs(s: SparkSession, dir: String): DataFrame =
    cachedStage(s, dir, "lsh_pairs")(
      minhashNearDupPairs(docs(s, dir), Some(corpusFps(s, dir))))

  /** d08's connected-component labels (id, lbl) over the verified
    * near-dup pairs — also d16's cluster assignment. The O(diameter)
    * min-label iteration runs once per session, not once per consumer. */
  private def corpusDupLabels(s: SparkSession, dir: String): DataFrame =
    cachedStage(s, dir, "dup_labels")(
      graft.operators.DupClusters.clusters(
        corpusLshPairs(s, dir).select(col("a"), col("b"))))

  /** d02's exact-tier Jaccard ≥ 0.8 pairs — also d10's denominator. */
  private def corpusJaccardPairs(s: SparkSession, dir: String): DataFrame =
    cachedStage(s, dir, "jaccard_pairs")(
      jaccardPairs(corpusFps(s, dir)).where(col("jac") >= 0.8d))

  /** Exact pairwise Jaccard over shingle-fingerprint sets, for pairs that
    * share at least one shingle (pairs sharing none have jac=0 and are
    * never wanted). Shuffle key = fingerprint: no cross join materializes.
    *
    * Skew guard: shingles appearing in more than `MaxDocFreq` documents
    * are excluded before the self-join — a single stop-phrase shingle in
    * d docs would otherwise produce d²/2 join rows on one key. Standard
    * MinHash practice; near-dup pairs share plenty of rare shingles, and
    * this corpus never exceeds df=25 so the gate is value-neutral at test
    * scale (the oracle applies the identical cap). */
  val MaxDocFreq = 10000
  /** `candDocs`: optional (doc_id) set — when present, Jaccard is computed
    * only over pairs of those docs (LSH candidate pruning). The df cap is
    * still computed on the FULL corpus first, so capping semantics (and
    * per-doc cardinalities) are identical with or without pruning. */
  private def jaccardPairs(fp0: DataFrame,
      candDocs: Option[DataFrame] = None): DataFrame = {
    // df cap as a count-over-window keyed on f: ONE shuffle of fp0 by f,
    // no separate frequency aggregate + join-back (which would rescan and
    // reshuffle the fingerprint set), and the windowed output comes out
    // hash-partitioned by f — exactly what the self-join below needs.
    val fpAll = fp0
      .withColumn("d", count(lit(1)).over(Window.partitionBy(col("f"))))
      .where(col("d") <= MaxDocFreq)
      .drop("d")
    // Materialized: three consumers below (cardinalities + both self-join
    // sides), and Spark re-executes the whole tokenize→shingle→hash→window
    // subtree per branch (measured: 22 parquet scans in d03's plan, zero
    // exchange reuse). Persisting the capped fingerprint set is also the
    // 100 TB design — real near-dup pipelines materialize the signature
    // table once, because it is ~16 B/row vs re-tokenizing the corpus.
    val fp = candDocs.fold(fpAll)(cd =>
      fpAll.join(cd, Seq("doc_id"), "left_semi"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val card = fp.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = fp.as("x").join(fp.as("y"),
        col("x.f") === col("y.f") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(card.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(card.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      .select(col("a"), col("b"),
        (col("i") * lit(1.0d) / (col("na") + col("nb") - col("i"))).as("jac"))
  }

  // ---- text analysis ----------------------------------------------------

  /** T01: token counting — whitespace tokens + BPE-ish regex estimate. */
  def t01TokenStats(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      size(tokens(col("text"))).as("n_tokens"),
      length(col("text")).as("n_chars_m"),
      bpeCount(col("text")).as("n_bpe"))
      .orderBy(col("doc_id"))

  /** T12: hashed-features linear classifier — the fastText architecture
    * every production quality filter runs (CCNet/GPT-3 style): tokens
    * feature-hash into D buckets, a broadcast D-long weight vector scores
    * each document, keep = sign of the logit. The weight vector here is
    * derived arithmetic (a trained model would ship the same broadcast
    * array); weights and logits are exact integers so the oracle replays
    * the scoring bit-for-bit — no float model drift across engines.
    *
    * Scale shape: the model is ONE broadcast row; scoring is a per-row
    * array fold (zero shuffle, whole-stage codegen) — the classifier pass
    * over 100 TB is embarrassingly parallel, exactly as it must be. */
  def t12HashedClassifier(s: SparkSession, dir: String): DataFrame = {
    val D = 1024
    val model = s.range(1).select(expr(
      s"transform(sequence(0, ${D - 1}), j -> (j * 2654435761L) % 2001 - 1000)")
      .as("wv"))
    docs(s, dir).crossJoin(broadcast(model))
      .select(col("doc_id"), tokens(col("text")).as("w"), col("wv"))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_toks"),
        aggregate(
          transform(col("w"), t =>
            element_at(col("wv"), (fingerprint(t) % D).cast("int") + 1)),
          lit(0L), (acc, x) => acc + x).as("logit"))
      .withColumn("keep", (col("logit") > 0L).cast("long"))
      .orderBy(col("doc_id"))
  }

  /** T02: quality scoring — distinct-token ratio × length saturation. */
  def t02Quality(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(
        col("doc_id"),
        size(col("w")).as("n_tokens"),
        round(size(array_distinct(col("w"))) * lit(1.0d) / size(col("w")), 4)
          .as("distinct_ratio"),
        round(aggregate(transform(col("w"), t => length(t).cast("long")),
          lit(0L), (acc, v) => acc + v) * lit(1.0d) / size(col("w")), 4)
          .as("mean_token_len"),
        round((size(array_distinct(col("w"))) * lit(1.0d) / size(col("w"))) *
          least(size(col("w")) / lit(100.0d), lit(1.0d)), 4).as("quality"))
      .orderBy(col("doc_id"))

  /** T03: language ID via stopword-marker counts (n-gram heuristic class).
    * Ties resolve en > de > fr > es > und — fixed, documented order. */
  def t03LangId(s: SparkSession, dir: String): DataFrame = {
    def hits(w: Column, words: Seq[String]): Column =
      size(filter(w, t => words.map(t === _).reduce(_ || _)))
    val d = docs(s, dir).select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"),
        hits(col("w"), Seq("the", "a")).as("s_en"),
        hits(col("w"), Seq("der", "und")).as("s_de"),
        hits(col("w"), Seq("le", "et")).as("s_fr"),
        hits(col("w"), Seq("el", "y")).as("s_es"))
    d.select(col("doc_id"), col("s_en"), col("s_de"), col("s_fr"), col("s_es"),
      when(col("s_en") >= col("s_de") && col("s_en") >= col("s_fr") &&
        col("s_en") >= col("s_es") && col("s_en") > 0, "en")
        .when(col("s_de") >= col("s_fr") && col("s_de") >= col("s_es") &&
          col("s_de") > 0, "de")
        .when(col("s_fr") >= col("s_es") && col("s_fr") > 0, "fr")
        .when(col("s_es") > 0, "es")
        .otherwise("und").as("lang_pred"))
      .orderBy(col("doc_id"))
  }

  /** T04: document fingerprint (rolling polynomial hash). */
  def t04Fingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  /** T05: corpus-trained character-trigram LM score — mean conditional
    * trigram probability P(c|ab) = C₃(abc)/C₂(ab) with counts trained on
    * the corpus itself, a classic fluency/quality signal (gibberish and
    * boilerplate score low against the corpus distribution).
    *
    * Determinism design: the per-trigram probability is integer-scaled —
    * v = (C₃·10⁶) div C₂ — so the per-document aggregate is a sum of
    * LONGS (order-independent), not a sum of doubles (order-dependent) or
    * a log-prob (libm's `ln` differs across engines in the last ulp).
    * One final double division + round(4) happens per output row.
    *
    * Scale shape: trigram explode → two count aggregates (the "model") →
    * join back by trigram/prefix. The model tables are vocabulary-sized
    * (≤ alphabet³ rows), far below the corpus, and broadcast naturally. */
  def t05TrigramLm(s: SparkSession, dir: String): DataFrame =
    lmDocScores(s, dir)
      .select(col("doc_id"), col("n_trigrams"),
        round(col("sv") * lit(1.0d) / (col("n_trigrams") * lit(1000000L)), 4)
          .as("lm_score"))
      .orderBy(col("doc_id"))

  /** Per-document trigram-LM aggregates (doc_id, n_trigrams, sv) where
    * sv = Σ count·v over the doc's trigrams — t05 formats it as a score,
    * t14 turns it into quality tiers. Session-cached: the model training
    * and scoring join run once per sweep. */
  private def lmDocScores(s: SparkSession, dir: String): DataFrame =
   cachedStage(s, dir, "lm_doc_scores") {
    val d = docs(s, dir).where(length(col("text")) >= 3)
      .select(col("doc_id"), col("text"))
    // Per-(doc, trigram) COUNTS, not per-occurrence rows: the map-side
    // partial aggregate collapses repeats before the shuffle, the persisted
    // frame is distinct-trigram-per-doc-sized, and the scoring join below
    // processes counts instead of occurrences. Feeds the model AND the
    // scoring join — materialized once (per-branch recompute is the d03
    // lesson).
    val tric = d.select(col("doc_id"),
      explode(transform(sequence(lit(1), length(col("text")) - 2),
        i => col("text").substr(i, lit(3)))).as("tg"))
      .groupBy(col("doc_id"), col("tg")).agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c3 = tric.groupBy(col("tg")).agg(sum(col("cnt")).as("c3"))
    // Bigram counts WITHOUT a second corpus scan: every bigram of a text is
    // either the 2-char prefix of one of its trigrams, or the text's final
    // bigram (the one with no following char) — so C₂ = prefix-sums of C₃
    // plus one row per document, and the corpus is only exploded once.
    val lastBg = d.select(
      col("text").substr(length(col("text")) - 1, lit(2)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("lc"))
    val c2 = c3.withColumn("bg", col("tg").substr(lit(1), lit(2)))
      .groupBy(col("bg")).agg(sum(col("c3")).as("pc"))
      .join(lastBg, Seq("bg"), "left")
      .select(col("bg"), (col("pc") + coalesce(col("lc"), lit(0L))).as("c2"))
    // v depends only on the trigram, so the model collapses to ONE
    // vocabulary-sized table (≤ alphabet³ rows) joined to the corpus once,
    // broadcast — the corpus-sized side never shuffles for the join
    val model = c3
      .withColumn("bg", col("tg").substr(lit(1), lit(2)))
      .join(c2, "bg")
      .select(col("tg"), expr("(c3 * 1000000L) div c2").as("v"))
    tric
      .join(broadcast(model), "tg")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_trigrams"),
        sum(col("cnt") * col("v")).as("sv"))
   }

  /** T14: LM-quality tiers — bucket the corpus into head/middle/tail
    * quality thirds per language by the t05 trigram-LM score, the CCNet
    * perplexity-filter move (Wenzek et al. 2020): downstream sampling
    * keeps the head, inspects the middle, drops the tail. Output is the
    * per-(lang, tier) census (doc count, score range, integer mean).
    *
    * Scale shape — deliberately NOT `ntile() OVER (PARTITION BY lang)`:
    * that window funnels every document of a language through ONE
    * partition for the sort, the single-partition-window trap p02
    * avoids. Instead tier CUTOFFS are order statistics of a per-language
    * deterministic sample ([[graft.functions.BottomKByHash]] — mergeable
    * partial aggregate, only 2k-long buffers shuffle), broadcast back,
    * and tier assignment is a map-side comparison — exactly how CCNet
    * trains its cutoffs on a sample. Every step is integer arithmetic
    * (scores are div-scaled longs, cutoff indices are integer div), so
    * the tier boundaries replay exactly cross-engine. */
  def t14QualityTiers(s: SparkSession, dir: String): DataFrame =
    docTiers(s, dir)
      .groupBy(col("lang"), col("tier"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("score_ppm")).as("min_ppm"),
        max(col("score_ppm")).as("max_ppm"),
        expr("sum(score_ppm) div count(1)").as("avg_ppm"))
      .orderBy(col("lang"), col("tier"))

  /** Per-document (doc_id, lang, score_ppm, tier) — t14's sampled-cutoff
    * tier assignment, shared with p05's curriculum ordering. */
  private def docTiers(s: SparkSession, dir: String): DataFrame = {
    val k = 99
    val scores = lmDocScores(s, dir)
      .select(col("doc_id"), expr("sv div n_trigrams").as("score_ppm"))
      .join(docs(s, dir).select(col("doc_id"), col("lang")), "doc_id")
      .withColumn("fp", fingerprint(col("doc_id").cast("string")))
    val cuts = scores.groupBy(col("lang"))
      .agg(BottomKByHash.column(col("fp"), col("score_ppm"), k).as("pairs"))
      .select(col("lang"),
        array_sort(expr("filter(pairs, (x, i) -> i % 2 = 1)")).as("vs"))
      .select(col("lang"),
        element_at(col("vs"), expr("1 + (size(vs) - 1) div 3").cast("int"))
          .as("lo"),
        element_at(col("vs"), expr("1 + (2 * (size(vs) - 1)) div 3").cast("int"))
          .as("hi"))
    scores.join(broadcast(cuts), "lang")
      .withColumn("tier",
        when(col("score_ppm") > col("hi"), lit(1))
          .when(col("score_ppm") > col("lo"), lit(2)).otherwise(lit(3)))
      .select(col("doc_id"), col("lang"), col("score_ppm"), col("tier"))
  }

  /** T06: corpus n-gram mining — the top-100 word bigrams by corpus
    * frequency (ties → lexicographic), the classic "what is in my corpus"
    * report (boilerplate phrases, contamination markers, template text all
    * surface here first).
    *
    * Scale shape: explode → hash aggregate with map-side partial
    * aggregation (the shuffle carries one row per distinct bigram per
    * task, not one per occurrence) → global top-k compiled to
    * TakeOrderedAndProject — cost bounded by the vocabulary, not the
    * corpus; no full sort anywhere. */
  def t06TopNgrams(s: SparkSession, dir: String): DataFrame = {
    val top = docs(s, dir)
      .select(tokens(col("text")).as("w"))
      .where(size(col("w")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("w")) - 1),
        i => concat_ws(" ", element_at(col("w"), i),
          element_at(col("w"), i + 1)))).as("ngram"))
      .groupBy(col("ngram")).agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("ngram"))
      .limit(100)
    // rank assigned after the top-k cut: the window sees 100 rows, never
    // the vocabulary
    top.select(
        row_number().over(
          Window.orderBy(col("n_occurrences").desc, col("ngram"))).as("rk"),
        col("ngram"), col("n_occurrences"))
      .orderBy(col("rk"))
  }

  /** T07: PII redaction — the scrub pass every training corpus runs before
    * anything else: e-mail addresses, phone numbers, and IPv4 addresses
    * are replaced with class tags, and the per-class hit counts are
    * reported next to a fingerprint of the redacted text (so the oracle
    * verifies the BYTES of the redacted output, not just the counts).
    *
    * The synthetic corpus is PII-free by construction (AsciiCorpusSpec
    * territory), so the query deterministically injects one e-mail, one
    * phone number, and one IP per document (derived from doc_id) before
    * redacting — the regexes are exercised against real positive matches
    * on both engines, and the surrounding document text must survive
    * byte-identically. Pattern order matters and is fixed: e-mail first
    * (its local part can contain digits a later pattern would nibble),
    * then phone (anchored on a leading '+' so it can never swallow an
    * IP), then IPv4.
    *
    * Scale shape: pure per-row regexp_count/regexp_replace — fused into
    * the scan by codegen, no shuffle at all until the final presentation
    * sort. */
  def t07PiiRedact(s: SparkSession, dir: String): DataFrame = {
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "\\+[0-9][0-9().-]{6,}[0-9]"
    val ipRe = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
    val aug = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail.example.com or +1-555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      lit(" ip 10."), (col("doc_id") % 256).cast("string"), lit(".0."),
      ((col("doc_id") * 7) % 256).cast("string"))
    docs(s, dir)
      .select(col("doc_id"), aug.as("t0"))
      .select(col("doc_id"),
        regexp_count(col("t0"), lit(emailRe)).as("n_emails"),
        regexp_count(col("t0"), lit(phoneRe)).as("n_phones"),
        regexp_count(col("t0"), lit(ipRe)).as("n_ips"),
        regexp_replace(regexp_replace(regexp_replace(col("t0"),
          emailRe, "[EMAIL]"), phoneRe, "[PHONE]"), ipRe, "[IP]")
          .as("red"))
      .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ips"),
        length(col("red")).as("red_len"), fingerprint(col("red")).as("red_fp"))
      .orderBy(col("doc_id"))
  }

  /** T08: document chunking — fixed 200-char windows with a 150-char
    * stride (50-char overlap), the retrieval/context-window split step.
    * A document of length L yields 1 + ceil(max(L-200,0)/150) chunks; the
    * final chunk is allowed to run short. Chunk bytes are reported as a
    * fingerprint (array/text cells don't survive the driver's hash).
    *
    * Scale shape: explode over a per-row sequence — embarrassingly
    * parallel, no shuffle; chunk count is derived arithmetic, not a
    * scan-until-end loop. */
  def t08ChunkSplit(s: SparkSession, dir: String): DataFrame = {
    val nChunks = (lit(1L) +
      expr("(greatest(length(text) - 200, 0) + 149) div 150")).as("nc")
    docs(s, dir)
      .select(col("doc_id"), col("text"), nChunks)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0L), col("nc") - 1),
          i => struct(i.as("chunk_idx"),
            col("text").substr((lit(1L) + i * 150).cast("int"), lit(200))
              .as("chunk")))).as("c"))
      .select(col("doc_id"), col("c.chunk_idx"),
        length(col("c.chunk")).as("chunk_len"),
        fingerprint(col("c.chunk")).as("chunk_fp"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** T09: repetition metrics — the Gopher-style repetition signals used
    * to drop template/boilerplate text: the share of tokens taken by the
    * single most frequent token (ties broken to the lexicographically
    * first), and the duplicate-bigram fraction (1 − distinct/total).
    * The corpus has no newlines, so the line-level variants of these
    * rules are vacuous here and deliberately omitted.
    *
    * Scale shape: explode → two-level hash aggregates, map-side partial
    * agg on (doc, token); the argmax is a max + equi-filter, never a
    * sort; no window over anything bigger than a document's vocabulary. */
  def t09Repetition(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), tokens(col("text")).as("w"))
      .where(size(col("w")) >= 2)
    val tokCnt = d.select(col("doc_id"), explode(col("w")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = tokCnt.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"), max(col("c")).as("top_c"))
    // deterministic argmax: join back on the max count, take min token
    val topTok = tokCnt.join(stats, "doc_id")
      .where(col("c") === col("top_c"))
      .groupBy(col("doc_id")).agg(min(col("tok")).as("top_token"))
    val bg = d.select(col("doc_id"),
      explode(transform(sequence(lit(1), size(col("w")) - 1),
        i => concat_ws(" ", element_at(col("w"), i),
          element_at(col("w"), i + 1)))).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("nb"), count(lit(1)).as("db"))
      .select(col("doc_id"),
        round(lit(1.0d) - col("db") * lit(1.0d) / col("nb"), 4)
          .as("dup_bigram_ratio"))
    stats.join(topTok, "doc_id").join(bg, "doc_id")
      .select(col("doc_id"), col("n_tokens"), col("top_token"),
        round(col("top_c") * lit(1.0d) / col("n_tokens"), 4)
          .as("top_token_ratio"),
        col("dup_bigram_ratio"))
      .orderBy(col("doc_id"))
  }

  /** D07: benchmark decontamination — flag training documents that share
    * any 8-token shingle with the held-out eval set (docs with
    * doc_id % 10 == 7 stand in for the benchmark corpus). This is the
    * n-gram-overlap decontamination pass (GPT-3 appendix C / PaLM style)
    * every serious pretraining run performs.
    *
    * Scale shape: shingle → fingerprint → DISTINCT eval-side fingerprint
    * set (benchmarks are tiny by construction — broadcast), then an
    * equi-join from the training shingles; contamination counts come out
    * of the join's group-by. Never compares documents pairwise. */
  def d07Decontaminate(s: SparkSession, dir: String): DataFrame = {
    val sh = contamFps(s, dir)
    val eval_ = sh.where(col("doc_id") % 10 === 7).select(col("f")).distinct()
    sh.where(col("doc_id") % 10 =!= 7)
      .join(broadcast(eval_), "f")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_contaminated_shingles"))
      .orderBy(col("doc_id"))
  }

  /** Distinct 8-token-shingle fingerprints per document — the
    * contamination granulariy d07 and a05 share (session-cached so a
    * sweep derives it once). */
  private def contamFps(s: SparkSession, dir: String): DataFrame =
    cachedStage(s, dir, "contam_fps") {
      val k = 8
      docs(s, dir)
        .select(col("doc_id"), tokens(col("text")).as("w"))
        .where(size(col("w")) >= k)
        .select(col("doc_id"),
          explode(transform(sequence(lit(1), size(col("w")) - (k - 1)),
            i => concat_ws(" ",
              (0 until k).map(j => element_at(col("w"), i + j)): _*)))
            .as("s"))
        .select(col("doc_id"), fingerprint(col("s")).as("f"))
        .dropDuplicates("doc_id", "f")
    }

  /** A05: Bloom-filter decontamination — d07's membership check run
    * against a [[graft.functions.BloomSketch]] bitmap instead of the
    * exact fingerprint table, with the exact count reported next to the
    * sketch count per the sketch-family convention (a02/a03): per
    * flagged document, how many of its shingles the filter accepts
    * (n_bloom_hits, includes false positives at the designed rate) next
    * to how many truly overlap the eval set (n_exact_hits; bloom ≥ exact
    * always — a Bloom filter has no false negatives).
    *
    * Scale shape — why this exists next to d07: the filter build is an
    * OR-mergeable partial aggregate (one pass over the eval set, one
    * bitmap per partition through the exchange), and the probe is a
    * map-side codegen'd expression over a plan-constant bitmap —
    * membership costs ZERO joins and zero shuffles on the 100 TB probe
    * side, where d07's broadcast join must build + probe a hash table of
    * the full eval fingerprint set on every executor. The single-row
    * `.head()` materializing the sketch is control-plane (the bitmap is
    * a query-plan constant; joining it as a column would copy 1 MB into
    * every probe row). The exact-readout join stays only to surface the
    * sketch's error in the verified output. */
  def a05BloomDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val mBits = 1 << 22
    val sh = contamFps(s, dir)
    val eval_ = sh.where(col("doc_id") % 10 === 7).select(col("f")).distinct()
    val words = eval_
      .agg(BloomSketch.column(col("f"), mBits).as("bf"))
      .head().getAs[scala.collection.Seq[Long]](0).toArray
    val exact = eval_.withColumn("is_exact", lit(1L))
    sh.where(col("doc_id") % 10 =!= 7)
      .withColumn("bloom_hit",
        BloomSketch.probeColumn(words, mBits, col("f")).cast("long"))
      .where(col("bloom_hit") === 1L)
      .join(broadcast(exact), Seq("f"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bloom_hits"),
        sum(coalesce(col("is_exact"), lit(0L))).as("n_exact_hits"))
      .withColumn("n_false_pos", col("n_bloom_hits") - col("n_exact_hits"))
      .orderBy(col("doc_id"))
  }

  /** P02: sequence packing — concatenate documents in doc_id order and
    * slice into 2048-token training windows; each document reports the
    * window its first token lands in and the offset inside it. The global
    * running total is [[graft.operators.SequencePacker]]'s two-level
    * prefix sum (per-block sums → tiny block-offset window → within-block
    * windows), so no stage ever funnels the corpus through one partition
    * — the naive `sum over (order by doc_id)` would. */
  def p02SequencePack(s: SparkSession, dir: String): DataFrame =
    graft.operators.SequencePacker.pack(
      docs(s, dir).select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens")),
      key = "doc_id", nTokens = "n_tokens", seqLen = 2048L, blockSize = 64L)
      .select(col("doc_id"), col("n_tokens"), col("seq_id"), col("seq_off"))
      .orderBy(col("doc_id"))

  /** R01: deterministic stratified sampling — per-language Bernoulli
    * rates (en 20%, everything else 50%) keyed on the document-text
    * fingerprint, not on rand(): the same document always lands on the
    * same side of the cut, across retries, engines, and cluster sizes —
    * the reproducibility property a training-data pipeline needs from its
    * sampling step. Rates live in a broadcast-joined tiny table, the
    * shape a per-domain/per-language sampling config takes at scale.
    *
    * Scale shape: broadcast hash join + per-row filter, no shuffle. */
  def r01StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rates = Seq(("en", 2L)).toDF("lang", "rate10")
    docs(s, dir)
      .join(broadcast(rates), Seq("lang"), "left")
      .withColumn("rate10", coalesce(col("rate10"), lit(5L)))
      .withColumn("bucket", fingerprint(col("text")) % 10)
      .where(col("bucket") < col("rate10"))
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy(col("doc_id"))
  }

  /** R05: DSIR-style importance resampling (Xie et al. 2023) — select
    * raw documents whose hashed-n-gram feature distribution resembles a
    * TARGET distribution, the model-free data-selection method behind
    * several modern pretraining mixes. Features are word bigrams
    * feature-hashed into 4096 buckets; the target is the corpus's
    * `lang = 'en'` slice (standing in for the curated target set); each
    * document's score is the integer MEAN over its features of the
    * scaled target/raw frequency ratio `((ct+1)·1e6) div (cr+1)` — the
    * rational form of DSIR's log-likelihood ratio (the t13 move: exact
    * integer arithmetic end-to-end, so the oracle replays bit-for-bit;
    * log-space weights are a one-line swap when exact replay is not
    * required). Top-100 by (score, doc_id).
    *
    * Scale shape: both frequency tables are ≤4096 rows — broadcast;
    * the corpus explodes to (doc, bucket) once and scores with ONE
    * partial-aggregated groupBy; the limit pushes below the rank window
    * (TakeOrderedAndProject per-partition top-k heaps feeding a 100-row
    * window — plan-pinned), never a global sort of the corpus. */
  /** Hashed-bigram features (doc_id, lang, b) over the full corpus —
    * r05's three consumers (raw counts, target counts, scoring). Session
    * stage cache, NOT a bare persist: clearStageCache() must be able to
    * release the per-occurrence frame (the largest intermediate here)
    * when the sweep moves on, like the dedup family's stages. */
  private def dsirFeats(s: SparkSession, dir: String): DataFrame =
    cachedStage(s, dir, "dsir_feats") {
      val B = 4096L
      docs(s, dir)
        .select(col("doc_id"), col("lang"), tokens(col("text")).as("w"))
        .where(size(col("w")) >= 2)
        .select(col("doc_id"), col("lang"),
          explode(expr("transform(sequence(1, size(w) - 1), i -> " +
            "concat_ws(' ', element_at(w, i), element_at(w, i + 1)))"))
            .as("bg"))
        .select(col("doc_id"), col("lang"),
          (fingerprint(col("bg")) % B).as("b"))
    }

  def r05DsirSelect(s: SparkSession, dir: String): DataFrame = {
    val feats = dsirFeats(s, dir)
    val raw = feats.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val tgt = feats.where(col("lang") === "en")
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val ratio = raw.join(tgt, Seq("b"), "left")
      .select(col("b"),
        expr("((coalesce(ct, 0) + 1) * 1000000) div (cr + 1)").as("wgt"))
    val scored = feats.join(broadcast(ratio), Seq("b"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_feats"), sum(col("wgt")).as("sw"))
      .select(col("doc_id"), col("lang"), col("n_feats"),
        expr("sw div n_feats").as("score"))
    val w = Window.orderBy(col("score").desc, col("doc_id"))
    scored.select(row_number().over(w).cast("long").as("rk"),
        col("doc_id"), col("lang"), col("n_feats"), col("score"))
      .where(col("rk") <= 100)
      .orderBy(col("rk"))
  }

  /** T15: Gopher quality rules (Rae et al. 2021, table A1) — the rule
    * battery web-scale curation applies before any model-based scoring:
    * word-count bounds, mean-word-length bounds, symbol-to-word ratio,
    * bullet/ellipsis line fractions, alphabetic-word fraction, stop-word
    * presence. Output is the per-document flag vector plus the overall
    * verdict, so downstream filters can keep, route, or audit per rule.
    *
    * Every ratio test is CROSS-MULTIPLIED integer arithmetic (10·n_sym <
    * n_words instead of n_sym/n_words < 0.1) — no float division
    * anywhere, so the flags replay exactly cross-engine and the same doc
    * never flips at a boundary. All counts are one stateless projection
    * over the text; the query is a map-only scan plus the output sort. */
  def t15GopherRules(s: SparkSession, dir: String): DataFrame = {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val nOcc = (c: Column, pat: String) =>
      ((length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(pat), ""))) / pat.length).cast("long")
    docs(s, dir)
      .select(col("doc_id"), col("text"), tokens(col("text")).as("w"),
        split(col("text"), "\n").as("lines"))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_words"),
        aggregate(col("w"), lit(0L), (a, x) => a + length(x)).as("sum_len"),
        (nOcc(col("text"), "#") + nOcc(col("text"), "...")).as("n_sym"),
        size(col("lines")).cast("long").as("n_lines"),
        size(filter(col("lines"), l =>
          substring(ltrim(l), 1, 1).isin("-", "*"))).cast("long")
          .as("n_bullet"),
        size(filter(col("lines"), l => l.like("%...")))
          .cast("long").as("n_ell"),
        size(filter(col("w"), x => x.rlike("[A-Za-z]"))).cast("long")
          .as("n_alpha"),
        stops.map(t => when(array_contains(col("w"), t), lit(1L))
          .otherwise(lit(0L))).reduce(_ + _).as("n_stop"))
      .select(col("doc_id"), col("n_words"),
        (col("n_words") >= 50 && col("n_words") <= 100000)
          .cast("int").as("pass_wc"),
        (col("sum_len") >= lit(3L) * col("n_words") &&
          col("sum_len") <= lit(10L) * col("n_words"))
          .cast("int").as("pass_mwl"),
        (lit(10L) * col("n_sym") < col("n_words")).cast("int").as("pass_sym"),
        (lit(10L) * col("n_bullet") < lit(9L) * col("n_lines"))
          .cast("int").as("pass_bullet"),
        (lit(10L) * col("n_ell") < lit(3L) * col("n_lines"))
          .cast("int").as("pass_ellipsis"),
        (lit(10L) * col("n_alpha") > lit(8L) * col("n_words"))
          .cast("int").as("pass_alpha"),
        (col("n_stop") >= 2L).cast("int").as("pass_stop"))
      .withColumn("pass_all",
        (col("pass_wc") * col("pass_mwl") * col("pass_sym") *
          col("pass_bullet") * col("pass_ellipsis") * col("pass_alpha") *
          col("pass_stop")).cast("int"))
      .orderBy(col("doc_id"))
  }

  /** T16: one-pass table profile — the data-quality report a curation
    * run opens with: per column, the row count, null count, and a KMV
    * distinct-cardinality estimate (k=64, the a02 sketch) over the
    * column's fingerprinted values.
    *
    * Scale shape — the reason this is a sketch and not `count(distinct)`
    * per column: ALL columns profile in ONE corpus pass with map-side
    * partial aggregation (null counters + KMV buffers cross the shuffle,
    * never rows), where a multi-column exact distinct plans an Expand
    * that multiplies the scan by the column count and shuffles each
    * copy. The unpivot to one-row-per-column runs on the single
    * aggregated row. Estimates replay exactly in the oracle (the KMV
    * arithmetic is deterministic). */
  def t16TableProfile(s: SparkSession, dir: String): DataFrame = {
    val profiled = Seq("doc_id", "lang", "n_chars", "source", "text")
    val d = docs(s, dir)
    // KMV needs UNIFORM hashes; PolyHash of short strings (doc_id,
    // n_chars digits) stays tiny and would bias the estimator by orders
    // of magnitude, so spread it first — multiplication by a constant
    // coprime to the modulus is a bijection on [0, p), replayed exactly
    // by the oracle
    val mix = (h: Column) => (h * lit(1103515245L)) % lit(1000000007L)
    val aggs = profiled.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        round(graft.functions.KmvSketch.column(
          mix(fingerprint(col(c).cast("string"))), 64), 4).as(s"kd_$c"))
    }
    d.agg(count(lit(1)).as("n_rows"), aggs: _*)
      .select(col("n_rows"), expr("stack(" + profiled.size + ", " +
        profiled.map(c => s"'$c', nn_$c, kd_$c").mkString(", ") +
        ") AS (col_name, n_null, distinct_est)"))
      .select(col("col_name"), col("n_rows"), col("n_null"),
        col("distinct_est"))
      .orderBy(col("col_name"))
  }

  /** T17: HTML extraction — the stage every web corpus runs FIRST
    * (trafilatura/jusText territory): strip markup, drop head/script
    * blocks wholesale, discard boilerplate lines (navigation, footer),
    * decode character entities, and report the extracted content next to
    * a fingerprint of its bytes. The synthetic corpus is plain text, so
    * the query deterministically wraps each document in a fixed HTML
    * shell (title/style head, nav bar, entity-bearing h1, the text as
    * the sole paragraph, a script tag, an entity-laden footer — derived
    * from doc_id, the t07 injection pattern) before extracting, so both
    * engines exercise real markup and the extracted bytes must equal the
    * original document plus the decoded heading.
    *
    * Boilerplate rule (fixed): a trimmed non-empty line is dropped when
    * it contains the ' | ' navigation separator or opens with the
    * '&copy;' footer entity. Entity decode order is fixed too —
    * &lt; / &gt; first, &amp; LAST, so '&amp;lt;' can never
    * double-decode.
    *
    * Scale shape: per-row regexp/array expressions fused into the scan
    * by codegen — zero shuffles before the presentation sort (the same
    * class as t07/t08). */
  def t17HtmlExtract(s: SparkSession, dir: String): DataFrame = {
    val aug = concat(
      lit("<html><head><title>doc "), col("doc_id").cast("string"),
      lit("</title><style>p{margin:0}</style></head><body>" +
        "<nav>Home | About | Contact</nav><h1>Doc &amp; Title "),
      col("doc_id").cast("string"),
      lit("</h1><p>"), col("text"),
      lit("</p><script>var x=1;</script>" +
        "<footer>&copy; 2024 Example &lt;Corp&gt;</footer></body></html>"))
    docs(s, dir)
      .select(col("doc_id"), aug.as("h0"))
      .select(col("doc_id"),
        regexp_replace(col("h0"),
          "<head>.*?</head>|<script>.*?</script>", "").as("h1"))
      .select(col("doc_id"),
        split(regexp_replace(col("h1"), "<[^>]*>", "\n"), "\n").as("raw"))
      .select(col("doc_id"),
        expr("filter(transform(raw, x -> trim(x)), x -> length(x) > 0)")
          .as("ls"))
      .select(col("doc_id"), size(col("ls")).as("n_lines"),
        expr("filter(ls, x -> instr(x, ' | ') = 0 " +
          "AND substr(x, 1, 6) <> '&copy;')").as("keep"))
      .select(col("doc_id"),
        size(col("keep")).cast("long").as("n_kept"),
        // dropped = total − kept: one predicate pass, and the two counts
        // can never drift apart when the boilerplate rule is edited
        (col("n_lines") - size(col("keep"))).cast("long").as("n_dropped"),
        expr("replace(replace(replace(array_join(keep, ' '), " +
          "'&lt;', '<'), '&gt;', '>'), '&amp;', '&')").as("content"))
      .select(col("doc_id"), col("n_kept"), col("n_dropped"),
        length(col("content")).cast("long").as("content_len"),
        fingerprint(col("content")).as("content_fp"))
      .orderBy(col("doc_id"))
  }

  /** T18: BPE vocabulary TRAINING — learn the merge table itself
    * (Sennrich et al. 2016), where t11 only APPLIES a fixed one: per
    * round, count every adjacent symbol pair across the corpus's word
    * frequencies, adopt the most frequent pair (ties → lexicographically
    * first pair) as the next merge rule, rewrite the vocabulary, repeat.
    * Output is the learned merge table — rank, the two merged symbols,
    * the fused token, and the pair's corpus count at selection time —
    * i.e. the `merges.txt` a tokenizer ships.
    *
    * Representation is t11's bracketed-symbol form (`"cat"` →
    * `"[c][a][t]"`), so applying a learned rule is one left-to-right
    * `replace` and the DuckDB oracle replays every round verbatim
    * (unrolled: count → argmax → rewrite, eight times).
    *
    * Scale shape: training runs over the DISTINCT-word frequency table
    * (tiny next to the corpus — one groupBy builds it, after which the
    * corpus is never re-read), each round is one partial-aggregated
    * pair count plus a map-side rewrite, and the only driver traffic is
    * the single winning pair per round (a control-plane scalar, the d08
    * iteration pattern — NOT a data collect). Rounds are inherently
    * sequential in BPE; production vocab sizes just run more of them. */
  def t18BpeTrain(s: SparkSession, dir: String): DataFrame = {
    val rounds = 8
    var words = docs(s, dir)
      .select(explode(tokens(col("text"))).as("w"))
      .where(col("w").rlike("^[a-z]+$"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(regexp_replace(col("w"), "(.)", "[$1]").as("s"), col("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val learned = Seq.newBuilder[(Int, String, String, String, Long)]
    try {
      for (r <- 1 to rounds) {
        val best = words
          .select(col("cnt"),
            split(expr("substring(s, 2, length(s) - 2)"), "\\]\\[")
              .as("y"))
          .where(size(col("y")) >= 2)
          .select(col("cnt"), explode(expr(
            "transform(sequence(1, size(y) - 1), i -> " +
              "'[' || element_at(y, i) || '][' || element_at(y, i + 1) " +
              "|| ']')")).as("p"))
          .groupBy(col("p")).agg(sum(col("cnt")).as("n"))
          .orderBy(col("n").desc, col("p").asc).limit(1).collect()
        if (best.nonEmpty) {
          val pair = best(0).getString(0)
          val inner = pair.substring(1, pair.length - 1)
          val Array(a, b) = inner.split("\\]\\[", 2)
          learned += ((r, a, b, a + b, best(0).getLong(1)))
          val next = words
            .select(call_function("replace", col("s"), lit(pair),
              lit(s"[${a + b}]")).as("s"), col("cnt"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          next.count()
          words.unpersist()
          words = next
        }
      }
    } finally words.unpersist()
    import s.implicits._
    learned.result()
      .toDF("merge_rank", "lhs", "rhs", "merged", "n_occ")
      .orderBy(col("merge_rank"))
  }

  /** P07: seeded deterministic corpus shuffle — the global training-order
    * randomization every pretraining run needs between curriculum stages:
    * order = ascending hash of (seed, doc_id). Content-keyed like
    * r01/r02/p06 — NEVER `rand()` — so the order is identical across
    * reruns, partitionings, and cluster sizes, and a resumed run sees the
    * same epoch permutation (change the seed constant for a new epoch).
    *
    * Scale shape: the global position comes from
    * [[graft.operators.GlobalRank]] — range-repartition by the hash,
    * per-partition rank + broadcast offsets — never a single-partition
    * `row_number() OVER (ORDER BY …)`; the order key (h, doc_id) is
    * unique so the rank is deterministic and the oracle replays it. */
  def p07CorpusShuffle(s: SparkSession, dir: String): DataFrame = {
    val keyed = docs(s, dir).select(col("doc_id"),
      fingerprint(concat(lit("shuffle:42:"), col("doc_id").cast("string")))
        .as("h"))
    graft.operators.GlobalRank.byKey(keyed,
        Seq(col("h").asc, col("doc_id").asc), "shuffle_pos")
      .select(col("doc_id"), col("h"), col("shuffle_pos"))
      .orderBy(col("shuffle_pos"))
  }

  /** P08: epoch manifest — the artifact a training run's dataloader
    * actually consumes, composing three verified pieces end-to-end: the
    * seeded global shuffle (p07) fixes the epoch's document order, the
    * exact BPE token counts (t11) cost each document, the two-level
    * prefix sum (p02's packer, keyed on the SHUFFLE position) assigns
    * every document its training sequence and offset, and sequences
    * shard round-robin across 8 data-parallel readers. Re-running with
    * the same seed reproduces the identical manifest on any cluster —
    * the resumability property checkpointed training needs.
    *
    * Scale shape: inherits its pieces' — GlobalRank for the order (no
    * single-partition window), SequencePacker for the running total (no
    * single-partition window), per-row tokenization (codegen'd, no
    * shuffle); nothing new shuffles. */
  def p08EpochManifest(s: SparkSession, dir: String): DataFrame = {
    val costed = docs(s, dir).select(col("doc_id"),
      fingerprint(concat(lit("shuffle:42:"), col("doc_id").cast("string")))
        .as("h"),
      bpeTokenCount(col("text")).as("n_bpe"))
    val ordered = graft.operators.GlobalRank.byKey(costed,
      Seq(col("h").asc, col("doc_id").asc), "shuffle_pos")
    graft.operators.SequencePacker.pack(ordered,
        key = "shuffle_pos", nTokens = "n_bpe", seqLen = 2048L)
      .select(col("doc_id"), col("shuffle_pos"), col("n_bpe"),
        col("seq_id"), col("seq_off"), (col("seq_id") % 8L).as("shard"))
      .orderBy(col("doc_id"))
  }

  /** P05: curriculum ordering — the corpus in training order: quality
    * tier 1 first (t14's sampled per-language cutoffs), higher LM score
    * first inside a tier, doc_id breaking ties — the "clean data first"
    * curriculum a staged pretraining run feeds its loader.
    *
    * Scale shape: the global position comes from
    * [[graft.operators.GlobalRank]] — range-repartition by the order
    * key, rank per partition, add broadcast offsets — never the
    * single-partition `row_number() OVER (ORDER BY …)` window. The
    * oracle replays the rank exactly because the order key
    * (tier, score, doc_id) is unique. */
  def p05Curriculum(s: SparkSession, dir: String): DataFrame =
    graft.operators.GlobalRank.byKey(
      docTiers(s, dir),
      Seq(col("tier").asc, col("score_ppm").desc, col("doc_id").asc),
      "curriculum_pos")
      .select(col("doc_id"), col("lang"), col("score_ppm"), col("tier"),
        col("curriculum_pos"))
      .orderBy(col("curriculum_pos"))

  /** P06: leakage-safe train/val/test split — the hold-out assignment a
    * pretraining corpus actually needs: near-duplicate documents must
    * never straddle splits, or a test document with a train-side
    * near-copy leaks its answer into training (the benchmark-inflation
    * mechanism Lee et al. 2021 measure). Each document's split KEY is
    * its d08 dup-cluster id (min doc_id of the component; unpaired
    * documents key on themselves), so every near-dup cluster moves into
    * a split as one unit; the key's fingerprint mod 10 buckets 80/10/10
    * into train/val/test — content-keyed like r01/r02, never `rand()`,
    * so assignments survive reruns, repartitions, and corpus appends
    * (an appended doc joins its cluster's existing split instead of
    * reshuffling anything).
    *
    * Scale shape: the cluster table holds only PAIRED documents — a
    * tiny fraction of any deduped corpus — so the join back is one
    * equi-join on doc_id with a small right side (AQE broadcasts it);
    * bucketing is a map-side expression. Nothing new shuffles the
    * corpus. */
  def p06LeakageSplit(s: SparkSession, dir: String): DataFrame = {
    // the session-cached d08 cluster stage IS this derivation
    // (DupClusters.clusters over the corpus LSH pair list) — re-running
    // the min-label iteration here paid the whole O(diameter) loop a
    // second time per sweep (measured 5.0 s vs d08's 0.07 s on the same
    // labels; guide §1.2 "don't compute things you throw away")
    val cl = corpusDupLabels(s, dir)
      .select(col("id").as("doc_id"), col("lbl"))
    val keyed = docs(s, dir).select(col("doc_id"))
      .join(cl, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("lbl"), col("doc_id")).as("split_key"))
    val bkt = fingerprint(col("split_key").cast("string")) % lit(10L)
    keyed
      .select(col("doc_id"), col("split_key"),
        when(bkt === 0L, lit("test")).when(bkt === 1L, lit("val"))
          .otherwise(lit("train")).as("split"))
      .orderBy(col("doc_id"))
  }

  /** R04: per-source document cap — the anti-domination move of
    * C4/RefinedWeb-style curation: no source (domain) may contribute
    * more than `cap` documents, the survivors selected by hash-rank —
    * deterministic and content-independent, so the same documents
    * survive on any cluster size, any partitioning, and every rerun.
    *
    * Scale shape: the per-source selection is
    * [[graft.functions.BottomKByHash]] — a mergeable partial aggregate
    * whose buffers are 2·cap longs, so no window ever funnels one
    * source's documents through a single partition (the per-group-sort
    * trap t14 also avoids; a `row_number OVER (PARTITION BY source)`
    * would, and web corpora have million-document domains). Kept ids
    * explode back out of the buffers: one shuffle of id pairs, total
    * output bounded by sources × cap. */
  def r04SourceCap(s: SparkSession, dir: String): DataFrame = {
    val cap = 10
    docs(s, dir)
      .select(col("source"), col("doc_id"),
        fingerprint(col("doc_id").cast("string")).as("fp"))
      .groupBy(col("source"))
      .agg(BottomKByHash.column(col("fp"), col("doc_id"), cap).as("pairs"))
      .select(col("source"),
        explode(expr("filter(pairs, (x, i) -> i % 2 = 1)")).as("doc_id"))
      .orderBy(col("source"), col("doc_id"))
  }

  /** P03: training-export manifest — the shard layout + checksums that
    * [[graft.operators.TrainingExport.export]] writes next to a curated
    * corpus, computed as a pure query (no files) so the oracle can verify
    * it: shard = fingerprint(key) mod 8 (content-keyed — stable across
    * retries/layouts), checksum = XOR of per-row content fingerprints
    * (order-independent, so any engine reading shards in any order
    * reproduces it). One shuffle (the groupBy). */
  def p03ExportManifest(s: SparkSession, dir: String): DataFrame =
    graft.operators.TrainingExport.manifestOf(
      docs(s, dir).select(col("doc_id"), col("lang"), col("text")),
      key = "doc_id", nShards = 8)

  /** A02: KMV approximate distinct count per language, next to the exact
    * count it approximates ([[graft.functions.KmvSketch]]). The sketch is
    * associative — map-side partial aggregation, only k-long buffers cross
    * the shuffle — which is how COUNT(DISTINCT) survives 100 TB. Unlike
    * HLL (`approx_count_distinct`), the estimate is deterministic
    * arithmetic over the engine's own fingerprint hash, so the oracle
    * reproduces it bit-for-bit (k-th smallest distinct hash + the same
    * (k-1)·M/h_k formula). */
  def a02KmvDistinct(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("lang"), fingerprint(col("text")).as("h"))
      .groupBy(col("lang"))
      .agg(countDistinct(col("h")).as("n_exact"),
        round(graft.functions.KmvSketch.column(col("h"), 64), 4)
          .as("kmv_est"))
      .orderBy(col("lang"))

  /** A06: KMV sketch set algebra — distinct-cardinality estimates for
    * UNIONS and INTERSECTIONS of groups, read off merged sketch buffers
    * (the Theta-sketch capability, Dasgupta et al. 2016): union buffer =
    * sort-merge-truncate of two k-minimum buffers (pure array ops),
    * intersection by inclusion–exclusion. Corpus analytics asks exactly
    * this ("how many distinct documents across en+de?", "how much do
    * they share?") without re-scanning anything.
    *
    * Scale shape — the point of the buffer form: ONE corpus pass builds
    * a k-long buffer per group ([[graft.functions.KmvSketch]] partial
    * aggregation); every pairwise estimate after that is arithmetic on
    * k-long arrays — at 100 TB the pair matrix costs nothing, where the
    * exact readout (reported alongside, per sketch-family convention)
    * needs a fingerprint self-join per pair. Estimates are the same
    * exact-arithmetic form the a02 oracle replays bit-for-bit. */
  def a06SketchAlgebra(s: SparkSession, dir: String): DataFrame = {
    val k = 64
    val fps = docs(s, dir)
      .select(col("lang"), fingerprint(col("text")).as("h")).distinct()
    val bufs = fps.groupBy(col("lang"))
      .agg(graft.functions.KmvSketch.bufferColumn(col("h"), k).as("buf"),
        count(lit(1)).as("n_exact"))
    def est(b: Column): Column =
      when(size(b) < k, size(b).cast("double"))
        .otherwise(lit(63.0d * 1000000007L) / element_at(b, k))
    val a = bufs.select(col("lang").as("lang_a"), col("buf").as("ba"),
      col("n_exact").as("na"))
    val b = bufs.select(col("lang").as("lang_b"), col("buf").as("bb"),
      col("n_exact").as("nb"))
    val pairs = a.join(b, col("lang_a") < col("lang_b"))
      .withColumn("mu", slice(array_sort(array_union(col("ba"), col("bb"))),
        1, k))
    val inter = fps.as("x").join(fps.as("y"),
        col("x.h") === col("y.h") && col("x.lang") < col("y.lang"))
      .groupBy(col("x.lang").as("lang_a"), col("y.lang").as("lang_b"))
      .agg(count(lit(1)).as("ni"))
    pairs.join(inter, Seq("lang_a", "lang_b"), "left")
      .select(col("lang_a"), col("lang_b"),
        round(est(col("ba")), 4).as("est_a"),
        round(est(col("bb")), 4).as("est_b"),
        round(est(col("mu")), 4).as("est_union"),
        round(greatest(lit(0.0d),
          est(col("ba")) + est(col("bb")) - est(col("mu"))), 4)
          .as("est_inter"),
        (col("na") + col("nb") - coalesce(col("ni"), lit(0L)))
          .as("n_union_exact"),
        coalesce(col("ni"), lit(0L)).as("n_inter_exact"))
      .orderBy(col("lang_a"), col("lang_b"))
  }

  /** T10: text canonicalization — the normalize-before-dedup step (lower,
    * trim, collapse runs of whitespace to one space). Exact dedup on raw
    * bytes misses trivially reformatted copies; deduping on the canonical
    * fingerprint catches them. Output: the canonical-form fingerprint and
    * how many characters normalization removed — both deterministic, both
    * replayed by the oracle (DuckDB regexp_replace needs the 'g' flag to
    * match Spark's replace-all default). */
  def t10Normalize(s: SparkSession, dir: String): DataFrame = {
    val canon = lower(regexp_replace(trim(col("text")), "\\s+", " "))
    docs(s, dir).select(col("doc_id"),
        fingerprint(canon).as("canon_fp"),
        (length(col("text")) - length(canon)).cast("long").as("delta_len"))
      .orderBy(col("doc_id"))
  }

  /** T11: exact byte-BPE token count next to the t01 regex estimate —
    * the published-merges-format tokenizer a sequence-length budget
    * should be computed with. Runs through the vocab-size-independent
    * [[graft.plans.BpeCount]] encode-loop expression (the t19 scale
    * path), while the ORACLE still replays the per-rule replace chain
    * the old Column form ([[TextFunctions.bpeTokenCount]]) compiled —
    * so this query's green hash is itself the proof that the encode
    * loop and the rank-order replace chain agree on a well-formed
    * table. */
  def t11BpeTokens(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
        graft.plans.BpeCount(col("text"), t11Codec).as("n_bpe"),
        bpeCount(col("text")).as("n_bpe_est"))
      .orderBy(col("doc_id"))

  /** The t11 fixture table as a codec (built once per JVM). */
  private lazy val t11Codec =
    new graft.functions.BpeCodec(graft.functions.TextFunctions.BpeMerges)

  /** T19: t11 at REALISTIC vocabulary scale — exact BPE token counts
    * under a deterministic 40,000-merge table
    * ([[graft.functions.BpeVocab.synthetic]], the merges.txt family the
    * t18 trainer emits). The replace-chain form is structurally unable
    * to express this (one plan node per rule); the encode-loop
    * expression is O(word²) per word regardless of vocabulary size,
    * with the table shipped once per stage as a plan constant.
    *
    * The query runs on the deterministic doc_id % 11 sample (~1/11 of
    * the corpus) so it can be HASH-CHECKED: a full 40k-round replace
    * chain is inexpressible in SQL, but for a bounded word set only the
    * rules whose OUTPUT occurs as a substring of some corpus word can
    * ever fire (a merge needs its halves adjacent — i.e. its output
    * present), so the oracle replays the rank-order replace chain over
    * exactly that filtered rule subset (22 of 40,000 against this
    * corpus's 31-word vocabulary, embedded at generation; the oracle
    * poisons every row to NULL if the corpus ever contains an
    * out-of-vocabulary word, turning drift into a loud hash mismatch,
    * never a silent pass). Nothing is lost on the full-corpus side:
    * per-word encode cost is vocabulary-independent (the codec's whole
    * point), and t11 already hash-checks the same encode loop over the
    * ENTIRE corpus at the 35-rule table. Exactness at scale is further
    * pinned by `BpeCodecSpec` against an independent encoder. Output
    * schema mirrors t11 plus the compression ratio a budget planner
    * reads (chars per token, the number a 50k vocab exists to raise). */
  def t19BpeVocabScale(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .where(col("doc_id") % 11 === 0)
      .select(col("doc_id"),
        graft.plans.BpeCount(col("text"), t19Codec).as("n_bpe"),
        round(col("n_chars").cast("double") /
          greatest(graft.plans.BpeCount(col("text"), t19Codec), lit(1L)),
          4).as("chars_per_token"))
      .orderBy(col("doc_id"))

  /** The 40k-merge synthetic vocabulary (built once per JVM: ~40k-entry
    * hash map, the size a real tokenizer ships). */
  private lazy val t19Codec =
    new graft.functions.BpeCodec(graft.functions.BpeVocab.synthetic(40000))

  /** A03: Count-Min frequency sketch — estimated counts for the top-20
    * tokens next to their exact counts. The CMS table is 4 rows × W
    * cells of pure counter sums, so it is commutative/associative
    * (map-side partial agg, order-independent — unlike Misra-Gries-style
    * sketches whose state depends on arrival order, CMS is exactly
    * replayable in the oracle). estimate = min over rows of the token's
    * cell counter, always ≥ exact; collisions show up as the overshoot.
    * Scale shape: building the sketch is one shuffle of (row, cell)
    * pairs into 4096 cells REGARDLESS of corpus size — the
    * frequency-table move when the exact groupBy (t06) is too wide.
    * Width 32 is deliberately small for this vocabulary so collisions
    * actually occur and the overshoot is exercised, not just claimed. */
  def a03CmsFreq(s: SparkSession, dir: String): DataFrame = {
    val W = 32L
    def cellsOf(f: Column) = array((0 until 4).map(i =>
      (f * (2 * i + 3) + (11 + i)) % Mod % W): _*)
    val toks = docs(s, dir)
      .select(explode(tokens(col("text"))).as("tok"))
      .select(col("tok"), fingerprint(col("tok")).as("f"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cms = toks
      .select(posexplode(cellsOf(col("f"))).as(Seq("i", "cell")))
      .groupBy(col("i"), col("cell")).agg(count(lit(1)).as("c"))
    val top = toks.groupBy(col("tok"), col("f"))
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("tok").asc)
      .limit(20)
    top.select(col("tok"), col("n_exact"),
        posexplode(cellsOf(col("f"))).as(Seq("i", "cell")))
      .join(cms, Seq("i", "cell"))
      .groupBy(col("tok"), col("n_exact"))
      .agg(min(col("c")).as("n_cms"))
      .orderBy(col("n_exact").desc, col("tok").asc)
  }

  /** R02: fixed-size deterministic sample — exactly min(20, group size)
    * docs per language, chosen as the 20 smallest text fingerprints
    * (ties broken by doc_id). Rate-based sampling (r01) cannot promise a
    * sample SIZE; hash-rank sampling does, stays reproducible across
    * engines/retries/cluster sizes (never rand()), and the rank-≤-k
    * filter compiles to Spark's WindowGroupLimit — per-partition top-k
    * then a k·groups-sized merge, no global sort. */
  def r02TopkSample(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    docs(s, dir)
      .select(col("doc_id"), col("lang"), fingerprint(col("text")).as("h"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 20)
      .select(col("doc_id"), col("lang"), col("rk"))
      .orderBy(col("lang"), col("rk"))
  }

  /** R03: temperature-rescaled source sampling — the multilingual-LM
    * mixture move (α-scaling of mC4/XLM-R): a source's share of the
    * sample budget is proportional to mass^α with α = 1/2, so heavy
    * sources are down-weighted and light sources up-weighted relative to
    * proportional sampling. Mass is the source's total character count.
    *
    * Determinism contract: the only float op is one IEEE `sqrt` (correctly
    * rounded in any engine), immediately floored to an integer weight;
    * budget allocation is then exact integer largest-remainder (base =
    * N·w div Σw, the N − Σbase leftovers go to the largest remainders,
    * ties by source name), and document selection inside a source is the
    * r02 fingerprint-rank machinery. No float thresholds anywhere.
    *
    * Scale shape: the per-source weight/quota table is k rows (broadcast
    * back); the corpus pays one window rank per stratum — same note as
    * p04: at 100 TB swap the dynamic-quota rank for a two-pass
    * hash-threshold select. */
  def r03TemperatureSample(s: SparkSession, dir: String): DataFrame = {
    val N = 200L
    val d = docs(s, dir).select(col("doc_id"), col("source"),
      col("n_chars"), fingerprint(col("text")).as("h"))
    val all = Window.partitionBy()
    val byRem = Window.partitionBy().orderBy(col("rem").desc, col("source"))
    val quotas = d.groupBy(col("source"))
      .agg(sum(col("n_chars")).as("mass"))
      .withColumn("wgt", floor(sqrt(col("mass").cast("double"))))
      .withColumn("sw", sum(col("wgt")).over(all))
      .withColumn("base", expr(s"$N * wgt div sw"))
      .withColumn("rem", expr(s"($N * wgt) % sw"))
      .withColumn("leftn", lit(N) - sum(col("base")).over(all))
      .withColumn("pos", row_number().over(byRem).cast("long"))
      .select(col("source"),
        (col("base") + when(col("pos") <= col("leftn"), 1L).otherwise(0L))
          .as("quota"))
    val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    d.join(broadcast(quotas), Seq("source"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= col("quota"))
      .select(col("source"), col("doc_id"), col("rk"))
      .orderBy(col("source"), col("rk"))
  }

  /** P04: data-mixture builder — the step that turns "train on 40% en,
    * the rest split evenly" into per-language keep quotas and a
    * deterministic document selection. Quota math is exact integer
    * rationals (target fraction num/den, feasible corpus size
    * N = min over langs of n_l·den_l div num_l, quota_l = N·num_l div
    * den_l) so both engines agree without float thresholds; selection is
    * the r02 hash-rank machinery (smallest fingerprints up to the quota —
    * reproducible across retries/engines/layouts).
    *
    * Scale shape: the per-lang count/quota table is k rows (broadcast);
    * the corpus pays one window rank per stratum. The quota is dynamic
    * per group, so Spark's static WindowGroupLimit cannot apply — at
    * 100 TB swap the rank for a two-pass hash-threshold select (count →
    * per-group k-th-smallest-hash cutoff → stateless filter). */
  def p04DataMixture(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
      .select(col("doc_id"), col("lang"), fingerprint(col("text")).as("h"))
    val all = Window.partitionBy()
    val quotas = d.groupBy(col("lang")).agg(count(lit(1)).as("n_in"))
      .withColumn("k", count(lit(1)).over(all))
      .withColumn("num", when(col("lang") === "en", 2L).otherwise(3L))
      .withColumn("den", when(col("lang") === "en", lit(5L))
        .otherwise(lit(5L) * (col("k") - 1)))
      .withColumn("cap", expr("n_in * den div num"))
      .withColumn("bigN", min(col("cap")).over(all))
      .withColumn("quota", expr("bigN * num div den"))
      .select(col("lang"), col("n_in"), col("quota"))
    val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    val kept = d.join(broadcast(quotas.select(col("lang"), col("quota"))),
        Seq("lang"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= col("quota"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"),
        min(col("doc_id")).as("keep_min"), max(col("doc_id")).as("keep_max"))
    // left join from quotas: a starved stratum (quota 0 — possible when a
    // minority language cannot support the target mix) must still appear
    // in the report with n_kept = 0, matching the oracle's LEFT JOIN
    quotas.join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_in"), col("quota"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        col("keep_min"), col("keep_max"))
      .orderBy(col("lang"))
  }

  /** L01: Z-order layout keys — the Morton key of (char-length band,
    * token-count band) per document plus its 8-way file bucket
    * ([[graft.operators.ZOrder]]). Sorting an export by this key gives
    * parquet min/max data skipping on BOTH dimensions at once, where the
    * single-key sort only prunes one — the layout move for corpora
    * filtered by more than one axis. Pure shift/mask arithmetic, so the
    * oracle replays the key bit-for-bit. */
  def l01ZorderLayout(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"),
      col("n_chars").bitwiseAND(lit(255L)).as("za"),
      size(tokens(col("text"))).cast("long").bitwiseAND(lit(255L)).as("zb"))
    d.withColumn("zkey", graft.operators.ZOrder.zValue(col("za"), col("zb"), 8))
      .withColumn("bucket", expr("zkey div 8192"))
      .orderBy(col("doc_id"))
  }

  /** L02: CDC snapshot merge — the standing corpus refreshed by a change
    * batch through [[graft.operators.SnapshotMerge]] (bucketed MERGE
    * INTO: upserts + deletes, last writer wins). The standing side is
    * every document at version 1; the delta re-crawls documents with
    * doc_id % 7 == 3 (version 2: text gains a ' v2' suffix, n_chars
    * grows by 3) and takes down documents with doc_id % 13 == 5
    * (version 3 deletes — outranking the re-crawl where both hit the
    * same doc). Output is the merged corpus: untouched docs at v1,
    * re-crawled at v2 with the new content fingerprint, deleted docs
    * absent.
    *
    * Scale shape: the snapshot is bucketed by doc_id and scanned ONCE
    * with no Exchange (`SnapshotMergeSpec` pins it); only the
    * winner-per-key delta aggregate shuffles. This is the lakehouse
    * MERGE the corpus-refresh cycle runs at 100 TB — the data sibling
    * of d11's signature-snapshot probe. */
  def l02SnapshotMerge(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(col("doc_id"), col("source"),
      col("n_chars"), fingerprint(col("text")).as("f1"),
      fingerprint(concat(col("text"), lit(" v2"))).as("f2"))
    val snap = base.select(col("doc_id"), lit(1L).as("version"),
      col("source"), col("n_chars"), col("f1").as("content_fp"))
    graft.operators.SnapshotMerge.writeSnapshot(snap, "l02_snapshot",
      "doc_id")
    val delta = base.where(col("doc_id") % 7 === 3)
      .select(col("doc_id"), lit(2L).as("version"), lit("U").as("op"),
        col("source"), (col("n_chars") + 3L).as("n_chars"),
        col("f2").as("content_fp"))
      .unionByName(base.where(col("doc_id") % 13 === 5)
        .select(col("doc_id"), lit(3L).as("version"), lit("D").as("op"),
          col("source"), col("n_chars"), col("f1").as("content_fp")))
    graft.operators.SnapshotMerge.merge(s, "l02_snapshot", delta, "doc_id")
      .orderBy(col("doc_id"))
  }

  /** L03: time travel over the commit-protocol snapshot table — l02's
    * merge run under [[graft.operators.SnapshotMerge.mergeCommitRetain]],
    * which retains each superseded snapshot beside its commit epoch, then
    * the corpus read back AS OF every epoch (the Delta/Iceberg
    * `VERSION AS OF` affordance: a training run pins the exact corpus
    * state it read even after later refreshes land). Epoch 0 is the
    * seeded snapshot, epoch 1 after the upsert batch, epoch 2 after the
    * delete batch; the oracle replays each state relationally.
    *
    * Scale shape: retention is one O(1) catalog rename per commit inside
    * the [[graft.operators.TableCommit]] lock — no data moves, the
    * bucketed files stay where they are (`TimeTravelSpec` pins that a
    * versioned read still plans Exchange-free on the snapshot side). */
  def l03TimeTravel(s: SparkSession, dir: String): DataFrame = {
    val T = "l03_snapshot"
    // reset whatever a prior invocation left in this warehouse/session —
    // retained versions, a crashed stage, the epoch file — so the query
    // is replayable (same recovery-first posture as writeSnapshot)
    s.catalog.listTables().collect().map(_.name)
      .filter(n => n == T || n.startsWith(s"${T}__v") ||
        n.startsWith(s"${T}_c"))
      .foreach(n => s.sql(s"DROP TABLE IF EXISTS `$n`"))
    graft.operators.TableCommit.reset(s, T)
    val base = docs(s, dir).select(col("doc_id"), lit(1L).as("version"),
      col("source"), col("n_chars"),
      fingerprint(col("text")).as("content_fp"))
    graft.operators.SnapshotMerge.writeSnapshot(base, T, "doc_id")
    val d1 = docs(s, dir).where(col("doc_id") % 7 === 3)
      .select(col("doc_id"), lit(2L).as("version"), lit("U").as("op"),
        col("source"), (col("n_chars") + 3L).as("n_chars"),
        fingerprint(concat(col("text"), lit(" v2"))).as("content_fp"))
    graft.operators.SnapshotMerge.mergeCommitRetain(s, T, d1, "doc_id")
    val d2 = docs(s, dir).where(col("doc_id") % 13 === 5)
      .select(col("doc_id"), lit(3L).as("version"), lit("D").as("op"),
        col("source"), col("n_chars"),
        fingerprint(col("text")).as("content_fp"))
    graft.operators.SnapshotMerge.mergeCommitRetain(s, T, d2, "doc_id")
    (0L to 2L).map(e =>
      graft.operators.SnapshotMerge.readAt(s, T, e)
        .select(lit(e).as("epoch"), col("doc_id"), col("version"),
          col("source"), col("n_chars"), col("content_fp")))
      .reduce(_.unionByName(_))
      .orderBy(col("epoch"), col("doc_id"))
  }

  // ---- deduplication ----------------------------------------------------

  /** D01: exact dedup — hash-groupBy on full text, keep the min doc_id.
    * At scale this groups by fingerprint first (cheap shuffle key) and
    * only compares full text within a fingerprint bucket. */
  def d01DedupExact(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))

  /** D02: n-gram Jaccard near-dedup — exact pairwise Jaccard ≥ 0.8 over
    * 3-word shingles. Quadratic in co-shingled docs; D03 is the scale path. */
  def d02NgramJaccard(s: SparkSession, dir: String): DataFrame =
    corpusJaccardPairs(s, dir)
      .select(col("a"), col("b"), round(col("jac"), 4).as("jac"))
      .orderBy(col("a"), col("b"))

  /** D03: MinHash+LSH near-dedup — 16 minhash perms, 4 bands × 4 rows;
    * candidates = docs sharing a band key (equi-join, linear-ish at scale),
    * then exact-Jaccard verification at 0.8 on candidates only. */
  def d03MinhashLsh(s: SparkSession, dir: String): DataFrame =
    corpusLshPairs(s, dir)
      .select(col("a"), col("b"), round(col("jac"), 4).as("jac"))
      .orderBy(col("a"), col("b"))

  /** MinHash-LSH near-dup pairs (a < b, exact Jaccard ≥ 0.8 verified on
    * LSH candidates only) over any (doc_id, text) frame — the d03 engine,
    * reused by the P01 curation pipeline on its filtered corpus. */
  private def minhashNearDupPairs(d: DataFrame,
      fpPre: Option[DataFrame] = None): DataFrame = {
    // shared by the signature pipeline AND the exact-verify stage — one
    // materialization, not one recompute per consumer (see jaccardPairs).
    // Callers over the canonical corpus pass the session-cached table
    // (corpusFps) so a sweep shares it across the whole dedup family.
    val fp = fpPre.getOrElse(shingleFps(d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val sig = fp.groupBy(col("doc_id"))
      .agg(min(minhashPerm(col("f"), 0)).as("m0"),
        (1 until 16).map(i => min(minhashPerm(col("f"), i)).as(s"m$i")): _*)
    val bandKeys = (0 until 4).map(b =>
      concat_ws(",", (0 until 4).map(r => col(s"m${4 * b + r}")): _*))
    val bands = sig.select(col("doc_id"),
      posexplode(array(bandKeys: _*)).as(Seq("band", "key")))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // LSH must SAVE work, not just filter output: semi-join the fingerprint
    // set down to candidate docs first, so exact Jaccard (the quadratic
    // part) runs only over co-shingled pairs of candidates.
    val candDocs = cand.select(col("a").as("doc_id"))
      .union(cand.select(col("b").as("doc_id"))).distinct()
    jaccardPairs(fp, Some(candDocs)).join(cand, Seq("a", "b"))
      .where(col("jac") >= 0.8d)
      .select(col("a"), col("b"), col("jac"))
  }

  /** D08: near-dup clusters — connected components over the d03 MinHash-LSH
    * pair list ([[graft.operators.DupClusters]], iterated min-label
    * propagation: O(component diameter) shuffle rounds, and dup components
    * are dense copies of one source so the loop converges in 2-4 rounds).
    * Output: every paired doc with its cluster id (= min doc id of the
    * component) and whether it is the cluster's canonical survivor — the
    * step that turns pair detection into an actually deduplicated corpus
    * (drop `is_canon = 0` with one anti-join). Oracle: recursive CTE over
    * the identical pair list. */
  def d08DupClusters(s: SparkSession, dir: String): DataFrame =
    corpusDupLabels(s, dir)
      .select(col("id").as("doc_id"), col("lbl").as("cluster_id"),
        (col("id") === col("lbl")).cast("long").as("is_canon"))
      .orderBy(col("doc_id"))

  /** D09: fuzzy near-dup by banded edit distance — catches small-edit
    * variants (OCR noise, typos, template slots) that exact hashing and
    * shingle overlap both miss. Candidates come from a (lang, length-band)
    * equi-join — Levenshtein ≤ d implies a length difference ≤ d, so an
    * 8-wide band plus its two neighbors provably covers every qualifying
    * pair and the O(n²·len²) DP runs only inside bands. The corpus has no
    * organic typo variants, so the right side is a deterministic
    * noisified copy ('e'→'3' on the 48-char prefix, the t07 injection
    * pattern) and the oracle verifies real nonzero distances
    * cross-engine. */
  def d09EditDistance(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("lang"),
      substring(col("text"), 1, 48).as("pfx"), col("n_chars"),
      expr("n_chars div 8").as("bkt"))
    val probes = d.select(col("doc_id").as("a"), col("lang"),
      col("pfx").as("pa"), col("n_chars").as("la"),
      explode(array(col("bkt") - 1, col("bkt"), col("bkt") + 1))
        .as("pb_bkt"))
    val variants = d.select(col("doc_id").as("b"), col("lang").as("vlang"),
      translate(col("pfx"), "e", "3").as("vb"), col("n_chars").as("lb"),
      col("bkt").as("vbkt"))
    // threshold form: levenshtein(l, r, 8) runs the BANDED DP (O(len·th)
    // cells with early exit, vs O(len²) for the plain form) and returns
    // -1 above the threshold — on the ~10⁶ banded candidate pairs the
    // filter scans, that is the whole hot loop (guide §1.2 step 2:
    // per-task work). For surviving pairs (dist ≤ 8) the returned value
    // IS the exact distance, so the output is unchanged.
    probes.join(variants,
        col("lang") === col("vlang") && col("pb_bkt") === col("vbkt") &&
          col("a") < col("b"))
      .where(abs(col("la") - col("lb")) <= 8 &&
        levenshtein(col("pa"), col("vb"), 8) >= 0)
      .select(col("a"), col("b"),
        levenshtein(col("pa"), col("vb"), 8).cast("long").as("dist"))
      .orderBy(col("a"), col("b"))
  }

  /** D10: LSH recall evaluation — the accuracy readout for the scale
    * path: of all exact-tier near-dup pairs (d02, Jaccard ≥ 0.8), what
    * fraction did the banded MinHash-LSH candidates (d03) find? d03
    * exact-verifies its candidates, so its pairs are a subset of d02's
    * and the ratio IS the LSH recall (16 perms / 4×4 bands ⇒ a 0.8-similar
    * pair escapes only if no band matches). The dedup twin of s05's ANN
    * recall — run it before trusting the scale tier on a new corpus. */
  def d10LshRecall(s: SparkSession, dir: String): DataFrame = {
    val exact = corpusJaccardPairs(s, dir).select(col("a"), col("b"))
    val lsh = corpusLshPairs(s, dir).select(col("a"), col("b"))
    exact.join(lsh, Seq("a", "b"), "left_semi")
      .agg(count(lit(1)).as("n_found"))
      .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
      .select(col("n_exact"), col("n_found"),
        // vacuous recall = 1.0 when there are no exact pairs (a new-corpus
        // run with zero dups must not divide by zero — and Spark's NULL
        // vs DuckDB's x/0 behavior would diverge)
        when(col("n_exact") === 0L, lit(1.0d))
          .otherwise(round(col("n_found") * lit(1.0d) / col("n_exact"), 4))
          .as("recall"))
  }

  /** D11: incremental snapshot–delta dedup — the production shape batch
    * d02/d03 cannot express: dedup a NEW batch against the standing
    * corpus's materialized signature snapshot without re-pairing the
    * standing side ([[graft.operators.IncrementalDedup]]; the snapshot is
    * band-key BUCKETED so only the delta shuffles — `PlanQualitySpec`
    * pins the Exchange-free snapshot scan). Standing/delta split is
    * deterministic (doc_id mod 5) so the oracle replays both sides; the
    * confirm rule is signature agreement ≥ 0.5, the same estimate the
    * streaming tier uses, making batch-incremental and streaming answers
    * agree by construction. */
  def d11IncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    // both sides' band tables derive from the session-cached corpus
    // fingerprints (the same stage d02/d03/d04/d08/d10 share) — the
    // standing corpus is NOT re-tokenized to build its snapshot
    val bands = graft.streaming.StreamingDedup
      .withBandsFromFps(corpusFps(s, dir))
    graft.operators.IncrementalDedup.writeSnapshotBands(
      bands.where(col("doc_id") % 5 =!= 0), "d11_snapshot")
    graft.operators.IncrementalDedup.dedupDeltaBands(s,
        docs(s, dir).where(col("doc_id") % 5 === 0).select(col("doc_id")),
        bands.where(col("doc_id") % 5 === 0), "d11_snapshot")
      .orderBy(col("doc_id"))
  }

  /** D12: duplicated-substring spans — substring-level exact dedup (the
    * Lee et al. 2021 "Deduplicating Training Data Makes Language Models
    * Better" shape): slide a fixed 6-token window over every document and
    * report the spans that recur across documents, ranked by reach. Doc-
    * level dedup (d01–d06) misses exactly these — boilerplate headers,
    * license blocks, templated sentences embedded in otherwise-unique
    * documents — and they are what LMs memorize verbatim.
    *
    * Scale shape: one shuffle, the groupBy on the span key, with map-side
    * partial aggregation; no join, no cartesian. At 100 TB the group key
    * becomes the span's ~2^60 pair-of-primes fingerprint (8 B vs ~40 B of
    * text — fingerprintWide, the d14 key, replayed by the oracle) with
    * `min(span)` carried as the
    * representative, and adjacent reported spans are merged into maximal
    * duplicated segments in a per-doc post-pass — neither changes the
    * candidate set this query declares. */
  def d12SubstringSpans(s: SparkSession, dir: String): DataFrame = {
    val W = 6
    val toks = docs(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .where(size(col("w")) >= W)
    val spans = toks.select(col("doc_id"),
      explode(expr(s"transform(sequence(1, size(w) - ${W - 1}), " +
        s"i -> concat_ws(' ', slice(w, i, $W)))")).as("span"))
    spans.groupBy(col("span"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .where(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("span"))
      .limit(100)
      .select(col("span"), col("n_docs"), col("n_occ"))
  }

  /** D14: MAXIMAL duplicated segments + duplicated-bytes-per-doc — the
    * post-pass d12's scaladoc names (Lee et al. 2021): d12 reports the
    * raw 6-token windows that recur across documents, but overlapping
    * windows of one long duplicate over-count it; curation budgets on
    * the DUPLICATED BYTES of each document. Per document, the duplicated
    * windows' token intervals [i, i+5] merge wherever their coverage is
    * contiguous or overlapping (next start ≤ prev start + 6) into
    * maximal segments, and each segment's char extent is measured on the
    * whitespace-NORMALIZED text (tokens joined by one space — the only
    * form both engines can address bytes of identically).
    *
    * Scale shape: the duplicate-window set is d12's one groupBy, but
    * keyed by the span's ~2^60 pair-of-primes FINGERPRINT
    * ([[graft.functions.TextFunctions.fingerprintWide]] — two
    * independent sub-2^30 rolling hashes packed into one long; a single
    * mod-1e9+7 key would birthday-collide across the billions of spans
    * a full corpus yields, silently marking unrelated windows as
    * cross-document duplicates), not its text —
    * unlike d12 this query's output never exposes the span, so nothing
    * forces ~40 B string shuffle keys where 8 B hashes do (the
    * d15/d19 segment-key precedent; the oracle replays the same
    * PolyHash so a collision would hit both engines identically);
    * membership is an equi-join back on the same fingerprint (never
    * broadcast — the dup set is corpus-dependent); the islands pass
    * (lag + running sum) and the segment fold run in PER-DOCUMENT
    * windows — partitionBy(doc_id), bounded by document length, no
    * global window anywhere. Char extents come from joining segments
    * back to the doc's token array once (segments per doc are few)
    * rather than materializing per-token prefix sums. */
  def d14MaxDupSegments(s: SparkSession, dir: String): DataFrame = {
    val Wn = 6
    val toks = docs(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .where(size(col("w")) >= Wn)
    val spans = toks.select(col("doc_id"),
      explode(expr(s"transform(sequence(1, size(w) - ${Wn - 1}), " +
        s"i -> struct(i as i, concat_ws(' ', slice(w, i, $Wn)) as span))"))
        .as("x"))
      .select(col("doc_id"), col("x.i").as("i"),
        fingerprintWide(col("x.span")).as("spfp"))
    val dupSpans = spans.groupBy(col("spfp"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .where(col("n_docs") >= 2)
      .select(col("spfp"))
    val hits = spans.join(dupSpans, "spfp")
      .select(col("doc_id"), col("i"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val islands = hits
      .withColumn("new_seg",
        when(col("i") > coalesce(lag(col("i"), 1).over(byDoc),
          lit(Long.MinValue)) + Wn, 1L).otherwise(0L))
      .withColumn("seg", sum(col("new_seg")).over(byDoc))
    val segs = islands.groupBy(col("doc_id"), col("seg"))
      .agg(min(col("i")).as("a"), (max(col("i")) + (Wn - 1)).as("b"))
    segs.join(toks, "doc_id")
      .select(col("doc_id"),
        (col("b") - col("a") + 1).cast("long").as("seg_tokens"),
        // 1-based inclusive char extent on the normalized text: token k
        // starts after the joined length of tokens 1..k-1 plus its
        // leading space (absent for k=1)
        (length(expr("concat_ws(' ', slice(w, 1, b))")) -
          when(col("a") > 1,
            length(expr("concat_ws(' ', slice(w, 1, a - 1))")) + 1)
            .otherwise(lit(0))).cast("long").as("seg_chars"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_segments"),
        sum(col("seg_tokens")).as("dup_tokens"),
        sum(col("seg_chars")).as("dup_chars"))
      .join(toks.select(col("doc_id"),
        length(expr("concat_ws(' ', w)")).cast("long").as("norm_chars")),
        "doc_id")
      .select(col("doc_id"), col("n_segments"), col("dup_tokens"),
        col("dup_chars"),
        round(col("dup_chars").cast("double") / col("norm_chars"), 4)
          .as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  /** D15: paragraph-granularity dedup (the Dolma/CCNet unit-dedup shape).
    * This corpus has no newline paragraphs, so the unit is the
    * deterministic 16-token non-overlapping segment; each segment is
    * fingerprinted and only its GLOBAL first occurrence — min
    * (doc_id, seg_idx) — survives. Unlike d12/d14 (overlapping windows →
    * duplicated-span extents), this is the remove-and-reassemble
    * operation: the output is the per-document removal budget a corpus
    * rewriter applies — how many of its segments drop because an earlier
    * document already contributed them, and how many tokens that frees.
    *
    * Scale shape: explode to n_tokens/16 rows, ONE groupBy on the
    * segment fingerprint (mergeable min-struct partial agg — first
    * occurrence is never computed by a window over the global segment
    * table), join back on fp, then a doc-keyed aggregate. Every shuffle
    * is keyed by fp or doc_id; nothing is quadratic in documents. */
  def d15ParagraphDedup(s: SparkSession, dir: String): DataFrame = {
    val segs = graft.operators.SegmentDedup.segments(docs(s, dir))
    val first = segs.groupBy(col("fp"))
      .agg(min(struct(col("doc_id"), col("seg_idx"))).as("keep"))
    segs.join(first, "fp")
      .select(col("doc_id"), col("seg_ntok"),
        (col("keep.doc_id") =!= col("doc_id") ||
          col("keep.seg_idx") =!= col("seg_idx")).cast("long").as("dup"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_segs"),
        sum(col("dup")).as("n_dup_segs"),
        sum(col("dup") * col("seg_ntok")).as("tokens_removed"))
      .select(col("doc_id"), col("n_segs"), col("n_dup_segs"),
        col("tokens_removed"),
        round(col("n_dup_segs").cast("double") / col("n_segs"), 4)
          .as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  /** D19: incremental paragraph dedup — d15's unit dedup in the d11
    * production shape: the standing corpus (doc_id % 3 ≠ 0 here) is a
    * materialized DISTINCT-fingerprint snapshot bucketed by fp, and the
    * delta batch (doc_id % 3 = 0) probes it — the snapshot side is read
    * bucket-for-bucket with NO Exchange (plan-pinned), only the
    * delta-sized side shuffles. Output is the per-delta-doc removal
    * budget split by cause: segments the standing corpus already has vs
    * segments an earlier delta doc contributed first.
    * [[graft.operators.SegmentDedup]] owns the derivation (shared with
    * d15, so the two tiers provably segment identically);
    * `SegmentDedupSpec` covers the append/admission path. */
  def d19IncrementalParagraph(s: SparkSession, dir: String): DataFrame = {
    val standing = docs(s, dir).where(col("doc_id") % 3 =!= 0)
    val delta = docs(s, dir).where(col("doc_id") % 3 === 0)
    graft.operators.SegmentDedup.writeSnapshot(standing, "d19_seg_snapshot")
    graft.operators.SegmentDedup.dedupDelta(s, delta, "d19_seg_snapshot")
      .orderBy(col("doc_id"))
  }

  /** D16: canonical-document selection per near-dup cluster — the KEEP
    * policy curation applies AFTER d08's clustering: within each
    * connected component of verified near-dup pairs, keep the
    * best-quality member and budget everything else for removal. Quality
    * ranks by an integer lexical-diversity score
    * (distinct_tokens · 10⁶ div tokens — integer so the argmax is
    * engine-order-independent), ties to the lowest doc_id. Output is
    * per-cluster: the keeper, its score, member count, and the
    * characters removal frees — the dedup savings report.
    *
    * Scale shape: labels come from [[graft.operators.DupClusters]]
    * (O(diameter) min-label rounds, large-star fallback); scoring joins
    * on doc_id and the cluster rollup is a mergeable min-struct/sum
    * groupBy on the label — the per-cluster argmax never sorts members,
    * and nothing windows over the corpus. */
  def d16ClusterKeepBest(s: SparkSession, dir: String): DataFrame = {
    val labels = corpusDupLabels(s, dir)
      .select(col("id").as("doc_id"), col("lbl").as("cluster_id"))
    val scored = docs(s, dir)
      .select(col("doc_id"), col("n_chars"), tokens(col("text")).as("w"))
      .select(col("doc_id"), col("n_chars"),
        expr("size(array_distinct(w)) * cast(1000000 as bigint)" +
          " div size(w)").as("score"))
    labels.join(scored, "doc_id")
      .groupBy(col("cluster_id"))
      .agg(min(struct((-col("score")).as("neg"), col("doc_id"))).as("k"),
        count(lit(1)).cast("long").as("n_members"),
        sum(col("n_chars")).as("tot_chars"))
      .join(scored.select(col("doc_id").as("keep_id"),
        col("n_chars").as("keep_chars")),
        col("k.doc_id") === col("keep_id"))
      .select(col("cluster_id"), col("keep_id"),
        (-col("k.neg")).as("keep_score"),
        col("n_members"),
        (col("n_members") - 1).as("n_removed"),
        (col("tot_chars") - col("keep_chars")).as("chars_removed"))
      .orderBy(col("cluster_id"))
  }

  /** D17: semantic decontamination — the embedding-space analog of d07:
    * a held-out evaluation set (vec_id ≡ 0 mod 17, the d07 split
    * pattern) flags training vectors whose cosine similarity reaches
    * 0.3 — catching paraphrased/reworded benchmark leakage that
    * n-gram overlap (d07) cannot see.
    *
    * Scale shape: s03's IVF bucketing — 8 broadcast centroids, both
    * sides land in their 2 nearest cells (broadcast join + a window
    * over K rows per vector), and the contamination check joins ON the
    * cell id — never corpus × eval. K is DELIBERATELY fixed after
    * measuring the alternatives (r10, x10 generated corpus, d18's
    * exact ≥0.3 check as truth; pair volume = nProbe²·n·q/K):
    * K=8/nProbe=2 reads recall 0.9972 at n·q/2 pairs; the √n cell law
    * that fixed s10 (K=256 here) reads 0.60 at the same nProbe (fixed
    * probes do not survive a finer ARBITRARY-centroid partition), and
    * recovering recall by probing nProbe = K/16 cells reads 1.000 but
    * scans n·q — twice the r9 config, and growing with K. LEARNED
    * centroids were measured too and REJECTED: 3 Lloyd rounds at K=256
    * (balanced cells, max 101/78 expected) read 0.6531 at nProbe=2 —
    * barely above arbitrary centroids — because at this corpus's 0.3
    * threshold the exact check flags 18,822 of ~18,824 training
    * vectors (0.3 is noise-level similarity in the synthetic embedding
    * space), so "recall" here measures CELL-COLLISION probability of
    * near-random pairs, which no quantizer improves and coarse cells
    * maximize. The K=8 config is therefore the measured optimum for
    * this row's semantics; a production deployment with a selective
    * threshold (near-copy contamination) is where finer learned cells
    * pay, and the machinery (s08 Lloyd + kFor) exists when the data
    * warrants it. The cell approximation is the declared trade (same
    * accounting as s03 vs s01's brute tier); the oracle replays the
    * bucketing exactly, so approximation never reads as error. */
  def d17SemanticDecontaminate(s: SparkSession, dir: String): DataFrame =
    d17Chain(s, dir, evalCap = Long.MaxValue)

  /** [[d17SemanticDecontaminate]] with the eval side FROZEN to
    * `vec_id < evalCap` — the scale-probe form. The query's own eval
    * set is a corpus split (vec_id ≡ 0 mod 17), so the PROBE SET GROWS
    * WITH THE CORPUS and the x100 scaling exponent carries a q·n
    * quadratic term by construction (r11 measured 1.15 on the growing-
    * eval probe). MEASURED with the eval frozen at the x10 slice
    * (`D17FixedEvalProbe`, SCALING_r12.json): x10/x30/x100 =
    * 3.20/2.56/4.01 s, fitted exponent **0.10** — the engine's own
    * corpus-side growth (broadcast bucketing + cell equi-join) is
    * near-flat at these sizes, and the r11 1.15 reading was probe
    * geometry, now proven rather than argued. */
  def d17FrozenEval(s: SparkSession, dir: String, evalCap: Long)
      : DataFrame = d17Chain(s, dir, evalCap)

  private def d17Chain(s: SparkSession, dir: String, evalCap: Long)
      : DataFrame = {
    val K = 8
    val nProbe = 2
    val e = emb(s, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val cents = e.where(col("vec_id") < K)
      .select(col("vec_id").as("cid"), col("v").as("cv"),
        col("nrm").as("cn"))
    val toCent = e.join(broadcast(cents))
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"),
        round(dot(col("v"), col("cv")) / (col("nrm") * col("cn")), 6)
          .as("csim"))
    val wAsg = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cid"))
    val corpus = toCent.where(col("vec_id") % 17 =!= 0)
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"),
        row_number().over(wAsg).as("rn"))
      .where(col("rn") <= nProbe)
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"))
    val evalProbes = toCent.where(col("vec_id") % 17 === 0 &&
        col("vec_id") < evalCap)
      .select(col("vec_id").as("q"), col("v").as("qv"),
        col("nrm").as("qn"), col("cid"),
        row_number().over(wAsg).as("rn"))
      .where(col("rn") <= nProbe)
      .select(col("q"), col("qv"), col("qn"), col("cid"))
    corpus.join(evalProbes, "cid")
      .select(col("vec_id"), col("q"),
        round(dot(col("v"), col("qv")) / (col("nrm") * col("qn")), 6)
          .as("sim"))
      .where(col("sim") >= 0.3d)
      .distinct() // a pair can meet in both shared cells
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).cast("long").as("n_eval_hits"),
        max(col("sim")).as("max_sim"))
      .orderBy(col("vec_id"))
  }

  /** D18: semantic-decontamination recall — the d10/s05 evaluation twin
    * for d17: of every training vector the EXACT check flags (cosine ≥
    * 0.3 to any eval vector, computed as a broadcast of the full eval
    * side — itself the production-feasible shape when the eval suite is
    * small), what fraction does d17's cell-probed tier flag? One row:
    * exact count, approx count, hits, recall — the number that says
    * whether the cheap tier is safe to ship.
    *
    * Scale shape: the exact side is corpus × (broadcast eval) — one scan
    * of the corpus, linear; the approx side is d17's cell join. Nothing
    * quadratic in the corpus on either side. */
  def d18DecontamRecall(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val evalSide = e.where(col("vec_id") % 17 === 0)
      .select(col("vec_id").as("q"), col("v").as("qv"),
        col("nrm").as("qn"))
    val exact = e.where(col("vec_id") % 17 =!= 0)
      .join(broadcast(evalSide))
      .select(col("vec_id"),
        round(dot(col("v"), col("qv")) / (col("nrm") * col("qn")), 6)
          .as("sim"))
      .where(col("sim") >= 0.3d)
      .select(col("vec_id")).distinct()
    val approx = d17SemanticDecontaminate(s, dir)
      .select(col("vec_id")).distinct()
    exact
      .join(approx.withColumn("found", lit(1L)), Seq("vec_id"), "left")
      .agg(count(lit(1)).cast("long").as("n_exact"),
        sum(coalesce(col("found"), lit(0L))).as("n_hit"))
      .join(approx.agg(count(lit(1)).cast("long").as("n_approx")))
      .select(col("n_exact"), col("n_approx"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_exact"), 4)
          .as("recall"))
  }

  /** D04: SimHash near-dedup — 32-bit signature over shingle fingerprints
    * (bit j = sign of Σ ±1 by parity of an affine re-hash), pairs at
    * Hamming distance ≤ 5.
    *
    * Candidate generation is BANDED, not all-pairs: the 32-bit signature
    * splits into 6 disjoint bit-bands, and Hamming ≤ 5 means the 5
    * differing bits can touch at most 5 bands — pigeonhole guarantees at
    * least one band is bit-identical. So candidates come from a band+key
    * equi-join (shuffle key = band value, linear-ish at corpus scale, no
    * cartesian), and exact Hamming verifies each candidate. Result set is
    * provably identical to the all-pairs formulation — the oracle keeps
    * the straightforward all-pairs SQL. */
  def d04Simhash(s: SparkSession, dir: String): DataFrame = {
    val fp = corpusFps(s, dir)
    val sumCols = (0 until 32).map(j =>
      sum(when((col("f") * (2 * j + 3) + j) % Mod % 2 === 1, 1)
        .otherwise(-1)).as(s"s$j"))
    val sums = fp.groupBy(col("doc_id")).agg(sumCols.head, sumCols.tail: _*)
    // (doc_id, h) is 16 B/row; both self-join sides consume it, and without
    // materialization each side re-runs the 32-way signature aggregation
    val h = sums.select(col("doc_id"),
      (0 until 32).map(j =>
        when(col(s"s$j") > 0, lit(1L) * (1L << j)).otherwise(0L))
        .reduce(_ + _).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // 6 bands over 32 bits: 6+6+6+6+4+4
    val bandSpec = Seq((0, 6), (6, 6), (12, 6), (18, 6), (24, 4), (28, 4))
    val bandKeys = bandSpec.map { case (off, len) =>
      shiftright(col("h"), off).bitwiseAND(lit((1L << len) - 1L))
    }
    val bands = h.select(col("doc_id"), col("h"),
      posexplode(array(bandKeys: _*)).as(Seq("band", "key")))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.h").as("ha"), col("y.h").as("hb"))
      .distinct()
    cand
      .select(col("a"), col("b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .where(col("hamming") <= 5)
      .orderBy(col("a"), col("b"))
  }

  /** D05: embedding-cosine near-dedup — pairs with cosine ≥ 0.45 (this
    * corpus's near-dup band; see BASELINE notes). Brute-force pair join at
    * test scale; S02's LSH bucketing is the 100 TB path. */
  def d05EmbedNearDup(s: SparkSession, dir: String): DataFrame = {
    // norms hoisted out of the O(n²) pair join: computed once per vector,
    // sqrt(na)*sqrt(nb) association identical to cosine() so values (and
    // the oracle hash) don't move.
    val e = emb(s, dir).select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    e.as("x").join(e.as("y"), col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        round(dot(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm")), 6)
          .as("sim"))
      .where(col("sim") >= 0.45d)
      .orderBy(col("a"), col("b"))
  }

  /** D06: semantic dedup (SemDeDup-shaped) — cluster the embedding corpus
    * with the same deterministic IVF coarse quantizer as S03 (the K
    * lowest-id vectors act as centroids; every vector joins its
    * argmax-rounded-cosine centroid, ties → lowest cid), then search for
    * semantic near-duplicates ONLY within a cluster. Output: every vector
    * preceded in its cluster by a near-duplicate (cosine ≥ 0.4), with the
    * lowest-id such duplicate and the match count — the "removed" list a
    * curation pipeline feeds to an anti-join.
    *
    * Scale shape: the pair join keys on the cluster id — the corpus
    * shuffles ONCE by cluster and the quadratic comparison is confined to
    * single clusters; nothing here is corpus-wide all-pairs. K is
    * DELIBERATELY fixed at 8 after measuring the alternative (r10, x10
    * generated corpus, exact ≥0.4-truth 17,902 removable vectors):
    * K=8 finds 13,098 (0.732 of truth); the √n-cell law that fixed
    * s10/d17 ([[graft.operators.IvfIndex.kFor]]) finds 5,387 (0.301)
    * at top-1 membership and 9,757 (0.545) with SemDeDup-style top-2
    * multiprobe — at this LOOSE threshold (0.4; real SemDeDup prunes
    * near-copies at ~0.95), similar-but-not-identical pairs straddle
    * arbitrary first-K-vector cells as soon as the cells get fine.
    * Growing K without losing them needs LEARNED centroids (s08's
    * Lloyd machinery — oracle-replayable, the real SemDeDup quantizer)
    * so co-assignment follows the data; that upgrade is the named next
    * step, and until then the 8-cell partition is the measured-best
    * quality at n²/8 confined pair volume. */
  def d06SemanticDedup(s: SparkSession, dir: String): DataFrame = {
    val K = 8
    val e = emb(s, dir).select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val cents = e.where(col("vec_id") < K)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
    val toCent = e.join(broadcast(cents))
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"),
        round(dot(col("v"), col("cv")) / (col("nrm") * col("cn")), 6)
          .as("csim"))
    val wAsg = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cid"))
    // both sides of the within-cluster pair join — materialized once
    val assigned = toCent
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"),
        row_number().over(wAsg).as("rn"))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assigned.as("x").join(assigned.as("y"),
        col("x.cid") === col("y.cid") && col("x.vec_id") < col("y.vec_id"))
      .select(col("y.vec_id").as("removed_id"), col("x.vec_id").as("kept"),
        round(dot(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm")), 6)
          .as("sim"))
      .where(col("sim") >= 0.4d)
      .groupBy(col("removed_id"))
      .agg(min(col("kept")).as("dup_of"), count(lit(1)).as("n_dups"),
        max(col("sim")).as("max_sim"))
      .orderBy(col("removed_id"))
  }

  // ---- similarity search ------------------------------------------------

  /** S01: brute-force cosine top-k — exact kNN (k=5) for query vectors
    * vec_id < 10. The baseline the ANN variants are measured against. */
  def s01AnnTopK(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("q"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = q.join(e, col("vec_id") =!= col("q"))
      .select(col("q"), col("vec_id").as("nb"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6)
          .as("sim"))
    val w = Window.partitionBy(col("q"))
      .orderBy(col("sim").desc, col("nb"))
    scored.select(col("q"), col("nb"), col("sim"),
        row_number().over(w).as("rk"))
      .where(col("rk") <= 5)
      .select(col("q"), col("rk"), col("nb"), col("sim"))
      .orderBy(col("q"), col("rk"))
  }

  /** S06: FILTERED vector search — top-k among only the vectors whose
    * document satisfies a metadata predicate (lang = 'en'), the
    * RAG-retrieval shape ("nearest English docs"). The filter applies
    * BEFORE the similarity scan (semi-join on the keep list), not after
    * the top-k — post-filtering returns < k rows whenever the filter
    * removes neighbors; pre-filtering is also the scale win, since the
    * keep list is the pushdown that shrinks the scored corpus. */
  def s06AnnFiltered(s: SparkSession, dir: String): DataFrame = {
    val keep = docs(s, dir).where(col("lang") === "en")
      .select(col("doc_id").as("vec_id"))
    val e = emb(s, dir).join(keep, Seq("vec_id"), "left_semi")
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val q = emb(s, dir).where(col("vec_id") < 10)
      .select(col("vec_id").as("q"), toDouble(col("embedding")).as("qv"))
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
    val scored = q.join(e, col("vec_id") =!= col("q"))
      .select(col("q"), col("vec_id").as("nb"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6)
          .as("sim"))
    val w = Window.partitionBy(col("q")).orderBy(col("sim").desc, col("nb"))
    scored.select(col("q"), col("nb"), col("sim"),
        row_number().over(w).as("rk"))
      .where(col("rk") <= 5)
      .select(col("q"), col("rk"), col("nb"), col("sim"))
      .orderBy(col("q"), col("rk"))
  }

  /** S07: scalar-quantized (SQ8) ANN — the memory-compression tier next
    * to s03's scan-pruning tier, the FAISS ScalarQuantizer shape: vectors
    * are L2-normalized (cosine = unit-vector dot), each unit dimension
    * quantizes to one byte against per-dimension corpus bounds, and the
    * candidate scan scores the DEQUANTIZED byte codes (asymmetric-distance
    * style: `mn_i + q_i·(mx_i−mn_i)/255`), so a stored vector costs
    * ~64 B instead of 512 B of doubles at ~1-LSB scoring error. The top-C
    * approximate candidates then re-rank under the exact cosine. Every
    * arithmetic step (normalize, bound, floor-quantize, dequantize,
    * left-fold dot) is the identical IEEE expression in both engines, so
    * candidate selection replays exactly in the oracle.
    *
    * Scale shape: the bound table is ONE row (broadcast) produced by one
    * aggregate over the corpus; queries are tiny (broadcast); candidate
    * selection is a single pass over the quantized corpus; the exact
    * re-rank joins the candidate list (broadcast) back to full vectors.
    * No cartesian anywhere — `PlanQualitySpec` pins it. */
  def s07AnnSq8TopK(s: SparkSession, dir: String): DataFrame = {
    val C = 20 // candidates per query entering exact re-rank
    val e = emb(s, dir).select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val unit = e.withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .select(col("vec_id"),
        expr("transform(v, x -> x / nrm)").as("u"))
    // per-dimension corpus bounds over UNIT vectors, as two aligned arrays
    val bounds = unit.select(posexplode(col("u")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .groupBy()
      .agg(
        expr("transform(array_sort(collect_list(struct(i, mn))), s -> s.mn)")
          .as("mn"),
        expr("transform(array_sort(collect_list(struct(i, mx))), s -> s.mx)")
          .as("mx"))
    // byte code then dequantized reconstruction — the stored form is the
    // byte code + the shared bounds row; `dv` is what ADC scoring reads
    val dequantize = expr(
      """transform(sequence(1, size(u)), i ->
        |  CASE WHEN element_at(mx, i) > element_at(mn, i)
        |       THEN element_at(mn, i)
        |            + cast(cast(floor((element_at(u, i) - element_at(mn, i))
        |                              * 255.0D
        |                              / (element_at(mx, i) - element_at(mn, i)))
        |                   as bigint) as double)
        |              * (element_at(mx, i) - element_at(mn, i)) / 255.0D
        |       ELSE element_at(mn, i) END)""".stripMargin)
    val qz = e.crossJoin(broadcast(bounds))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .withColumn("u", expr("transform(v, x -> x / nrm)"))
      .withColumn("dv", dequantize)
      .select(col("vec_id"), col("dv"))
    val q8 = qz.where(col("vec_id") < 10)
      .select(col("vec_id").as("q"), col("dv").as("qdv"))
    val ascored = q8.join(qz, col("vec_id") =!= col("q"))
      .select(col("q"), col("vec_id").as("nb"),
        round(dot(col("qdv"), col("dv")), 6).as("ascore"))
    val wc = Window.partitionBy(col("q")).orderBy(col("ascore").desc, col("nb"))
    val cand = ascored
      .select(col("q"), col("nb"), row_number().over(wc).as("crk"))
      .where(col("crk") <= C)
      .select(col("q"), col("nb"))
    // exact re-rank of the candidate list only (broadcast: ≤ 10·C rows)
    val full = e.withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val qf = full.where(col("vec_id") < 10)
      .select(col("vec_id").as("q"), col("v").as("fqv"), col("nrm").as("qn"))
    val rer = full.withColumnRenamed("vec_id", "nb")
      .join(broadcast(cand.join(qf, Seq("q"))), Seq("nb"))
      .select(col("q"), col("nb"),
        round(dot(col("fqv"), col("v")) / (col("qn") * col("nrm")), 6)
          .as("sim"))
    val w = Window.partitionBy(col("q")).orderBy(col("sim").desc, col("nb"))
    rer.select(col("q"), col("nb"), col("sim"), row_number().over(w).as("rk"))
      .where(col("rk") <= 5)
      .select(col("q"), col("rk"), col("nb"), col("sim"))
      .orderBy(col("q"), col("rk"))
  }

  /** S02: LSH-bucketed ANN — 4 deterministic hyperplane sign bits put each
    * vector in one of 16 buckets; search only within the query's bucket.
    * At 100 TB: bucket is the shuffle/partition key, queries broadcast to
    * their bucket's partition only. */
  def s02AnnLshTopK(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("bucket", lshBucket(col("v"), 4))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("q"), col("v").as("qv"),
        col("bucket").as("qb"), col("nrm").as("qn"))
    val scored = q.join(e,
        col("bucket") === col("qb") && col("vec_id") =!= col("q"))
      .select(col("q"), col("vec_id").as("nb"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6)
          .as("sim"))
    val w = Window.partitionBy(col("q"))
      .orderBy(col("sim").desc, col("nb"))
    scored.select(col("q"), col("nb"), col("sim"),
        row_number().over(w).as("rk"))
      .where(col("rk") <= 5)
      .select(col("q"), col("rk"), col("nb"), col("sim"))
      .orderBy(col("q"), col("rk"))
  }

  /** S03: IVF-bucketed ANN — the inverted-file scale path next to S02's
    * hyperplane LSH. Deterministic coarse quantizer: the K lowest-id
    * vectors act as centroids (replayable in SQL — no iterative k-means);
    * every vector joins its argmax-cosine centroid's list (ties → lowest
    * centroid id), queries probe their nProbe nearest lists only.
    *
    * Scale shape: centroids broadcast (K rows); assignment is one
    * broadcast pass over the corpus; the search join is an equi-join on
    * the list id, so the corpus shuffles once by list and each query
    * scans K/nProbe-th of the data. Recall < exact by design — s01 is the
    * accuracy baseline. */
  def s03AnnIvfTopK(s: SparkSession, dir: String): DataFrame = {
    val K = 8
    val nProbe = 2
    val e = emb(s, dir).select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val cents = e.where(col("vec_id") < K)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
    // cosine to every centroid (rounded to 6 like all oracle sims, so
    // tie-breaks resolve identically in Spark and DuckDB)
    val toCent = e.join(broadcast(cents))
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"),
        round(dot(col("v"), col("cv")) / (col("nrm") * col("cn")), 6)
          .as("csim"))
    val wAsg = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cid"))
    val assigned = toCent
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"),
        row_number().over(wAsg).as("rn"))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"))
    val probes = toCent.where(col("vec_id") < 10)
      .select(col("vec_id").as("q"), col("v").as("qv"), col("nrm").as("qn"),
        col("cid"), row_number().over(
          Window.partitionBy(col("vec_id"))
            .orderBy(col("csim").desc, col("cid"))).as("rn"))
      .where(col("rn") <= nProbe)
      .select(col("q"), col("qv"), col("qn"), col("cid"))
    val scored = probes.join(assigned,
        probes("cid") === assigned("cid") && col("vec_id") =!= col("q"))
      .select(col("q"), col("vec_id").as("nb"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6)
          .as("sim"))
    val w = Window.partitionBy(col("q"))
      .orderBy(col("sim").desc, col("nb"))
    scored.select(col("q"), col("nb"), col("sim"),
        row_number().over(w).as("rk"))
      .where(col("rk") <= 5)
      .select(col("q"), col("rk"), col("nb"), col("sim"))
      .orderBy(col("q"), col("rk"))
  }

  /** S10: persisted-index IVF ANN — S03's search split into the
    * production "index once, probe many" shape via
    * [[graft.operators.IvfIndex]]: the centroid assignment is
    * materialized as a cid-PARTITIONED managed table (one directory per
    * inverted list), and the probe batch joins it on the list id, so
    * dynamic partition pruning drops the non-probed (K−nProbe)/K of the
    * index from the scan at runtime — fed by the broadcast probe side,
    * no driver round-trip ([[PlanQualitySpec]] pins the `dynamicpruning`
    * partition filter). Same deterministic quantizer as S03 (K lowest-id
    * vectors; ties → lowest centroid id) so the oracle replays the whole
    * chain; differs in probe set (every 9th vector), nProbe=3, and a
    * SIZE-DERIVED K ([[graft.operators.IvfIndex.kFor]], K ≈ √n,
    * derived in the oracle from count(*) so both engines partition
    * identically): s03's fixed K=8 is linear there because its probe
    * set is fixed, but s10's probes scale with the corpus, so
    * fixed-width lists made the probe join QUADRATIC — the r10
    * x10→x30 probe measured exp 2.12 (5.6 → 58.2 s) before the law. */
  def s10AnnIndexed(s: SparkSession, dir: String): DataFrame = {
    val nProbe = 3
    val e = emb(s, dir).select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val K = graft.operators.IvfIndex.kFor(e.count())
    val cents = e.where(col("vec_id") < K)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
    // TWO-LEVEL assignment (r11): the flat argmax scored n·K ≈ n^1.5
    // centroid pairs under the kFor law — the dominant cost at a true
    // 100×; coarse-then-children is n·~3√K with the layout and probe
    // path unchanged (the oracle replays the two-level chain)
    val assigned = graft.operators.IvfIndex.assignTwoLevel(
      e.select(col("vec_id"), col("v")), cents)
    graft.operators.IvfIndex.write(assigned, "s10_ivf_index")
    val index = graft.operators.IvfIndex.read(s, "s10_ivf_index")
    // probes stay FLAT over the K-row broadcast centroid table — the
    // per-query serving cost is K ≤ 65536 rows, the standard IVF probe
    val probes = e.where(col("vec_id") % 9 === 0)
      .join(broadcast(cents))
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"),
        round(dot(col("v"), col("cv")) / (col("nrm") * col("cn")), 6)
          .as("csim"))
      .select(col("vec_id").as("q"), col("v").as("qv"), col("nrm").as("qn"),
        col("cid"), row_number().over(
          Window.partitionBy(col("vec_id"))
            .orderBy(col("csim").desc, col("cid"))).as("rn"))
      .where(col("rn") <= nProbe)
      .select(col("q"), col("qv"), col("qn"), col("cid"))
    val scored = broadcast(probes).join(index,
        probes("cid") === index("cid") && index("vec_id") =!= probes("q"))
      .select(col("q"), index("vec_id").as("nb"),
        round(dot(col("qv"), index("v")) / (col("qn") * index("nrm")), 6)
          .as("sim"))
    val w = Window.partitionBy(col("q"))
      .orderBy(col("sim").desc, col("nb"))
    scored.select(col("q"), col("nb"), col("sim"),
        row_number().over(w).as("rk"))
      .where(col("rk") <= 5)
      .select(col("q"), col("rk"), col("nb"), col("sim"))
      .orderBy(col("q"), col("rk"))
  }

  /** S11: HNSW-class graph ANN ([[graft.operators.HnswGraph]]) — the
    * hierarchical navigable-graph serving structure next to the
    * quantization family (s02 LSH / s03 IVF / s04 PQ / s07 SQ8):
    * batch-deterministic layered graph (levels by id arithmetic;
    * layer-0 edges seeded from sign-projection cells, converged by
    * NN-descent rounds, made navigable by the RNG diversity prune) +
    * exact bounded landing scan + fixed-schedule layer-0 beam descent,
    * everything id-tie-broken and 6-rounded so the DuckDB oracle
    * replays the ENTIRE chain — graph construction and search path —
    * exactly (its refinement/hop CTEs are GENERATED from the
    * HnswGraph constants). The graph persists as a src-bucketed table
    * first ([[graft.operators.BucketedLayout]], the s10 "index once,
    * probe many" pattern), and every search hop joins it
    * bucket-for-bucket. Probe set: every 7th vector; recall floor vs
    * the s01 brute answer pinned in `HnswGraphSpec`. */
  def s11AnnHnsw(s: SparkSession, dir: String): DataFrame =
    corpusHnswAnn(s, dir).orderBy(col("q"), col("rk"))

  /** s11's graph search over the standing probe set, session-cached like
    * the stages it reads: s12's recall readout replays s11's search
    * verbatim (`ann = s11`), so without this a sweep paid the identical
    * multi-hop descent TWICE — once in the s11 row and once again inside
    * s12 (measured ~5 s of s12's 6.8 s band; the r9 graph-CONSTRUCTION
    * dedup, applied to the search result). The first consumer (s11 — it
    * sorts before s12 in the sweep) still pays and times the search;
    * the result is k·|Q| rows, trivially cacheable. */
  private def corpusHnswAnn(s: SparkSession, dir: String): DataFrame =
    cachedStage(s, dir, "hnsw_ann") {
      val e = hnswEmb(s, dir)
      val adj = corpusHnswGraph(s, dir)
      val qs = e.where(col("vec_id") % 7 === 0)
        .select(col("vec_id").as("q"), col("v").as("qv"),
          col("nrm").as("qn"))
      // the partition modulus of the standing layout — derived from the
      // persisted build-time size, so search and table agree even when a
      // later append grew the corpus (pruning changes the scan, never the
      // result; the oracle replays logic, not layout)
      val ptMod = graft.operators.TableCommit
        .readMarker(s, "s11_hnsw_graph", "meta")
        .map(v => graft.operators.HnswGraph.ptFor(v.toLong)).getOrElse(0L)
      graft.operators.HnswGraph.search(adj, e, qs, ptMod = ptMod)
    }

  /** (vec_id, v, nrm) — the graph family's embedding frame, one
    * derivation shared by s11/s12 and the graph stage. */
  private def hnswEmb(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))

  /** The standing s11 graph table, built ONCE per (session, dir) — the
    * ninth session-cached shared stage: s12's recall readout replays
    * s11's search, so without the stage a sweep paid the identical
    * graph CONSTRUCTION twice (~28% of the r9 sweep total was the two
    * builds). s11 and s12 both consume this; Bench times the build as
    * its own `stage_hnsw_graph` row, so the query rows measure what a
    * serving system actually pays per query family — search. */
  private def corpusHnswGraph(s: SparkSession, dir: String): DataFrame =
    cachedStage(s, dir, "hnsw_graph") {
      val e = hnswEmb(s, dir)
      // one control-plane scalar (the corpus size) sizes the bucket
      // count and level stride — the d08/t18 documented pattern; a fixed
      // bucket count measured quadratic in the r8 scale probe, this
      // keeps per-bucket population ~64 at any corpus size
      val n = e.count()
      val cells = graft.operators.HnswGraph.signCells(
        e, graft.operators.HnswGraph.bitsFor(n))
      val graph = graft.operators.HnswGraph.build(e, cells,
        m = graft.operators.HnswGraph.mFor(n),
        stride = graft.operators.HnswGraph.strideFor(n))
      // the (layer, pt)-partitioned standing layout + build-meta
      // marker: landing scans prune statically on layer, search hops
      // prune dynamically on pt (writeGraph also clears a stale
      // warehouse directory left by a previous JVM)
      graft.operators.HnswGraph.writeGraph(graph, "s11_hnsw_graph", n)
      s.table("s11_hnsw_graph")
    }

  /** S12: graph-tier recall readout — the d10/s05/d18 pattern applied
    * to s11: per probe query, how many of the exact brute top-5 the
    * graph descent returned. This turns the "industry-default
    * high-recall" claim into an ORACLE-CHECKED number every round
    * (the oracle reuses s11's entire WITH chain, so it replays the
    * identical graph and search path). The brute tier over s11's probe
    * set is |Q|·n scored pairs — the s01 accuracy-tier accounting,
    * documented quadratic-by-design; the graph tier under test is the
    * linear path. */
  def s12GraphRecall(s: SparkSession, dir: String): DataFrame = {
    val e = hnswEmb(s, dir)
    val ann = corpusHnswAnn(s, dir)
      .select(col("q").as("aq"), col("nb").as("anb"))
    val qs = e.where(col("vec_id") % 7 === 0)
      .select(col("vec_id").as("q"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy(col("q"))
      .orderBy(col("sim").desc, col("nb"))
    val brute = qs.join(e, col("vec_id") =!= col("q"))
      .select(col("q"), col("vec_id").as("nb"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6)
          .as("sim"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 5)
      .select(col("q"), col("nb"))
    brute.join(ann,
        col("q") === col("aq") && col("nb") === col("anb"), "left")
      .groupBy(col("q"))
      .agg(count(lit(1)).as("k"), count(col("anb")).as("n_hit"))
      .select(col("q"), col("k"), col("n_hit"),
        round(col("n_hit") * lit(1.0d) / col("k"), 4).as("recall_at_k"))
      .orderBy(col("q"))
  }

  /** S04: IVF-PQ ANN — product quantization on top of S03's inverted-file
    * search: the memory-compression path that makes billion-vector search
    * feasible (a 64-dim float vector is 256 B; its PQ code is M=4 bytes —
    * 64× smaller, so a 100 TB embedding corpus fits executor memory as
    * codes and the full-precision vectors stay in cold storage).
    *
    * Deterministic, oracle-replayable quantizer (no iterative k-means,
    * same rationale as S03's coarse centroids): the M×16 codebook entries
    * are the subspace slices of the 16 lowest-id vectors; each corpus
    * vector stores, per 16-dim subspace, the codebook entry minimizing
    * rounded L2² (ties → lowest entry id). Queries score candidates with
    * asymmetric distance: dot(query_sub_m, codebook[code_m]) summed over
    * subspaces in one sequential fold (bit-identical in DuckDB), against
    * the reconstruction's norm. Recall < S03 < exact by design — the
    * accuracy/memory trade is the point; s01 is the accuracy baseline. */
  def s04AnnIvfPqTopK(s: SparkSession, dir: String): DataFrame = {
    val K = 8; val nProbe = 2
    val M = 4; val SubDim = 16 // 4 × 16 = 64-dim embeddings
    val e = emb(s, dir).select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    // coarse quantizer — identical to S03 so the probed lists match
    val cents = e.where(col("vec_id") < K)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
    val toCent = e.join(broadcast(cents))
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"),
        round(dot(col("v"), col("cv")) / (col("nrm") * col("cn")), 6)
          .as("csim"))
    val wAsg = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cid"))
    val assigned = toCent
      .select(col("vec_id"), col("cid"), row_number().over(wAsg).as("rn"))
      .where(col("rn") === 1).drop("rn")
    val probes = toCent.where(col("vec_id") < 10)
      .select(col("vec_id").as("q"), col("v").as("qv"), col("nrm").as("qn"),
        col("cid"), row_number().over(wAsg).as("rn"))
      .where(col("rn") <= nProbe)
      .select(col("q"), col("qv"), col("qn"), col("cid"))
    // PQ codebook: subspace slices of the 16 lowest-id vectors (M·16 rows,
    // broadcast); sub-vector m of v is slice(v, m·16+1, 16)
    val ms = explode(sequence(lit(0), lit(M - 1))).as("m")
    val sub = e.select(col("vec_id"), col("v"), ms)
      .select(col("vec_id"), col("m"),
        slice(col("v"), col("m") * SubDim + 1, lit(SubDim)).as("sv"))
    val cb = sub.where(col("vec_id") < 16)
      .select(col("m"), col("vec_id").as("pcid"), col("sv").as("cv"))
    // encode: per (vector, subspace) the argmin-L2² codebook entry
    val l2sq = round(aggregate(
      zip_with(col("sv"), col("cv"), (x, y) => (x - y) * (x - y)),
      lit(0.0d), (acc, t) => acc + t), 6)
    val wCode = Window.partitionBy(col("vec_id"), col("m"))
      .orderBy(col("d2").asc, col("pcid").asc)
    val codes = sub.join(broadcast(cb), "m")
      .select(col("vec_id"), col("m"), col("pcid"), col("cv"), l2sq.as("d2"))
      .select(col("vec_id"), col("m"), col("cv"),
        row_number().over(wCode).as("rn"))
      .where(col("rn") === 1)
    // one row per vector: its M reconstruction blocks in subspace order +
    // the reconstruction norm (codes are what a real deployment stores)
    val pq = codes.groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("m"), col("cv")))).as("mcv"))
      .select(col("vec_id"),
        transform(col("mcv"), x => x.getField("cv")).as("cvs"))
      .withColumn("rnrm", sqrt(aggregate(col("cvs"), lit(0.0d),
        (acc, c) => acc + dot(c, c))))
    // ADC scoring inside the probed lists: one sequential fold over the M
    // subspaces — deterministic summation order, replayed in the oracle
    val adc = aggregate(sequence(lit(0), lit(M - 1)), lit(0.0d),
      (acc, m) => acc +
        dot(slice(col("qv"), m * SubDim + 1, lit(SubDim)),
          element_at(col("cvs"), m + 1)))
    val scored = probes.join(assigned,
        probes("cid") === assigned("cid") && col("vec_id") =!= col("q"))
      .join(pq, "vec_id")
      .select(col("q"), col("vec_id").as("nb"),
        round(adc / (col("qn") * col("rnrm")), 6).as("sim"))
    val w = Window.partitionBy(col("q"))
      .orderBy(col("sim").desc, col("nb"))
    scored.select(col("q"), col("nb"), col("sim"),
        row_number().over(w).as("rk"))
      .where(col("rk") <= 5)
      .select(col("q"), col("rk"), col("nb"), col("sim"))
      .orderBy(col("q"), col("rk"))
  }

  // ---- end-to-end curation pipeline -------------------------------------

  /** P01: the flagship training-data curation pipeline, every stage chained
    * in ONE Spark plan: language filter (t03's stopword vote says 'en') →
    * quality floor (t02's score ≥ 0.3) → exact dedup (lowest doc_id per
    * identical text survives) → MinHash-LSH near-dup removal (d03's engine
    * run on the surviving corpus; the higher doc_id of each verified pair
    * drops) → per-document report of what survived.
    *
    * Scale shape: the cheap narrowing stages (language, quality, exact
    * dedup — one scan plus one shuffle on the text) run FIRST so the
    * expensive near-dup stage sees the shrunken corpus — the stage order a
    * real 100 TB curation run uses. Near-dup is d03's banded equi-join
    * path, never all-pairs; Catalyst fuses the scalar stages into the scan
    * (one pass computes tokens, language votes, and quality together). */
  def p01CurationPipeline(s: SparkSession, dir: String): DataFrame = {
    val w = docs(s, dir).select(col("doc_id"), col("text"),
      tokens(col("text")).as("w"))
    def hits(words: Seq[String]): Column =
      size(filter(col("w"), t => words.map(t === _).reduce(_ || _)))
    val quality =
      round((size(array_distinct(col("w"))) * lit(1.0d) / size(col("w"))) *
        least(size(col("w")) / lit(100.0d), lit(1.0d)), 4)
    val scored = w.select(col("doc_id"), col("text"),
      size(col("w")).as("n_tokens"), quality.as("quality"),
      hits(Seq("the", "a")).as("s_en"), hits(Seq("der", "und")).as("s_de"),
      hits(Seq("le", "et")).as("s_fr"), hits(Seq("el", "y")).as("s_es"))
    val en = scored.where(col("s_en") >= col("s_de") &&
      col("s_en") >= col("s_fr") && col("s_en") >= col("s_es") &&
      col("s_en") > 0 && col("quality") >= 0.3d)
    val exact = en.withColumn("rn", row_number().over(
        Window.partitionBy(col("text")).orderBy(col("doc_id"))))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("text"), col("n_tokens"), col("quality"))
    val removed = minhashNearDupPairs(exact.select(col("doc_id"), col("text")))
      .select(col("b").as("doc_id")).distinct()
    exact.join(removed, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_tokens"), col("quality"))
      .orderBy(col("doc_id"))
  }

  // ---- array aggregate (A3) ---------------------------------------------

  /** A01: element-wise array sum via the ArrayElementSum Aggregator —
    * ragged arrays zero-pad like the reference's PL/pgSQL array_add
    * (functions.sql:14-17). Values are integral doubles so distributed
    * summation order cannot perturb the result. Output is serialized to a
    * canonical CSV string (integral → BIGINT first, so Spark and DuckDB
    * render identically): the driver's pandas harness cannot sort/hash
    * array cells. */
  def a01ArrayElementSum(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .select(col("l_returnflag"),
        slice(array(col("l_quantity"), col("l_linenumber").cast("double"),
          col("l_quantity") + col("l_linenumber")),
          lit(1), (col("l_orderkey") % 3 + 1).cast("int")).as("arr"))
      .groupBy(col("l_returnflag"))
      .agg(array_join(
        ArrayElementSum.column(col("arr"))
          .cast(ArrayType(LongType)).cast(ArrayType(StringType)), ",")
        .as("sums"))
      .orderBy(col("l_returnflag"))

  // ---- multimodal metadata (binary-column plumbing) ---------------------

  /** M01: multimodal column metadata — treats the document payload as an
    * opaque binary column (the pattern image/audio payloads use: see
    * graft.operators.Multimodal for the decode plumbing) and derives typed
    * metadata: byte length, checksum, deterministic fake decode dims. */
  def m01MultimodalMeta(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      length(col("text").cast("binary")).as("n_bytes"),
      fingerprint(col("text")).as("checksum"),
      (length(col("text").cast("binary")) % 64 + 1).as("fake_w"),
      (length(col("text").cast("binary")) % 48 + 1).as("fake_h"))
      .orderBy(col("doc_id"))

  /** M06: interleaved multimodal sequence packing — the batch-assembly
    * step of an image-text pretraining pipeline (MMC4/OBELICS shape):
    * each document's context cost is its EXACT BPE token count (t11's
    * tokenizer — the budget a sequence length is actually spent in) plus
    * a fixed 64-patch-token charge per attached image, and documents are
    * concatenated in key order and sliced into 2048-budget training
    * sequences. The per-doc image count is a deterministic stand-in
    * (doc_id mod 3) for the media-table join a production pipeline makes
    * — the PACKING arithmetic, the part that has to scale, is real.
    *
    * Scale shape: [[graft.operators.SequencePacker]]'s two-level prefix
    * sum — the global running total never funnels through one partition
    * (plan-asserted in `SequencePackerSpec` for the shared operator);
    * the cost column itself is per-row codegen'd string arithmetic. */
  def m06InterleavedPack(s: SparkSession, dir: String): DataFrame = {
    val costed = docs(s, dir).select(col("doc_id"),
        bpeTokenCount(col("text")).as("n_text_tokens"),
        (col("doc_id") % 3).as("n_images"))
      .withColumn("cost",
        col("n_text_tokens") + col("n_images") * lit(64L))
    graft.operators.SequencePacker.pack(costed, "doc_id", "cost", 2048L)
      .select(col("doc_id"), col("n_text_tokens"), col("n_images"),
        col("cost"), col("seq_id"), col("seq_off"))
      .orderBy(col("doc_id"))
  }

  /** M02: batch decode + per-asset features through the mapPartitions
    * plumbing. The fake codec is pure mod-1e9+7 arithmetic seeded by the
    * PolyHash text fingerprint (the t04 hash), with pixels on an integer
    * lattice — so the whole decode+feature path replays in DuckDB SQL and
    * this IS oracled, not just rows-checked. */
  def m02MediaFeatures(s: SparkSession, dir: String): DataFrame =
    graft.operators.Multimodal.features(
      graft.operators.Multimodal.mediaFromDocuments(s, docs(s, dir)))
      .toDF().orderBy(col("media_id"))

  /** M03: video frame sampling (every 2nd frame) — per-asset sampled-frame
    * counts are pure arithmetic on the metadata, so this one IS oracled. */
  def m03FrameSample(s: SparkSession, dir: String): DataFrame =
    graft.operators.Multimodal.sampledFrames(
      graft.operators.Multimodal.mediaFromDocuments(s, docs(s, dir)),
      everyN = 2)
      .groupBy(col("media_id")).agg(count(lit(1)).as("n_frames_sampled"))
      .orderBy(col("media_id"))

  /** S05: ANN recall evaluation — recall@5 of the IVF path (s03) against
    * the exact brute-force baseline (s01), per query vector. The
    * measurement every approximate-similarity deployment runs before
    * trusting its index: the accuracy/cost trade is only a trade if you
    * can see the accuracy side. Composes the two already-oracled queries,
    * so the recall numbers are themselves hash-verified.
    *
    * Scale shape: both inputs are top-k frames (k rows per query — tiny);
    * the join and aggregate are negligible next to the searches
    * themselves. At 100 TB this runs over a SAMPLE of queries, which is
    * exactly what the vec_id<10 query set is. */
  def s05AnnRecall(s: SparkSession, dir: String): DataFrame = {
    val exact = s01AnnTopK(s, dir).select(col("q"), col("nb"))
    val approx = s03AnnIvfTopK(s, dir)
      .select(col("q").as("aq"), col("nb").as("anb"))
    exact.join(approx,
        col("q") === col("aq") && col("nb") === col("anb"), "left")
      .groupBy(col("q"))
      .agg(count(lit(1)).as("k"), count(col("anb")).as("n_hit"))
      .select(col("q"), col("k"), col("n_hit"),
        round(col("n_hit") * lit(1.0d) / col("k"), 4).as("recall_at_k"))
      .orderBy(col("q"))
  }

  /** M04: resize — area-average each asset's decoded frame down to 8×8
    * through [[graft.operators.Multimodal.resized]] (the real resize
    * arithmetic over the fake-decoded pixels; swapping the codec changes
    * nothing here). The oracle replays the two corner output pixels
    * bit-for-bit: each is a row-major sequential fold over its source box
    * on the integer pixel lattice — float32 pixel values, double
    * accumulator, one division, float32 store — exactly the operator's
    * loop, so this IS oracled, not rows-checked.
    *
    * Scale shape: decode→resize fuse into one mapPartitions stage over
    * the media partitioning; nothing shuffles until the presentation
    * sort. */
  def m04MediaResize(s: SparkSession, dir: String): DataFrame = {
    val media = graft.operators.Multimodal.mediaFromDocuments(s, docs(s, dir))
    graft.operators.Multimodal.resized(
        graft.operators.Multimodal.decoded(media), tw = 8, th = 8)
      .toDF()
      .select(col("media_id"), col("width").as("out_w"),
        col("height").as("out_h"),
        round(element_at(col("pixels"), 1).cast("double"), 6).as("px_first"),
        round(element_at(col("pixels"), 64).cast("double"), 6).as("px_last"))
      .orderBy(col("media_id"))
  }

  /** M05: perceptual media dedup by average-hash — decode → area-average
    * resize to 4×4 ([[graft.operators.Multimodal.resized]], the m04
    * machinery) → 16-bit signature (bit i = pixel i above the frame mean)
    * → hash groupBy; buckets with ≥2 assets are dup candidates. With a
    * real codec identical/re-encoded/resized copies of an image share the
    * ahash; the fake codec exercises the identical plumbing and keeps the
    * arithmetic replayable (the oracle rebuilds every 4×4 pixel from the
    * lattice and re-derives the bits). Near-dup at Hamming ≤ d would add
    * d04-style bit-banding on this same signature; the exact-bucket form
    * is one shuffle. */
  def m05MediaAhashDedup(s: SparkSession, dir: String): DataFrame = {
    val media = graft.operators.Multimodal.mediaFromDocuments(s, docs(s, dir))
    val small = graft.operators.Multimodal.resized(
        graft.operators.Multimodal.decoded(media), tw = 4, th = 4)
      .toDF()
    val mean = aggregate(col("pixels"), lit(0.0d),
      (a, x) => a + x.cast("double")) / lit(16.0d)
    val bits = (0 until 16).map(i =>
      when(element_at(col("pixels"), i + 1).cast("double") > col("mean"),
        lit(1L << i)).otherwise(lit(0L)))
    small.select(col("media_id"), col("pixels"), mean.as("mean"))
      .withColumn("ahash", bits.reduce(_ + _))
      .groupBy(col("ahash"))
      .agg(count(lit(1)).as("n_media"),
        min(col("media_id")).as("media_min"),
        max(col("media_id")).as("media_max"))
      .where(col("n_media") >= 2)
      .orderBy(col("ahash"))
  }

  /** A04: hash-rank quantile sketch — a deterministic, MERGEABLE quantile
    * estimator next to a02's KMV cardinality and a03's CMS frequency: the
    * sample is the k rows with the LOWEST content fingerprint (PolyHash of
    * the unique line key), so any partitioning — and any later merge of
    * per-partition sketches — selects the same k rows; quantiles are then
    * exact order statistics of that fixed sample (no interpolation: the
    * output values are actual data values, so no float arithmetic at all).
    *
    * Scale shape: `orderBy(fp).limit(k)` compiles to TakeOrderedAndProject
    * — per-partition top-k heaps merged once, never a global sort — and
    * everything after runs on k=128 rows. This is how a 100 TB percentile
    * readout avoids q24's full-sort shape (the corpus is never shuffled);
    * accuracy is the standard bottom-k-sample bound, and the sketch merges
    * across days/shards by construction. */
  def a04HashrankQuantiles(s: SparkSession, dir: String): DataFrame = {
    val k = 128
    val keyed = Tables.load(s, dir, "lineitem")
      .select(col("l_extendedprice").as("v"),
        concat_ws("|", col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey")).as("kstr"))
      .withColumn("fp", fingerprint(col("kstr")))
    // deterministic bottom-k by fingerprint; kstr/v break fp collisions
    // (the 4-key string has one dupe pair at sf0.001 — v disambiguates)
    val sample = keyed.orderBy(col("fp"), col("kstr"), col("v")).limit(k)
    val ranked = sample
      .withColumn("rk",
        row_number().over(Window.orderBy(col("v"), col("kstr"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
    val ps = s.range(1).select(explode(array(
      lit(0.25d), lit(0.5d), lit(0.75d), lit(0.95d))).as("p"))
    ps.join(ranked, col("rk") === lit(1) + floor(col("p") * (col("n") - 1)))
      .select(col("p"), col("v").as("value"))
      .orderBy(col("p"))
  }

  /** T13: BM25 relevance scoring of the corpus against a fixed query-term
    * set — the retrieval-side ranking a curation pipeline uses to mine
    * topical subsets. Uses the rational (pre-log) IDF
    * `(N - df + 0.5)/(df + 0.5)` so every step is +,-,*,/ on doubles
    * derived from integers — IEEE-identical cross-engine, unlike ln()
    * (production BM25 wraps this in ln(); the ranking here is the exact
    * replayable variant, and swapping ln in is a one-line change). The
    * per-document sum over query terms is a LEFT FOLD over the terms
    * sorted by term text, matching the oracle's list_reduce order.
    *
    * Scale shape: df and (N, avgdl) are term-vocabulary-sized and scalar
    * aggregates — both broadcast; the per-doc tf aggregation filters to
    * the query terms BEFORE exploding, so the shuffle carries only
    * matching (doc, term) rows; the final top-k is TakeOrdered, never a
    * global sort. */
  def t13Bm25(s: SparkSession, dir: String): DataFrame = {
    val terms = Seq("spark", "vector", "join")
    val d = docs(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("w"))
      // dl is an integer-valued double; sums of it stay exact (< 2^53)
      .withColumn("dl", size(col("w")).cast("double"))
    val stats = d.agg(count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl")) / count(lit(1))).as("avgdl"))
    val tf = d
      .select(col("doc_id"), col("dl"),
        explode(filter(col("w"), t => t.isin(terms: _*))).as("t"))
      .groupBy(col("doc_id"), col("dl"), col("t"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy(col("t"))
      .agg(count(lit(1)).cast("double").as("df"))
    val scored = tf.join(broadcast(dfreq), "t").crossJoin(broadcast(stats))
      .withColumn("idf",
        (col("n_docs") - col("df") + lit(0.5d)) / (col("df") + lit(0.5d)))
      .withColumn("ts",
        (col("idf") * (col("tf") * lit(2.2d))) /
          (col("tf") + lit(1.2d) *
            (lit(0.25d) + lit(0.75d) * col("dl") / col("avgdl"))))
    val perDoc = scored.groupBy(col("doc_id"))
      .agg(round(aggregate(
        array_sort(collect_list(struct(col("t"), col("ts")))),
        lit(0.0d), (acc, x) => acc + x.getField("ts")), 6).as("score"))
    perDoc.orderBy(col("score").desc, col("doc_id")).limit(10)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))))
      .select(col("rk"), col("doc_id"), col("score"))
      .orderBy(col("rk"))
  }

  /** S08: spherical k-means clustering of the embedding corpus — the
    * grouping operator next to the s-family's search operators (topic
    * bucketing, mixture analysis, IVF-list training all reduce to it).
    * One full Lloyd refinement, replayable exactly: vectors are quantized
    * to integer-valued doubles (floor(x*1e6) — exact in both engines),
    * init centroids are the K lowest-id vectors, assignment is argmax
    * rounded cosine (ties → lowest cid), and the update step sums member
    * vectors element-wise ([[graft.functions.ArrayElementSum]]) — sums of
    * integer-valued doubles are EXACT (< 2^53), so the centroid is
    * order-independent, and cosine against the un-normalized sum equals
    * cosine against the mean (the 1/n cancels — why spherical k-means
    * suits cross-engine replay where Euclidean k-means' mean division
    * would not).
    *
    * Scale shape: centroids are K rows — both assignment passes are
    * broadcast nested-loop joins over a K-row side, the corpus is never
    * shuffled; the update is one partial-aggregated groupBy(cid). More
    * Lloyd rounds repeat the same two broadcast stages. */
  def s08SphericalKmeans(s: SparkSession, dir: String): DataFrame = {
    val K = 8
    val e = emb(s, dir).select(col("vec_id"),
        transform(toDouble(col("embedding")),
          x => floor(x * lit(1e6)).cast("double")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val c0 = e.where(col("vec_id") < K)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
    val asg0 = e.join(broadcast(c0))
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"),
        round(dot(col("v"), col("cv")) / (col("nrm") * col("cn")), 6)
          .as("csim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("csim").desc, col("cid"))))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("cid"))
    val c1 = asg0.groupBy(col("cid"))
      .agg(ArrayElementSum.column(col("v")).as("sv"))
      .withColumn("sn", sqrt(dot(col("sv"), col("sv"))))
    val asg1 = e.join(broadcast(c1))
      .select(col("vec_id"), col("cid"),
        round(dot(col("v"), col("sv")) / (col("nrm") * col("sn")), 6)
          .as("csim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("csim").desc, col("cid"))))
      .where(col("rn") === 1)
    asg1.select(col("vec_id"), col("cid").as("cluster"), col("csim").as("sim"))
      .orderBy(col("vec_id"))
  }

  /** S09: k-NN label propagation — semi-supervised labeling, the weak
    * supervision move that turns a small labeled seed set into labels for
    * the whole corpus (and, run on a held-out split as here, the accuracy
    * readout for it). Vectors with `vec_id % 5 == 0` are the "unlabeled"
    * holdout; each takes the majority label of its k=10 nearest labeled
    * neighbors by rounded cosine (ties: more-similar rank wins the
    * neighborhood, lower label wins the vote), and the output carries a
    * correctness flag against the ground-truth label — the accuracy
    * readout IS the product (on this synthetic corpus labels are
    * independent of geometry, so it reads the 1/K chance line; on a real
    * corpus this is the gate before propagating labels at scale).
    *
    * Declared brute-force accuracy tier (like s01): the scored join is
    * holdout × labeled with the HOLDOUT side broadcast — at 100 TB the
    * scale path replaces the labeled-side scan with s03's IVF probing
    * (assign holdouts to lists, score only probed lists), same vote
    * stage. */
  def s09KnnLabel(s: SparkSession, dir: String): DataFrame = {
    val k = 10
    val e = emb(s, dir).select(col("vec_id"), col("label"),
        toDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val q = e.where(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("q"), col("label").as("true_label"),
        col("v").as("qv"), col("nrm").as("qn"))
    val lab = e.where(col("vec_id") % 5 =!= 0)
      .select(col("vec_id").as("nb"), col("label"), col("v"), col("nrm"))
    val scored = broadcast(q).join(lab, col("nb") =!= col("q"))
      .select(col("q"), col("true_label"), col("nb"), col("label"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6)
          .as("sim"))
    val knn = scored.withColumn("rk", row_number().over(
        Window.partitionBy(col("q")).orderBy(col("sim").desc, col("nb"))))
      .where(col("rk") <= k)
    knn.groupBy(col("q"), col("true_label"), col("label"))
      .agg(count(lit(1)).as("n_votes"))
      .withColumn("vr", row_number().over(
        Window.partitionBy(col("q"))
          .orderBy(col("n_votes").desc, col("label"))))
      .where(col("vr") === 1)
      .select(col("q").as("vec_id"), col("label").as("pred_label"),
        col("n_votes"),
        (col("label") === col("true_label")).cast("int").as("correct"))
      .orderBy(col("vec_id"))
  }

  /** D13: cross-source shingle-overlap matrix — the corpus analytics
    * behind mixture design (p04) and dedup prioritization: for every
    * source pair, the exact Jaccard overlap of their distinct
    * 3-word-shingle fingerprint SETS. High-overlap pairs are where
    * cross-source dedup (d03/d11) pays; near-zero pairs can be mixed
    * without a cross-pass. Pairs with zero common shingles are omitted
    * (the join produces no row — the interesting matrix is the sparse
    * non-zero part).
    *
    * Scale shape: reuses the session-cached shingle table (one corpus
    * read for the whole dedup family), collapses it to distinct
    * (source, f) — cardinality ≈ vocabulary × sources, far below the
    * corpus — and the pair intersection is an equi-join ON f: shuffles
    * are keyed by fingerprint, never a source × source data explosion;
    * the result is sources² rows, trivially small. */
  /** Distinct (source, f) shingle fingerprints — d13's intersection
    * input; cardinality ≈ vocabulary × sources, far below the corpus. */
  private def sourceFps(s: SparkSession, dir: String): DataFrame =
    cachedStage(s, dir, "source_fps") {
      corpusFps(s, dir)
        .join(docs(s, dir).select(col("doc_id"), col("source")), "doc_id")
        .select(col("source"), col("f")).distinct()
    }

  def d13SourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val sfp = sourceFps(s, dir)
    val card = sfp.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = sfp.as("x").join(sfp.as("y"),
        col("x.f") === col("y.f") && col("x.source") < col("y.source"))
      .groupBy(col("x.source"), col("y.source"))
      .agg(count(lit(1)).as("n_common"))
      .select(col("x.source").as("src_a"), col("y.source").as("src_b"),
        col("n_common"))
    inter
      .join(card.select(col("source").as("src_a"), col("n").as("na")), "src_a")
      .join(card.select(col("source").as("src_b"), col("n").as("nb")), "src_b")
      .select(col("src_a"), col("src_b"), col("n_common"),
        round(col("n_common").cast("double") /
          (col("na") + col("nb") - col("n_common")).cast("double"), 6)
          .as("jac"))
      .orderBy(col("src_a"), col("src_b"))
  }

  // ---- registry ---------------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t01_token_stats" -> (t01TokenStats _),
    "t02_quality_score" -> (t02Quality _),
    "t03_lang_id" -> (t03LangId _),
    "t04_fingerprint" -> (t04Fingerprint _),
    "t05_trigram_lm" -> (t05TrigramLm _),
    "d01_dedup_exact" -> (d01DedupExact _),
    "d02_dedup_ngram_jaccard" -> (d02NgramJaccard _),
    "d03_dedup_minhash_lsh" -> (d03MinhashLsh _),
    "d04_dedup_simhash" -> (d04Simhash _),
    "d05_dedup_embed_cosine" -> (d05EmbedNearDup _),
    "d06_semantic_dedup" -> (d06SemanticDedup _),
    "d07_decontaminate" -> (d07Decontaminate _),
    "d08_dup_clusters" -> (d08DupClusters _),
    "d09_edit_distance" -> (d09EditDistance _),
    "d10_lsh_recall" -> (d10LshRecall _),
    "d11_incremental_dedup" -> (d11IncrementalDedup _),
    "d12_substring_spans" -> (d12SubstringSpans _),
    "d14_max_dup_segments" -> (d14MaxDupSegments _),
    "d15_paragraph_dedup" -> (d15ParagraphDedup _),
    "d16_cluster_keep_best" -> (d16ClusterKeepBest _),
    "d17_semantic_decontaminate" -> (d17SemanticDecontaminate _),
    "d18_decontam_recall" -> (d18DecontamRecall _),
    "d19_incremental_paragraph" -> (d19IncrementalParagraph _),
    "t06_top_ngrams" -> (t06TopNgrams _),
    "t07_pii_redact" -> (t07PiiRedact _),
    "t08_chunk_split" -> (t08ChunkSplit _),
    "t09_repetition" -> (t09Repetition _),
    "t10_normalize" -> (t10Normalize _),
    "t11_bpe_tokens" -> (t11BpeTokens _),
    "t12_hashed_classifier" -> (t12HashedClassifier _),
    "p01_curation_pipeline" -> (p01CurationPipeline _),
    "p02_sequence_pack" -> (p02SequencePack _),
    "p03_export_manifest" -> (p03ExportManifest _),
    "p04_data_mixture" -> (p04DataMixture _),
    "p05_curriculum" -> (p05Curriculum _),
    "p06_leakage_split" -> (p06LeakageSplit _),
    "l01_zorder_layout" -> (l01ZorderLayout _),
    "l02_snapshot_merge" -> (l02SnapshotMerge _),
    "l03_time_travel" -> (l03TimeTravel _),
    "r01_stratified_sample" -> (r01StratifiedSample _),
    "r02_topk_sample" -> (r02TopkSample _),
    "r03_temperature_sample" -> (r03TemperatureSample _),
    "r04_source_cap" -> (r04SourceCap _),
    "r05_dsir_select" -> (r05DsirSelect _),
    "a02_kmv_distinct" -> (a02KmvDistinct _),
    "a03_cms_freq" -> (a03CmsFreq _),
    "a04_hashrank_quantiles" -> (a04HashrankQuantiles _),
    "a05_bloom_decontaminate" -> (a05BloomDecontaminate _),
    "a06_sketch_algebra" -> (a06SketchAlgebra _),
    "t13_bm25" -> (t13Bm25 _),
    "t14_quality_tiers" -> (t14QualityTiers _),
    "t15_gopher_rules" -> (t15GopherRules _),
    "t16_table_profile" -> (t16TableProfile _),
    "t17_html_extract" -> (t17HtmlExtract _),
    "t18_bpe_train" -> (t18BpeTrain _),
    "t19_bpe_vocab_scale" -> (t19BpeVocabScale _),
    "p07_corpus_shuffle" -> (p07CorpusShuffle _),
    "p08_epoch_manifest" -> (p08EpochManifest _),
    "s08_spherical_kmeans" -> (s08SphericalKmeans _),
    "s09_knn_label" -> (s09KnnLabel _),
    "d13_source_overlap" -> (d13SourceOverlap _),
    "s01_ann_cosine_topk" -> (s01AnnTopK _),
    "s02_ann_lsh_topk" -> (s02AnnLshTopK _),
    "s03_ann_ivf_topk" -> (s03AnnIvfTopK _),
    "s04_ann_ivfpq_topk" -> (s04AnnIvfPqTopK _),
    "s05_ann_recall" -> (s05AnnRecall _),
    "s06_ann_filtered" -> (s06AnnFiltered _),
    "s07_ann_sq8_topk" -> (s07AnnSq8TopK _),
    "s10_ann_indexed" -> (s10AnnIndexed _),
    "s11_ann_hnsw" -> (s11AnnHnsw _),
    "s12_graph_recall" -> (s12GraphRecall _),
    "a01_array_element_sum" -> (a01ArrayElementSum _),
    "m01_multimodal_meta" -> (m01MultimodalMeta _),
    "m02_media_features" -> (m02MediaFeatures _),
    "m03_media_frame_sample" -> (m03FrameSample _),
    "m04_media_resize" -> (m04MediaResize _),
    "m05_media_ahash_dedup" -> (m05MediaAhashDedup _),
    "m06_interleaved_pack" -> (m06InterleavedPack _),
  )

  // DuckDB shared fragments — same arithmetic as TextFunctions, same fold
  // order (list_reduce over a 0-prepended list == Spark aggregate with 0 init).
  // ASCII PIN: every `ascii(x) for x in string_split(…)` fold here hashes
  // CODEPOINTS, while the Spark-side PolyHash kernel hashes UTF-8 BYTES —
  // identical only while the corpus is pure ASCII. The driver's synthetic
  // documents table is ASCII by construction, and AsciiCorpusSpec asserts
  // it per scale factor so a future non-ASCII corpus fails loudly instead
  // of hash-mismatching the oracle.
  private def Wfrom(src: String) =
    s"""words AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') w
       |           FROM $src)""".stripMargin
  private val W = Wfrom("documents")
  /** The t14 tier-assignment chain (trigram LM score → sampled per-lang
    * cutoffs → per-doc tier), shared by the t14 and p05 oracles. Ends in
    * a `tiers(doc_id, lang, score_ppm, tier)` CTE. */
  private val TIERSQL =
    """d AS (SELECT doc_id, text FROM documents
      |           WHERE length(text) >= 3),
      |tri AS (SELECT doc_id,
      |    UNNEST(list_transform(range(1, length(text) - 1),
      |      i -> substr(text, CAST(i AS INTEGER), 3))) AS tg
      |  FROM d),
      |big AS (SELECT
      |    UNNEST(list_transform(range(1, length(text)),
      |      i -> substr(text, CAST(i AS INTEGER), 2))) AS bg
      |  FROM d),
      |c3 AS (SELECT tg, count(*) AS c3 FROM tri GROUP BY tg),
      |c2 AS (SELECT bg, count(*) AS c2 FROM big GROUP BY bg),
      |v AS (SELECT t.doc_id, (c3.c3 * 1000000) // c2.c2 AS v
      |  FROM tri t JOIN c3 USING (tg)
      |       JOIN c2 ON c2.bg = substr(t.tg, 1, 2)),
      |sc AS (SELECT doc_id, CAST(sum(v) // count(*) AS BIGINT) score_ppm
      |  FROM v GROUP BY doc_id),
      |scl AS (SELECT sc.doc_id, d2.lang, score_ppm,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      [CAST(ascii(x) AS BIGINT)
      |       for x in string_split(CAST(sc.doc_id AS VARCHAR),'')]),
      |      (a,b)->(a*31+b)%1000000007) AS fp
      |  FROM sc JOIN documents d2 USING (doc_id)),
      |samp AS (SELECT lang, score_ppm AS v FROM (
      |    SELECT lang, score_ppm,
      |      ROW_NUMBER() OVER (PARTITION BY lang
      |        ORDER BY fp, score_ppm, doc_id) rk
      |    FROM scl) t WHERE rk <= 99),
      |st AS (SELECT lang, list(v ORDER BY v) vs FROM samp GROUP BY lang),
      |cut AS (SELECT lang,
      |    vs[CAST(1 + (len(vs)-1)//3 AS INTEGER)] lo,
      |    vs[CAST(1 + (2*(len(vs)-1))//3 AS INTEGER)] hi
      |  FROM st),
      |tiers AS (SELECT s.doc_id, s.lang, s.score_ppm,
      |    CASE WHEN score_ppm > hi THEN 1
      |         WHEN score_ppm > lo THEN 2 ELSE 3 END tier
      |  FROM scl s JOIN cut USING (lang))""".stripMargin

  /** KMV estimator over a sorted k=64 buffer list column (a06). */
  private def kmvEstSql(v: String) =
    s"CASE WHEN len($v) < 64 THEN CAST(len($v) AS DOUBLE) " +
      s"ELSE 63.0 * 1000000007 / $v[64] END"
  private def FPfrom(src: String) =
    s"""${Wfrom(src)},
       |shg AS (SELECT doc_id,
       |         UNNEST(list_transform(range(1, greatest(len(w)-1,1)),
       |                i -> w[i]||' '||w[i+1]||' '||w[i+2])) AS s
       |        FROM words WHERE len(w)>=3),
       |fp AS (SELECT DISTINCT doc_id,
       |        list_reduce(list_prepend(CAST(0 AS BIGINT),
       |          [CAST(ascii(x) AS BIGINT) for x in string_split(s,'')]),
       |          (a,b)->(a*31+b)%1000000007) f
       |       FROM shg)""".stripMargin
  private val FP = FPfrom("documents")
  private def JACfrom(src: String) =
    s"""${FPfrom(src)},
       |freq AS (SELECT f, count(*) d FROM fp GROUP BY 1),
       |fpc AS (SELECT fp.doc_id, fp.f FROM fp
       |        JOIN freq ON fp.f = freq.f WHERE freq.d <= 10000),
       |card AS (SELECT doc_id, count(*) n FROM fpc GROUP BY 1),
       |inter AS (SELECT x.doc_id a, y.doc_id b, count(*) i
       |          FROM fpc x JOIN fpc y ON x.f = y.f AND x.doc_id < y.doc_id
       |          GROUP BY 1, 2),
       |jac AS (SELECT a, b, i*1.0/(ca.n + cb.n - i) jac
       |        FROM inter JOIN card ca ON ca.doc_id = a
       |                   JOIN card cb ON cb.doc_id = b)""".stripMargin
  private val JAC = JACfrom("documents")
  /** d03's LSH candidate chain (sig → band → cand) over whatever `fp` CTE
    * is in scope — shared verbatim by the d03 oracle and p01's near-dup
    * stage. */
  private val LSHCAND =
    """sig AS (SELECT doc_id, i, min((f*(37+2*i)+1000+i)%1000000007) m
      |        FROM fp CROSS JOIN (SELECT UNNEST(range(0,16)) i)
      |        GROUP BY doc_id, i),
      |band AS (SELECT doc_id, i//4 band,
      |                string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) k
      |         FROM sig GROUP BY doc_id, i//4),
      |cand AS (SELECT DISTINCT x.doc_id a, y.doc_id b
      |         FROM band x JOIN band y
      |           ON x.band = y.band AND x.k = y.k AND x.doc_id < y.doc_id)""".stripMargin
  /** Suffixed shingle→fp→sig→band chain over an arbitrary (doc_id, text)
    * CTE — the d11 oracle instantiates it twice (standing + delta) in one
    * query, which the fixed-name FP/LSHCAND fragments cannot. Arithmetic
    * is identical to those fragments. */
  private def SigBandFrom(src: String, sfx: String) =
    s"""words$sfx AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') w
       |           FROM $src),
       |shg$sfx AS (SELECT doc_id,
       |         UNNEST(list_transform(range(1, greatest(len(w)-1,1)),
       |                i -> w[i]||' '||w[i+1]||' '||w[i+2])) AS s
       |        FROM words$sfx WHERE len(w)>=3),
       |fp$sfx AS (SELECT DISTINCT doc_id,
       |        list_reduce(list_prepend(CAST(0 AS BIGINT),
       |          [CAST(ascii(x) AS BIGINT) for x in string_split(s,'')]),
       |          (a,b)->(a*31+b)%1000000007) f
       |       FROM shg$sfx),
       |sig$sfx AS (SELECT doc_id, i, min((f*(37+2*i)+1000+i)%1000000007) m
       |        FROM fp$sfx CROSS JOIN (SELECT UNNEST(range(0,16)) i)
       |        GROUP BY doc_id, i),
       |band$sfx AS (SELECT doc_id, i//4 band,
       |                string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) k
       |         FROM sig$sfx GROUP BY doc_id, i//4)""".stripMargin

  private val EMB =
    """e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      |pair_sim AS (SELECT x.vec_id a, y.vec_id b,
      |  round(
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(range(1, len(x.v)+1), i -> x.v[i]*y.v[i])), (p,q)->p+q)
      |    / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |         list_transform(range(1, len(x.v)+1), i -> x.v[i]*x.v[i])), (p,q)->p+q))
      |     * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |         list_transform(range(1, len(y.v)+1), i -> y.v[i]*y.v[i])), (p,q)->p+q)))
      |  , 6) sim
      |  FROM e x, e y)""".stripMargin

  /** s01/s03 oracle texts, shared with the s05 recall oracle. */
  private val S01Sql: String =
    s"""WITH $EMB,
       |ranked AS (SELECT a q, b nb, sim,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY a ORDER BY sim DESC, b)
       |         AS INTEGER) rk
       |  FROM pair_sim WHERE a < 10 AND a <> b)
       |SELECT q, rk, nb, sim FROM ranked WHERE rk <= 5
       |ORDER BY q, rk""".stripMargin
  /** s10: the deterministic IVF chain with the r11 TWO-LEVEL assignment
    * — coarse set = every (K/C)-th centroid (C = the smallest power of
    * two with C² ≥ K, [[graft.operators.IvfIndex.coarseFor]]), each
    * centroid routed to its nearest coarse cell, each vector routed
    * through its [[graft.operators.IvfIndex.CoarseProbes]] best coarse
    * cells and argmaxed over just their children. The probe side stays
    * the flat s03 scoring with s10's probe set (every 9th vector) and
    * nProbe=3. */
  private val S10Sql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |n AS (SELECT vec_id, v,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, len(v)+1), i -> v[i]*v[i])),
        |      (p,q)->p+q)) nrm
        |  FROM e),
        |cnt AS (SELECT count(*) nn FROM e),
        |kk AS (SELECT min(CAST(power(2, x) AS BIGINT)) k
        |       FROM range(3, 21) t(x), cnt
        |       WHERE CAST(power(2, x) AS BIGINT)
        |             * CAST(power(2, x) AS BIGINT) >= nn),
        |cc2 AS (SELECT min(CAST(power(2, y) AS BIGINT)) cw
        |       FROM range(0, 12) t(y), kk
        |       WHERE CAST(power(2, y) AS BIGINT)
        |             * CAST(power(2, y) AS BIGINT) >= k),
        |cents AS (SELECT vec_id cid, v cv, nrm cn FROM n, kk
        |          WHERE vec_id < k),
        |qc AS (SELECT cid, cv, cn,
        |    list_transform(cv, x -> floor(x * CAST(10000 AS DOUBLE))) qcv
        |  FROM cents),
        |qn2 AS (SELECT cid, cv, cn, qcv,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, len(qcv)+1), i -> qcv[i]*qcv[i])),
        |      (p,q)->p+q)) qcn
        |  FROM qc),
        |co0 AS (SELECT cid ccid, qcv ccv, qcn ccn FROM qn2, kk, cc2
        |        WHERE cid % (k // cw) = 0),
        |lasg AS (SELECT cid, ccid FROM (
        |    SELECT q2.cid, c0.ccid,
        |      ROW_NUMBER() OVER (PARTITION BY q2.cid ORDER BY
        |        round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |          list_transform(range(1, len(q2.qcv)+1),
        |            i -> q2.qcv[i]*c0.ccv[i])),
        |          (p,q)->p+q) / (q2.qcn * c0.ccn), 6) DESC, c0.ccid) rn
        |    FROM qn2 q2 CROSS JOIN co0 c0) t WHERE rn = 1),
        |pos2 AS (SELECT UNNEST(range(1,
        |    (SELECT max(len(v)) + 1 FROM e))) i),
        |lsums AS (SELECT ccid, i, sum(qcv[i]) lv_i
        |  FROM lasg JOIN qn2 USING(cid) CROSS JOIN pos2 GROUP BY ccid, i),
        |lrn AS (SELECT ccid, lv,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, len(lv)+1), i -> lv[i]*lv[i])),
        |      (p,q)->p+q)) lnm
        |  FROM (SELECT ccid, list(lv_i ORDER BY i) lv FROM lsums
        |        GROUP BY ccid)),
        |c2c AS (SELECT cid, cv, cn, ccid FROM (
        |    SELECT q2.cid, q2.cv, q2.cn, l.ccid,
        |      ROW_NUMBER() OVER (PARTITION BY q2.cid ORDER BY
        |        round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |          list_transform(range(1, len(q2.qcv)+1),
        |            i -> q2.qcv[i]*l.lv[i])),
        |          (p,q)->p+q) / (q2.qcn * l.lnm), 6) DESC, l.ccid) rn
        |    FROM qn2 q2 CROSS JOIN lrn l) t WHERE rn = 1),
        |v2c AS (SELECT vec_id, v, nrm, ccid FROM (
        |    SELECT n.vec_id, n.v, n.nrm, l.ccid,
        |      ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
        |        round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |          list_transform(range(1, len(n.v)+1),
        |            i -> n.v[i]*l.lv[i])),
        |          (p,q)->p+q) / (n.nrm * l.lnm), 6) DESC, l.ccid) rn
        |    FROM n CROSS JOIN lrn l) t
        |  WHERE rn <= ${graft.operators.IvfIndex.CoarseProbes}),
        |asg AS (SELECT vec_id, v, nrm, cid FROM (
        |    SELECT t2.vec_id, t2.v, t2.nrm, ch.cid,
        |      ROW_NUMBER() OVER (PARTITION BY t2.vec_id ORDER BY
        |        round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |          list_transform(range(1, len(t2.v)+1),
        |            i -> t2.v[i]*ch.cv[i])),
        |          (p,q)->p+q) / (t2.nrm * ch.cn), 6) DESC, ch.cid) rn
        |    FROM v2c t2 JOIN c2c ch ON ch.ccid = t2.ccid) x WHERE rn = 1),
        |asg2 AS (SELECT * FROM asg UNION ALL
        |  SELECT vec_id, v, nrm, cid FROM (
        |    SELECT n.vec_id, n.v, n.nrm, c.cid,
        |      ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
        |        round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |          list_transform(range(1, len(n.v)+1),
        |            i -> n.v[i]*c.cv[i])),
        |          (p,q)->p+q) / (n.nrm * c.cn), 6) DESC, c.cid) rn
        |    FROM n CROSS JOIN cents c
        |    WHERE n.vec_id NOT IN (SELECT vec_id FROM asg)) f
        |  WHERE rn = 1),
        |tocent AS (SELECT n.vec_id, n.v, n.nrm, c.cid,
        |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, len(n.v)+1), i -> n.v[i]*c.cv[i])),
        |        (p,q)->p+q) / (n.nrm * c.cn), 6) csim
        |  FROM n CROSS JOIN cents c
        |  WHERE n.vec_id % 9 = 0),
        |probes AS (SELECT q, qv, qn, cid FROM (
        |    SELECT vec_id q, v qv, nrm qn, cid,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id
        |                         ORDER BY csim DESC, cid) rn
        |    FROM tocent) t WHERE rn <= 3),
        |scored AS (SELECT p.q, a.vec_id nb,
        |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, len(p.qv)+1), i -> p.qv[i]*a.v[i])),
        |        (x,y)->x+y) / (p.qn * a.nrm), 6) sim
        |  FROM probes p JOIN asg2 a ON a.cid = p.cid AND a.vec_id <> p.q),
        |ranked AS (SELECT q, nb, sim,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q ORDER BY sim DESC, nb)
        |         AS INTEGER) rk FROM scored)
        |SELECT q, rk, nb, sim FROM ranked WHERE rk <= 5
        |ORDER BY q, rk""".stripMargin

  /** s11: full replay of the deterministic HNSW chain — coarse cells →
    * seed adjacency (top-6 by rounded cosine, id ties) → NN-descent
    * refinement rounds → M_max-pruned bidirectional layer-0 graph →
    * exact landing scan over the bounded layer-1 sample → fixed layer-0
    * beam hops → top-5. The refinement and hop chains are GENERATED
    * from [[graft.operators.HnswGraph]]'s constants (DefaultNnRounds,
    * DefaultEfUpper, DefaultEf0, DefaultHops0), so a schedule change
    * cannot drift the oracle. Every stage id-tie-broken and 6-rounded,
    * so the graph AND the search path replay exactly. The CHAIN (WITH
    * body ending in `res`) is shared with the s12 recall readout, so
    * the recall oracle replays the identical graph + search. */
  private def ddotSql(a: String, b: String) =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, len($a)+1), i -> $a[i]*$b[i])), " +
      "(p,q)->p+q)"

  private val S11Chain: String = {
    def ddot(a: String, b: String) = ddotSql(a, b)
    def hop(from: String, adj: String, ef: Int) =
      s"""(SELECT q, qv, qn, node, sim FROM (
         |  SELECT q, qv, qn, node, sim,
         |    ROW_NUMBER() OVER (PARTITION BY q ORDER BY sim DESC, node) rk
         |  FROM (
         |    SELECT q, qv, qn, node, sim FROM $from
         |    UNION
         |    SELECT f.q, f.qv, f.qn, a.dst node,
         |      round(${ddot("f.qv", "y.v")} / (f.qn * y.nrm), 6) sim
         |    FROM $from f
         |    JOIN $adj a ON a.src = f.node
         |    JOIN n y ON y.vec_id = a.dst) u) t
         | WHERE rk <= $ef)""".stripMargin
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v
       |           FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(${ddot("v", "v")}) nrm FROM e),
       |cnt AS (SELECT count(*) nn FROM e),
       |hh AS (SELECT min(x) h FROM range(3, 41) t(x), cnt
       |       WHERE CAST(power(2, x) AS BIGINT) * 64 >= nn),
       |ss AS (SELECT min(CAST(power(2, x) AS BIGINT)) stride
       |       FROM range(3, 41) t(x), cnt
       |       WHERE CAST(power(2, x) AS BIGINT) * 768 >= nn),
       |mm AS (SELECT ${graft.operators.HnswGraph.DefaultM}
       |         + ${graft.operators.HnswGraph.MPerDoubling} * b
       |         + ${graft.operators.HnswGraph.MPerDoubling}
       |         * greatest(0, b - ${graft.operators.HnswGraph.MSuperAfter})
       |         m
       |       FROM (SELECT CAST(min(x) AS INTEGER) b
       |             FROM range(0, 41) t(x), cnt
       |             WHERE CAST(power(2, x) AS BIGINT) * 16384 >= nn)),
       |dirs AS (SELECT vec_id i, v dv FROM e, hh WHERE vec_id < h),
       |bits AS (SELECT n.vec_id, d.i,
       |    CASE WHEN round(${ddot("n.v", "d.dv")}, 6) >= 0
       |         THEN 1 ELSE 0 END b,
       |    abs(round(${ddot("n.v", "d.dv")}, 6)) conf
       |  FROM n CROSS JOIN dirs d),
       |flip AS (SELECT vec_id, i fi FROM (
       |    SELECT vec_id, i, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY conf, i) rn FROM bits) t WHERE rn = 1),
       |cells AS (
       |  SELECT vec_id, string_agg(CAST(b AS VARCHAR), '' ORDER BY i) cid
       |  FROM bits GROUP BY vec_id
       |  UNION
       |  SELECT b.vec_id, string_agg(
       |      CAST(CASE WHEN b.i = f.fi THEN 1 - b.b ELSE b.b END
       |           AS VARCHAR), '' ORDER BY b.i) cid
       |  FROM bits b JOIN flip f ON f.vec_id = b.vec_id
       |  GROUP BY b.vec_id),
       |cand0 AS (SELECT DISTINCT a.vec_id src, b.vec_id dst
       |  FROM cells a JOIN cells b
       |    ON a.cid = b.cid AND a.vec_id <> b.vec_id),
       |sim0 AS (SELECT src, dst,
       |    round(${ddot("x.v", "y.v")} / (x.nrm * y.nrm), 6) sim
       |  FROM cand0 JOIN n x ON src = x.vec_id JOIN n y ON dst = y.vec_id),
       |nd_0 AS MATERIALIZED (SELECT src, dst, sim, rk FROM (
       |    SELECT src, dst, sim, ROW_NUMBER() OVER (PARTITION BY src
       |      ORDER BY sim DESC, dst) rk FROM sim0) t
       |  WHERE rk <= 2 * (SELECT m FROM mm)),
       |${
         // NN-descent rounds, generated from the same constants the
         // Scala build uses (HnswGraph.DefaultNnRounds / DefaultM):
         // symmetrize the FULL 2M pool, expand to
         // neighbors-of-neighbors, rescore, keep 2M per node.
         // MATERIALIZED throughout — each round's CTEs are referenced
         // 2-3×, and DuckDB's default inlining re-expands the chain
         // exponentially (the t18 lesson)
         (1 to graft.operators.HnswGraph.DefaultNnRounds).map { r =>
           val prev = s"nd_${r - 1}"
           s"""sym_$r AS MATERIALIZED (SELECT src, dst FROM $prev
              |  UNION SELECT dst, src FROM $prev),
              |cnd_$r AS (SELECT src, dst FROM sym_$r
              |  UNION SELECT a.src, b.dst FROM sym_$r a JOIN sym_$r b
              |    ON a.dst = b.src AND a.src <> b.dst),
              |sc_$r AS (SELECT src, dst,
              |    round(${ddot("x.v", "y.v")} / (x.nrm * y.nrm), 6) sim
              |  FROM cnd_$r JOIN n x ON src = x.vec_id
              |  JOIN n y ON dst = y.vec_id),
              |nd_$r AS MATERIALIZED (SELECT src, dst, sim, rk FROM (
              |    SELECT src, dst, sim, ROW_NUMBER() OVER (
              |      PARTITION BY src ORDER BY sim DESC, dst) rk
              |    FROM sc_$r) t
              |  WHERE rk <= 2 * (SELECT m FROM mm))"""
             .stripMargin
         }.mkString(",\n")
       },
       |rkd AS MATERIALIZED (SELECT src, dst, sim, rk
       |  FROM nd_${graft.operators.HnswGraph.DefaultNnRounds}),
       |crowd AS MATERIALIZED (SELECT a.src, a.dst adst, a.sim sima,
       |    a.rk, b.dst bdst
       |  FROM rkd a JOIN rkd b ON a.src = b.src AND b.rk < a.rk),
       |cov AS MATERIALIZED (SELECT adst, bdst,
       |    round(${ddot("x.v", "y.v")} / (x.nrm * y.nrm), 6) simab
       |  FROM (SELECT DISTINCT adst, bdst FROM crowd) p
       |  JOIN n x ON p.adst = x.vec_id JOIN n y ON p.bdst = y.vec_id),
       |prn AS (SELECT DISTINCT src, adst dst FROM crowd
       |  JOIN cov USING (adst, bdst) WHERE simab > sima),
       |adjf0 AS (SELECT src, dst, sim FROM (
       |    SELECT r.src, r.dst, r.sim,
       |      ROW_NUMBER() OVER (PARTITION BY r.src ORDER BY r.rk) rk2
       |    FROM rkd r LEFT JOIN prn p ON r.src = p.src AND r.dst = p.dst
       |    WHERE p.src IS NULL) t
       |  WHERE rk2 <= (SELECT m FROM mm)),
       |adjb0 AS (SELECT src, dst, max(sim) sim FROM (
       |    SELECT src, dst, sim FROM adjf0
       |    UNION ALL SELECT dst, src, sim FROM adjf0) u
       |  GROUP BY src, dst),
       |adj0 AS MATERIALIZED (SELECT src, dst FROM (
       |    SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src
       |      ORDER BY sim DESC, dst) rk FROM adjb0) t
       |  WHERE rk <= 2 * (SELECT m FROM mm)),
       |mem1 AS (SELECT vec_id, v, nrm FROM n, ss
       |         WHERE vec_id % stride = 0),
       |qs AS (SELECT vec_id q, v qv, nrm qn FROM n WHERE vec_id % 7 = 0),
       |f0 AS MATERIALIZED (SELECT q, qv, qn, node, sim FROM (
       |    SELECT q, qv, qn, node, sim,
       |      ROW_NUMBER() OVER (PARTITION BY q ORDER BY sim DESC, node) rk
       |    FROM (SELECT q, qv, qn, m.vec_id node,
       |        round(${ddot("qv", "m.v")} / (qn * m.nrm), 6) sim
       |      FROM qs CROSS JOIN mem1 m) s0) t
       |  WHERE rk <= ${graft.operators.HnswGraph.DefaultEfUpper}),
       |${
         (1 to graft.operators.HnswGraph.DefaultHops0).map { i =>
           val from = if (i == 1) "f0" else s"g_${i - 1}"
           s"g_$i AS MATERIALIZED ${hop(from, "adj0",
             graft.operators.HnswGraph.DefaultEf0)}"
         }.mkString(",\n")
       },
       |res AS (SELECT q, node nb, sim,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q ORDER BY sim DESC, node)
       |         AS INTEGER) rk
       |  FROM g_${graft.operators.HnswGraph.DefaultHops0} WHERE node <> q)"""
      .stripMargin
  }

  private val S11Sql: String =
    s"""WITH $S11Chain
       |SELECT q, rk, nb, sim FROM res WHERE rk <= 5
       |ORDER BY q, rk""".stripMargin

  /** s12: the graph tier's recall readout — same WITH chain as s11
    * (identical graph + search path), joined per query against the
    * exact brute top-5 over the same probe set. */
  private val S12Sql: String =
    s"""WITH $S11Chain,
       |ann AS (SELECT q, nb FROM res WHERE rk <= 5),
       |bs AS (SELECT qs.q, e2.vec_id nb,
       |    round(${ddotSql("qs.qv", "e2.v")} / (qs.qn * e2.nrm), 6) sim
       |  FROM qs JOIN n e2 ON e2.vec_id <> qs.q),
       |bt AS (SELECT q, nb FROM (
       |    SELECT q, nb, ROW_NUMBER() OVER (PARTITION BY q
       |      ORDER BY sim DESC, nb) rk FROM bs) t WHERE rk <= 5)
       |SELECT bt.q, CAST(count(*) AS BIGINT) k,
       |  CAST(count(ann.nb) AS BIGINT) n_hit,
       |  round(count(ann.nb) * 1.0 / count(*), 4) recall_at_k
       |FROM bt LEFT JOIN ann ON ann.q = bt.q AND ann.nb = bt.nb
       |GROUP BY bt.q ORDER BY bt.q""".stripMargin

  private val S03Sql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |n AS (SELECT vec_id, v,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, len(v)+1), i -> v[i]*v[i])),
        |      (p,q)->p+q)) nrm
        |  FROM e),
        |cents AS (SELECT vec_id cid, v cv, nrm cn FROM n WHERE vec_id < 8),
        |tocent AS (SELECT n.vec_id, n.v, n.nrm, c.cid,
        |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, len(n.v)+1), i -> n.v[i]*c.cv[i])),
        |        (p,q)->p+q) / (n.nrm * c.cn), 6) csim
        |  FROM n CROSS JOIN cents c),
        |asg AS (SELECT vec_id, v, nrm, cid FROM (
        |    SELECT vec_id, v, nrm, cid,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id
        |                         ORDER BY csim DESC, cid) rn
        |    FROM tocent) t WHERE rn = 1),
        |probes AS (SELECT q, qv, qn, cid FROM (
        |    SELECT vec_id q, v qv, nrm qn, cid,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id
        |                         ORDER BY csim DESC, cid) rn
        |    FROM tocent WHERE vec_id < 10) t WHERE rn <= 2),
        |scored AS (SELECT p.q, a.vec_id nb,
        |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, len(p.qv)+1), i -> p.qv[i]*a.v[i])),
        |        (x,y)->x+y) / (p.qn * a.nrm), 6) sim
        |  FROM probes p JOIN asg a ON a.cid = p.cid AND a.vec_id <> p.q),
        |ranked AS (SELECT q, nb, sim,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q ORDER BY sim DESC, nb)
        |         AS INTEGER) rk FROM scored)
        |SELECT q, rk, nb, sim FROM ranked WHERE rk <= 5
        |ORDER BY q, rk""".stripMargin

  /** The identical merge chain TextFunctions.bpeTokenCount compiles:
    * bracket every char, then one left-to-right replace per merge rule in
    * rank order — shared by the t11 and m06 oracles. */
  private def bpeChainSql: String =
    graft.functions.TextFunctions.BpeMerges.foldLeft(
      "regexp_replace(word, '(.)', '[\\1]', 'g')") {
      case (acc, (a, b)) => s"replace($acc, '[$a][$b]', '[$a$b]')"
    }

  /** The corpus word list the t19 oracle's rule filter is derived
    * against (the driver testdata's full 31-word vocabulary; the
    * ScaleData generator carries the same list). The oracle embeds an
    * OOV guard so a corpus that ever grows a word outside this list
    * poisons every oracle row to NULL — a loud hash mismatch, never a
    * silently-wrong count. */
  private val T19Vocab: Seq[String] = Seq(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window")

  /** t19's replace chain at the FULL 40k merge table, made expressible
    * by sound no-op elimination: a rule can fire on a word only if its
    * output (left||right) occurs as a substring of that word — the
    * halves must be ADJACENT — so rules whose output is a substring of
    * no corpus word are no-ops and drop from the chain without changing
    * the result (22 of 40,000 survive against [[T19Vocab]]; rank order
    * preserved, which is what makes the chain equivalent to the encode
    * loop on a well-formed unique-output table — the same equivalence
    * t11 hash-proves every round at the 35-rule fixture). */
  private def t19ChainSql: String = {
    val subs = T19Vocab.flatMap(w =>
      for { i <- 0 until w.length; j <- i + 1 to w.length }
        yield w.substring(i, j)).toSet
    graft.functions.BpeVocab.synthetic(40000)
      .filter { case (a, b) => subs.contains(a + b) }
      .foldLeft("regexp_replace(word, '(.)', '[\\1]', 'g')") {
        case (acc, (a, b)) => s"replace($acc, '[$a][$b]', '[$a$b]')"
      }
  }

  /** The t18 oracle, generated: eight unrolled BPE training rounds, each
    * round = pair count → argmax (ties → min pair string) → vocabulary
    * rewrite via the same left-to-right `replace` the engine applies.
    * Programmatic generation keeps the SQL honest — every round is the
    * identical three CTEs, only the round index varies.
    *
    * Every CTE is MATERIALIZED: each round references the previous
    * round's vocabulary more than once (pair scan + rewrite + two scalar
    * subqueries), and DuckDB's default CTE inlining would re-expand the
    * whole chain per reference — ~3^rounds copies of round 0 (measured:
    * the inlined form never finished at sf0.001; materialized it is
    * sub-second). */
  private def bpeTrainOracleSql(rounds: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH w0 AS MATERIALIZED (
        |    SELECT regexp_replace(w, '(.)', '[\1]', 'g') AS s, cnt
        |    FROM (SELECT w, count(*) AS cnt FROM (
        |        SELECT UNNEST(string_split_regex(trim(text), '\s+')) AS w
        |        FROM documents)
        |      WHERE regexp_matches(w, '^[a-z]+$') GROUP BY w))""".stripMargin)
    for (r <- 1 to rounds) {
      sb.append(s""",
        |p$r AS MATERIALIZED (
        |    SELECT UNNEST(list_transform(range(1, len(y)),
        |      i -> '[' || y[i] || '][' || y[i+1] || ']')) AS p, cnt
        |    FROM (SELECT string_split(substr(s, 2, length(s) - 2), '][') y,
        |          cnt FROM w${r - 1})
        |    WHERE len(y) >= 2),
        |b$r AS MATERIALIZED (
        |    SELECT p, CAST(sum(cnt) AS BIGINT) AS n FROM p$r GROUP BY p
        |    ORDER BY n DESC, p LIMIT 1),
        |w$r AS MATERIALIZED (
        |    SELECT replace(s, COALESCE((SELECT p FROM b$r), chr(1)),
        |      replace(COALESCE((SELECT p FROM b$r), chr(1)), '][', ''))
        |      AS s, cnt
        |    FROM w${r - 1})""".stripMargin)
    }
    sb.append("\nSELECT * FROM (\n")
    sb.append((1 to rounds).map { r =>
      s"""SELECT CAST($r AS INTEGER) AS merge_rank,
         |  string_split(substr(p, 2, length(p) - 2), '][')[1] AS lhs,
         |  string_split(substr(p, 2, length(p) - 2), '][')[2] AS rhs,
         |  replace(substr(p, 2, length(p) - 2), '][', '') AS merged,
         |  n AS n_occ FROM b$r""".stripMargin
    }.mkString("\nUNION ALL\n"))
    sb.append(")\nORDER BY merge_rank")
    sb.toString
  }

  val oracles: Map[String, String] = Map(
    "t18_bpe_train" -> bpeTrainOracleSql(8),
    "t01_token_stats" ->
      s"""WITH $W
         |SELECT doc_id, CAST(len(w) AS INTEGER) AS n_tokens,
         |       CAST(length(text) AS INTEGER) AS n_chars_m,
         |       CAST(len(regexp_extract_all(text,
         |            '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INTEGER) AS n_bpe
         |FROM words JOIN documents USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "t02_quality_score" ->
      s"""WITH $W
         |SELECT doc_id, CAST(len(w) AS INTEGER) AS n_tokens,
         |       round(len(list_distinct(w))*1.0/len(w), 4) AS distinct_ratio,
         |       round(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |          [CAST(length(x) AS BIGINT) for x in w]), (a,b)->a+b)
         |          *1.0/len(w), 4) AS mean_token_len,
         |       round((len(list_distinct(w))*1.0/len(w)) *
         |             least(len(w)/100.0, 1.0), 4) AS quality
         |FROM words ORDER BY doc_id""".stripMargin,
    "t03_lang_id" ->
      s"""WITH $W,
         |sc AS (SELECT doc_id,
         |  CAST(len(list_filter(w, t -> t='the' OR t='a')) AS INTEGER) s_en,
         |  CAST(len(list_filter(w, t -> t='der' OR t='und')) AS INTEGER) s_de,
         |  CAST(len(list_filter(w, t -> t='le' OR t='et')) AS INTEGER) s_fr,
         |  CAST(len(list_filter(w, t -> t='el' OR t='y')) AS INTEGER) s_es
         |  FROM words)
         |SELECT doc_id, s_en, s_de, s_fr, s_es,
         |  CASE WHEN s_en>=s_de AND s_en>=s_fr AND s_en>=s_es AND s_en>0 THEN 'en'
         |       WHEN s_de>=s_fr AND s_de>=s_es AND s_de>0 THEN 'de'
         |       WHEN s_fr>=s_es AND s_fr>0 THEN 'fr'
         |       WHEN s_es>0 THEN 'es' ELSE 'und' END AS lang_pred
         |FROM sc ORDER BY doc_id""".stripMargin,
    "t04_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    [CAST(ascii(x) AS BIGINT) for x in string_split(text,'')]),
        |    (a,b)->(a*31+b)%1000000007) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t05_trigram_lm" ->
      """WITH d AS (SELECT doc_id, text FROM documents
        |           WHERE length(text) >= 3),
        |tri AS (SELECT doc_id,
        |    UNNEST(list_transform(range(1, length(text) - 1),
        |      i -> substr(text, CAST(i AS INTEGER), 3))) AS tg
        |  FROM d),
        |big AS (SELECT
        |    UNNEST(list_transform(range(1, length(text)),
        |      i -> substr(text, CAST(i AS INTEGER), 2))) AS bg
        |  FROM d),
        |c3 AS (SELECT tg, count(*) AS c3 FROM tri GROUP BY tg),
        |c2 AS (SELECT bg, count(*) AS c2 FROM big GROUP BY bg),
        |v AS (SELECT t.doc_id, (c3.c3 * 1000000) // c2.c2 AS v
        |  FROM tri t JOIN c3 USING (tg)
        |       JOIN c2 ON c2.bg = substr(t.tg, 1, 2))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
        |       round(sum(v) * 1.0 / (count(*) * 1000000), 4) AS lm_score
        |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "t14_quality_tiers" ->
      s"""WITH $TIERSQL
         |SELECT lang, CAST(tier AS INTEGER) AS tier,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  min(score_ppm) AS min_ppm, max(score_ppm) AS max_ppm,
         |  CAST(sum(score_ppm) // count(*) AS BIGINT) AS avg_ppm
         |FROM tiers GROUP BY lang, tier ORDER BY lang, tier""".stripMargin,
    "p05_curriculum" ->
      s"""WITH $TIERSQL
         |SELECT doc_id, lang, score_ppm, CAST(tier AS INTEGER) AS tier,
         |  CAST(ROW_NUMBER() OVER (ORDER BY tier, score_ppm DESC, doc_id)
         |    AS BIGINT) AS curriculum_pos
         |FROM tiers ORDER BY curriculum_pos""".stripMargin,
    "p06_leakage_split" ->
      s"""WITH RECURSIVE $JAC,
         |$LSHCAND,
         |pairs AS (SELECT jac.a, jac.b FROM jac JOIN cand USING (a, b)
         |          WHERE jac >= 0.8),
         |edges AS (SELECT a src, b dst FROM pairs
         |          UNION ALL SELECT b, a FROM pairs),
         |reach(id, lbl) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.id = e.dst),
         |cl AS (SELECT id, min(lbl) lbl FROM reach GROUP BY id),
         |keyed AS (SELECT d.doc_id, COALESCE(cl.lbl, d.doc_id) split_key
         |          FROM documents d LEFT JOIN cl ON cl.id = d.doc_id),
         |bk AS (SELECT doc_id, split_key,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      [CAST(ascii(x) AS BIGINT)
         |       for x in string_split(CAST(split_key AS VARCHAR),'')]),
         |      (a,b)->(a*31+b)%1000000007) % 10 bkt
         |  FROM keyed)
         |SELECT doc_id, split_key,
         |       CASE WHEN bkt = 0 THEN 'test' WHEN bkt = 1 THEN 'val'
         |            ELSE 'train' END split
         |FROM bk ORDER BY doc_id""".stripMargin,
    "t17_html_extract" ->
      """WITH aug AS (SELECT doc_id,
        |    '<html><head><title>doc ' || CAST(doc_id AS VARCHAR) ||
        |    '</title><style>p{margin:0}</style></head><body>' ||
        |    '<nav>Home | About | Contact</nav><h1>Doc &amp; Title ' ||
        |    CAST(doc_id AS VARCHAR) || '</h1><p>' || text ||
        |    '</p><script>var x=1;</script>' ||
        |    '<footer>&copy; 2024 Example &lt;Corp&gt;</footer></body></html>'
        |      AS h0
        |  FROM documents),
        |s1 AS (SELECT doc_id,
        |    regexp_replace(h0, '<head>.*?</head>|<script>.*?</script>',
        |                   '', 'g') AS h1
        |  FROM aug),
        |ls AS (SELECT doc_id,
        |    list_filter(list_transform(string_split(
        |      regexp_replace(h1, '<[^>]*>', chr(10), 'g'), chr(10)),
        |      x -> trim(x)), x -> length(x) > 0) AS ls
        |  FROM s1),
        |kp AS (SELECT doc_id, len(ls) AS n_lines,
        |    list_filter(ls, x -> instr(x, ' | ') = 0
        |                AND substr(x, 1, 6) <> '&copy;') AS keep
        |  FROM ls),
        |ct AS (SELECT doc_id, CAST(len(keep) AS BIGINT) AS n_kept,
        |    CAST(n_lines - len(keep) AS BIGINT) AS n_dropped,
        |    replace(replace(replace(array_to_string(keep, ' '),
        |      '&lt;', '<'), '&gt;', '>'), '&amp;', '&') AS content
        |  FROM kp)
        |SELECT doc_id, n_kept, n_dropped,
        |  CAST(length(content) AS BIGINT) AS content_len,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    [CAST(ascii(x) AS BIGINT) for x in string_split(content,'')]),
        |    (a,b)->(a*31+b)%1000000007) AS content_fp
        |FROM ct ORDER BY doc_id""".stripMargin,
    "p08_epoch_manifest" -> {
      val chain = bpeChainSql
      s"""WITH $W,
         |k AS (SELECT doc_id,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      [CAST(ascii(x) AS BIGINT)
         |       for x in string_split('shuffle:42:' ||
         |                             CAST(doc_id AS VARCHAR),'')]),
         |      (a,b)->(a*31+b)%1000000007) AS h
         |  FROM documents),
         |o AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id)
         |        AS BIGINT) AS shuffle_pos
         |      FROM k),
         |t AS (SELECT doc_id,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(w, word ->
         |        CAST(len($chain) - len(replace($chain, '[', ''))
         |             AS BIGINT))),
         |      (a,b) -> a + b) AS n_bpe
         |  FROM words),
         |p AS (SELECT o.doc_id, shuffle_pos, n_bpe,
         |    CAST(COALESCE(SUM(n_bpe) OVER (ORDER BY shuffle_pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS strt
         |  FROM o JOIN t USING (doc_id))
         |SELECT doc_id, shuffle_pos, n_bpe, strt // 2048 AS seq_id,
         |       strt % 2048 AS seq_off, (strt // 2048) % 8 AS shard
         |FROM p ORDER BY doc_id""".stripMargin
    },
    "p07_corpus_shuffle" ->
      """WITH k AS (SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(x) AS BIGINT)
        |       for x in string_split('shuffle:42:' ||
        |                             CAST(doc_id AS VARCHAR),'')]),
        |      (a,b)->(a*31+b)%1000000007) AS h
        |  FROM documents)
        |SELECT doc_id, h,
        |  CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) AS BIGINT)
        |    AS shuffle_pos
        |FROM k ORDER BY shuffle_pos""".stripMargin,
    "t06_top_ngrams" ->
      s"""WITH $W,
         |bg AS (SELECT UNNEST(list_transform(range(1, len(w)),
         |         i -> w[i]||' '||w[i+1])) AS ngram
         |       FROM words WHERE len(w) >= 2),
         |c AS (SELECT ngram, count(*) n_occurrences FROM bg GROUP BY ngram),
         |r AS (SELECT CAST(ROW_NUMBER() OVER
         |               (ORDER BY n_occurrences DESC, ngram) AS INTEGER) rk,
         |             ngram, n_occurrences FROM c)
         |SELECT rk, ngram, n_occurrences FROM r WHERE rk <= 100
         |ORDER BY rk""".stripMargin,
    "t07_pii_redact" ->
      s"""WITH aug AS (SELECT doc_id,
         |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
         |    '@mail.example.com or +1-555-' ||
         |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
         |    ' ip 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
         |    CAST((doc_id * 7) % 256 AS VARCHAR) AS t0
         |  FROM documents),
         |red AS (SELECT doc_id,
         |    CAST(len(regexp_extract_all(t0,
         |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INTEGER)
         |      AS n_emails,
         |    CAST(len(regexp_extract_all(t0,
         |      '\\+[0-9][0-9().-]{6,}[0-9]')) AS INTEGER) AS n_phones,
         |    CAST(len(regexp_extract_all(t0,
         |      '\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b')) AS INTEGER) AS n_ips,
         |    regexp_replace(regexp_replace(regexp_replace(t0,
         |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
         |      '\\+[0-9][0-9().-]{6,}[0-9]', '[PHONE]', 'g'),
         |      '\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '[IP]', 'g') AS r
         |  FROM aug)
         |SELECT doc_id, n_emails, n_phones, n_ips,
         |  CAST(length(r) AS INTEGER) AS red_len,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    [CAST(ascii(x) AS BIGINT) for x in string_split(r,'')]),
         |    (a,b)->(a*31+b)%1000000007) AS red_fp
         |FROM red ORDER BY doc_id""".stripMargin,
    "t08_chunk_split" ->
      """WITH d AS (SELECT doc_id, text,
        |    1 + (greatest(length(text) - 200, 0) + 149) // 150 AS nc
        |  FROM documents),
        |ch AS (SELECT doc_id, text,
        |    UNNEST(range(0, nc)) AS chunk_idx FROM d),
        |cc AS (SELECT doc_id, chunk_idx,
        |    substr(text, CAST(1 + chunk_idx * 150 AS INTEGER), 200) AS chunk
        |  FROM ch)
        |SELECT doc_id, chunk_idx,
        |  CAST(length(chunk) AS INTEGER) AS chunk_len,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    [CAST(ascii(x) AS BIGINT) for x in string_split(chunk,'')]),
        |    (a,b)->(a*31+b)%1000000007) AS chunk_fp
        |FROM cc ORDER BY doc_id, chunk_idx""".stripMargin,
    "t09_repetition" ->
      s"""WITH $W,
         |w2 AS (SELECT doc_id, w FROM words WHERE len(w) >= 2),
         |f AS (SELECT doc_id, UNNEST(w) tok FROM w2),
         |fc AS (SELECT doc_id, tok, count(*) c FROM f GROUP BY 1, 2),
         |st AS (SELECT doc_id, CAST(sum(c) AS BIGINT) n_tokens, max(c) mc
         |       FROM fc GROUP BY doc_id),
         |top AS (SELECT fc.doc_id, min(tok) top_token
         |        FROM fc JOIN st ON st.doc_id = fc.doc_id AND fc.c = st.mc
         |        GROUP BY fc.doc_id),
         |bg AS (SELECT doc_id, UNNEST(list_transform(range(1, len(w)),
         |         i -> w[i]||' '||w[i+1])) AS b FROM w2),
         |br AS (SELECT doc_id,
         |         round(1 - count(DISTINCT b)*1.0/count(*), 4)
         |           AS dup_bigram_ratio
         |       FROM bg GROUP BY doc_id)
         |SELECT doc_id, n_tokens, top_token,
         |  round(mc*1.0/n_tokens, 4) AS top_token_ratio, dup_bigram_ratio
         |FROM st JOIN top USING (doc_id) JOIN br USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "d07_decontaminate" ->
      s"""WITH $W,
         |sh AS (SELECT doc_id,
         |    UNNEST(list_transform(range(1, len(w) - 6),
         |      i -> list_aggregate(w[i:i+7], 'string_agg', ' '))) AS s
         |  FROM words WHERE len(w) >= 8),
         |fp AS (SELECT DISTINCT doc_id,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      [CAST(ascii(x) AS BIGINT) for x in string_split(s,'')]),
         |      (a,b)->(a*31+b)%1000000007) f
         |  FROM sh),
         |ev AS (SELECT DISTINCT f FROM fp WHERE doc_id % 10 = 7)
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_contaminated_shingles
         |FROM fp JOIN ev USING (f) WHERE doc_id % 10 <> 7
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "a05_bloom_decontaminate" ->
      s"""WITH $W,
         |sh AS (SELECT doc_id,
         |    UNNEST(list_transform(range(1, len(w) - 6),
         |      i -> list_aggregate(w[i:i+7], 'string_agg', ' '))) AS s
         |  FROM words WHERE len(w) >= 8),
         |fp AS (SELECT DISTINCT doc_id,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      [CAST(ascii(x) AS BIGINT) for x in string_split(s,'')]),
         |      (a,b)->(a*31+b)%1000000007) f
         |  FROM sh),
         |ev AS (SELECT DISTINCT f FROM fp WHERE doc_id % 10 = 7),
         |pos AS (SELECT DISTINCT UNNEST([
         |    f % 4194304,
         |    (f % 4194304 + (1 + f % 4194303)) % 4194304,
         |    (f % 4194304 + 2*(1 + f % 4194303)) % 4194304]) p
         |  FROM ev),
         |wrd AS (SELECT p // 32 wi,
         |    bit_or(1::BIGINT << CAST(p % 32 AS INTEGER)) wd
         |  FROM pos GROUP BY p // 32),
         |pp AS (SELECT doc_id, f, UNNEST([
         |    f % 4194304,
         |    (f % 4194304 + (1 + f % 4194303)) % 4194304,
         |    (f % 4194304 + 2*(1 + f % 4194303)) % 4194304]) p
         |  FROM fp WHERE doc_id % 10 <> 7),
         |hits AS (SELECT doc_id, f
         |  FROM pp LEFT JOIN wrd ON pp.p // 32 = wrd.wi
         |  GROUP BY doc_id, f
         |  HAVING count(*) FILTER (WHERE
         |    ((COALESCE(wd, 0) >> CAST(p % 32 AS INTEGER)) & 1) = 1) = 3),
         |hx AS (SELECT h.doc_id, CASE WHEN e.f IS NULL THEN 0 ELSE 1 END ex
         |  FROM hits h LEFT JOIN ev e ON h.f = e.f)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bloom_hits,
         |  CAST(sum(ex) AS BIGINT) AS n_exact_hits,
         |  CAST(count(*) - sum(ex) AS BIGINT) AS n_false_pos
         |FROM hx GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "p02_sequence_pack" ->
      s"""WITH $W,
         |t AS (SELECT doc_id, CAST(len(w) AS BIGINT) n_tokens FROM words),
         |p AS (SELECT doc_id, n_tokens,
         |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS strt
         |  FROM t)
         |SELECT doc_id, n_tokens, strt // 2048 AS seq_id,
         |       strt % 2048 AS seq_off
         |FROM p ORDER BY doc_id""".stripMargin,
    "r05_dsir_select" ->
      s"""WITH $W,
         |bg AS (SELECT doc_id, lang,
         |    UNNEST(list_transform(range(1, len(w)),
         |      i -> w[i] || ' ' || w[i+1])) AS g
         |  FROM words JOIN documents USING (doc_id)
         |  WHERE len(w) >= 2),
         |f AS (SELECT doc_id, lang,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      [CAST(ascii(x) AS BIGINT) for x in string_split(g,'')]),
         |      (a,b)->(a*31+b)%1000000007) % 4096 AS b
         |  FROM bg),
         |cr AS (SELECT b, count(*) AS cr FROM f GROUP BY b),
         |ct AS (SELECT b, count(*) AS ct FROM f WHERE lang = 'en'
         |       GROUP BY b),
         |ra AS (SELECT cr.b,
         |    ((COALESCE(ct, 0) + 1) * 1000000) // (cr + 1) AS wgt
         |  FROM cr LEFT JOIN ct USING (b)),
         |sc AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_feats,
         |    CAST(sum(wgt) // count(*) AS BIGINT) AS score
         |  FROM f JOIN ra USING (b) GROUP BY doc_id, lang),
         |r AS (SELECT CAST(ROW_NUMBER() OVER
         |        (ORDER BY score DESC, doc_id) AS BIGINT) AS rk,
         |      doc_id, lang, n_feats, score FROM sc)
         |SELECT rk, doc_id, lang, n_feats, score FROM r WHERE rk <= 100
         |ORDER BY rk""".stripMargin,
    "r01_stratified_sample" ->
      """WITH b AS (SELECT doc_id, lang,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(x) AS BIGINT) for x in string_split(text,'')]),
        |      (a,b)->(a*31+b)%1000000007) % 10 AS bucket
        |  FROM documents)
        |SELECT doc_id, lang, bucket FROM b
        |WHERE bucket < (CASE WHEN lang = 'en' THEN 2 ELSE 5 END)
        |ORDER BY doc_id""".stripMargin,
    "a06_sketch_algebra" ->
      s"""WITH h AS (SELECT DISTINCT lang,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      [CAST(ascii(x) AS BIGINT) for x in string_split(text,'')]),
         |      (a,b)->(a*31+b)%1000000007) f
         |  FROM documents),
         |r AS (SELECT lang, f,
         |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY f) rk FROM h),
         |bu AS (SELECT lang, list(f ORDER BY f) vs FROM r WHERE rk <= 64
         |  GROUP BY lang),
         |ex AS (SELECT lang, CAST(count(*) AS BIGINT) n FROM h
         |  GROUP BY lang),
         |pm AS (SELECT a.lang lang_a, b.lang lang_b, a.vs va, b.vs vb,
         |    list_sort(list_distinct(a.vs || b.vs))[1:64] mu
         |  FROM bu a JOIN bu b ON a.lang < b.lang),
         |ix AS (SELECT x.lang lang_a, y.lang lang_b,
         |    CAST(count(*) AS BIGINT) ni
         |  FROM h x JOIN h y ON x.f = y.f AND x.lang < y.lang
         |  GROUP BY 1, 2)
         |SELECT lang_a, lang_b,
         |  round(${kmvEstSql("va")}, 4) AS est_a,
         |  round(${kmvEstSql("vb")}, 4) AS est_b,
         |  round(${kmvEstSql("mu")}, 4) AS est_union,
         |  round(greatest(0.0, ${kmvEstSql("va")} + ${kmvEstSql("vb")}
         |    - ${kmvEstSql("mu")}), 4) AS est_inter,
         |  ea.n + eb.n - COALESCE(ni, 0) AS n_union_exact,
         |  COALESCE(ni, 0) AS n_inter_exact
         |FROM pm JOIN ex ea ON ea.lang = lang_a
         |        JOIN ex eb ON eb.lang = lang_b
         |        LEFT JOIN ix USING (lang_a, lang_b)
         |ORDER BY lang_a, lang_b""".stripMargin,
    "t15_gopher_rules" ->
      s"""WITH $W,
         |base AS (SELECT d.doc_id, d.text, words.w
         |  FROM documents d JOIN words ON d.doc_id = words.doc_id),
         |cnt AS (SELECT doc_id,
         |    CAST(len(w) AS BIGINT) n_words,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(w, x -> CAST(length(x) AS BIGINT))),
         |      (a,b)->a+b) sum_len,
         |    CAST(length(text) - length(replace(text, '#', ''))
         |      + (length(text) - length(replace(text, '...', ''))) // 3
         |      AS BIGINT) n_sym,
         |    CAST(len(string_split(text, chr(10))) AS BIGINT) n_lines,
         |    CAST(len(list_filter(string_split(text, chr(10)),
         |      l -> substr(ltrim(l), 1, 1) IN ('-', '*'))) AS BIGINT)
         |      n_bullet,
         |    CAST(len(list_filter(string_split(text, chr(10)),
         |      l -> l LIKE '%...')) AS BIGINT) n_ell,
         |    CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
         |      AS BIGINT) n_alpha,
         |    (CASE WHEN list_contains(w, 'the') THEN 1 ELSE 0 END
         |     + CASE WHEN list_contains(w, 'be') THEN 1 ELSE 0 END
         |     + CASE WHEN list_contains(w, 'to') THEN 1 ELSE 0 END
         |     + CASE WHEN list_contains(w, 'of') THEN 1 ELSE 0 END
         |     + CASE WHEN list_contains(w, 'and') THEN 1 ELSE 0 END
         |     + CASE WHEN list_contains(w, 'that') THEN 1 ELSE 0 END
         |     + CASE WHEN list_contains(w, 'have') THEN 1 ELSE 0 END
         |     + CASE WHEN list_contains(w, 'with') THEN 1 ELSE 0 END)
         |      n_stop
         |  FROM base),
         |fl AS (SELECT doc_id, n_words,
         |    CAST(n_words >= 50 AND n_words <= 100000 AS INTEGER) pass_wc,
         |    CAST(sum_len >= 3 * n_words AND sum_len <= 10 * n_words
         |      AS INTEGER) pass_mwl,
         |    CAST(10 * n_sym < n_words AS INTEGER) pass_sym,
         |    CAST(10 * n_bullet < 9 * n_lines AS INTEGER) pass_bullet,
         |    CAST(10 * n_ell < 3 * n_lines AS INTEGER) pass_ellipsis,
         |    CAST(10 * n_alpha > 8 * n_words AS INTEGER) pass_alpha,
         |    CAST(n_stop >= 2 AS INTEGER) pass_stop
         |  FROM cnt)
         |SELECT doc_id, n_words, pass_wc, pass_mwl, pass_sym, pass_bullet,
         |  pass_ellipsis, pass_alpha, pass_stop,
         |  CAST(pass_wc * pass_mwl * pass_sym * pass_bullet * pass_ellipsis
         |    * pass_alpha * pass_stop AS INTEGER) pass_all
         |FROM fl ORDER BY doc_id""".stripMargin,
    "t16_table_profile" ->
      """WITH f AS (
        |  SELECT 'doc_id' col_name, CAST(doc_id AS VARCHAR) v FROM documents
        |  UNION ALL SELECT 'lang', lang FROM documents
        |  UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR) FROM documents
        |  UNION ALL SELECT 'source', source FROM documents
        |  UNION ALL SELECT 'text', text FROM documents),
        |nr AS (SELECT CAST(count(*) AS BIGINT) n_rows FROM documents),
        |h AS (SELECT DISTINCT col_name,
        |    (list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(x) AS BIGINT) for x in string_split(v,'')]),
        |      (a,b)->(a*31+b)%1000000007) * 1103515245) % 1000000007 h
        |  FROM f WHERE v IS NOT NULL),
        |r AS (SELECT col_name, h,
        |    ROW_NUMBER() OVER (PARTITION BY col_name ORDER BY h) rk FROM h),
        |kth AS (SELECT col_name, h hk FROM r WHERE rk = 64),
        |cnt AS (SELECT col_name, count(*) nd FROM h GROUP BY col_name),
        |nulls AS (SELECT col_name,
        |    CAST(count(*) FILTER (v IS NULL) AS BIGINT) n_null
        |  FROM f GROUP BY col_name)
        |SELECT cnt.col_name, nr.n_rows, nulls.n_null,
        |  round(CASE WHEN kth.hk IS NULL THEN cnt.nd * 1.0
        |        ELSE 63.0 * 1000000007 / kth.hk END, 4) AS distinct_est
        |FROM cnt CROSS JOIN nr
        |     JOIN nulls ON nulls.col_name = cnt.col_name
        |     LEFT JOIN kth ON kth.col_name = cnt.col_name
        |ORDER BY cnt.col_name""".stripMargin,
    "r04_source_cap" ->
      """WITH f AS (SELECT source, doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(x) AS BIGINT)
        |       for x in string_split(CAST(doc_id AS VARCHAR),'')]),
        |      (a,b)->(a*31+b)%1000000007) fp
        |  FROM documents),
        |r AS (SELECT source, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY fp, doc_id) rk
        |  FROM f)
        |SELECT source, doc_id FROM r WHERE rk <= 10
        |ORDER BY source, doc_id""".stripMargin,
    "a02_kmv_distinct" ->
      """WITH h AS (SELECT DISTINCT lang,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(x) AS BIGINT) for x in string_split(text,'')]),
        |      (a,b)->(a*31+b)%1000000007) h
        |  FROM documents),
        |r AS (SELECT lang, h,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h) rk FROM h),
        |kth AS (SELECT lang, h hk FROM r WHERE rk = 64),
        |cnt AS (SELECT lang, count(*) n_exact FROM h GROUP BY lang)
        |SELECT cnt.lang, CAST(cnt.n_exact AS BIGINT) AS n_exact,
        |  round(CASE WHEN kth.hk IS NULL THEN cnt.n_exact * 1.0
        |        ELSE 63.0 * 1000000007 / kth.hk END, 4) AS kmv_est
        |FROM cnt LEFT JOIN kth ON kth.lang = cnt.lang
        |ORDER BY cnt.lang""".stripMargin,
    "a04_hashrank_quantiles" ->
      """WITH keyed AS (SELECT l_extendedprice v,
        |    CAST(l_orderkey AS VARCHAR)||'|'||CAST(l_linenumber AS VARCHAR)
        |      ||'|'||CAST(l_partkey AS VARCHAR)||'|'||CAST(l_suppkey AS VARCHAR) kstr
        |  FROM lineitem),
        |fph AS (SELECT v, kstr,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(x) AS BIGINT) for x in string_split(kstr,'')]),
        |      (a,b)->(a*31+b)%1000000007) fp
        |  FROM keyed),
        |samp AS (SELECT v, kstr FROM fph ORDER BY fp, kstr, v LIMIT 128),
        |ranked AS (SELECT v,
        |    ROW_NUMBER() OVER (ORDER BY v, kstr) rk,
        |    count(*) OVER () n FROM samp),
        |ps AS (SELECT UNNEST([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
        |                      CAST(0.75 AS DOUBLE), CAST(0.95 AS DOUBLE)]) p)
        |SELECT p, v AS value FROM ps JOIN ranked
        |  ON rk = 1 + floor(p * (n - 1))
        |ORDER BY p""".stripMargin,
    "t13_bm25" ->
      s"""WITH $W,
         |d AS (SELECT doc_id, w, CAST(len(w) AS DOUBLE) dl FROM words),
         |stats AS (SELECT CAST(count(*) AS DOUBLE) n_docs,
         |    sum(dl) / CAST(count(*) AS DOUBLE) avgdl FROM d),
         |tf AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) tf
         |  FROM (SELECT doc_id, dl, UNNEST(w) t FROM d)
         |  WHERE t IN ('spark', 'vector', 'join')
         |  GROUP BY doc_id, dl, t),
         |dfreq AS (SELECT t, CAST(count(*) AS DOUBLE) df FROM tf GROUP BY t),
         |scored AS (SELECT doc_id, tf.t,
         |    ((n_docs - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)))
         |      * (tf * CAST(2.2 AS DOUBLE))
         |      / (tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
         |           + CAST(0.75 AS DOUBLE) * dl / avgdl)) ts
         |  FROM tf JOIN dfreq ON tf.t = dfreq.t CROSS JOIN stats),
         |perdoc AS (SELECT doc_id,
         |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(ts ORDER BY t)), (a,b)->a+b), 6) score
         |  FROM scored GROUP BY doc_id),
         |top AS (SELECT doc_id, score FROM perdoc
         |  ORDER BY score DESC, doc_id LIMIT 10)
         |SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
         |       AS INTEGER) rk, doc_id, score
         |FROM top ORDER BY rk""".stripMargin,
    "s09_knn_label" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v
        |  FROM embeddings),
        |n AS (SELECT vec_id, label, v,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, len(v)+1), i -> v[i]*v[i])),
        |      (p,q)->p+q)) nrm
        |  FROM e),
        |q AS (SELECT vec_id q, label true_label, v qv, nrm qn FROM n
        |  WHERE vec_id % 5 = 0),
        |lab AS (SELECT vec_id nb, label, v, nrm FROM n
        |  WHERE vec_id % 5 <> 0),
        |scored AS (SELECT q.q, q.true_label, lab.nb, lab.label,
        |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, len(q.qv)+1), i -> q.qv[i]*lab.v[i])),
        |        (p,s)->p+s) / (q.qn * lab.nrm), 6) sim
        |  FROM q CROSS JOIN lab),
        |knn AS (SELECT q, true_label, label FROM (
        |    SELECT q, true_label, label,
        |      ROW_NUMBER() OVER (PARTITION BY q ORDER BY sim DESC, nb) rk
        |    FROM scored) t WHERE rk <= 10),
        |votes AS (SELECT q, true_label, label, count(*) n_votes
        |  FROM knn GROUP BY q, true_label, label)
        |SELECT q AS vec_id, label AS pred_label,
        |  CAST(n_votes AS BIGINT) AS n_votes,
        |  CAST(label = true_label AS INTEGER) AS correct
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q
        |        ORDER BY n_votes DESC, label) vr FROM votes) t
        |WHERE vr = 1 ORDER BY vec_id""".stripMargin,
    "d13_source_overlap" ->
      s"""WITH $FP,
         |sfp AS (SELECT DISTINCT d.source, fp.f
         |  FROM fp JOIN documents d USING (doc_id)),
         |card AS (SELECT source, count(*) n FROM sfp GROUP BY source),
         |inter AS (SELECT x.source a, y.source b, count(*) i
         |  FROM sfp x JOIN sfp y ON x.f = y.f AND x.source < y.source
         |  GROUP BY x.source, y.source)
         |SELECT a AS src_a, b AS src_b, CAST(i AS BIGINT) AS n_common,
         |  round(CAST(i AS DOUBLE) / CAST(ca.n + cb.n - i AS DOUBLE), 6)
         |    AS jac
         |FROM inter JOIN card ca ON ca.source = a
         |           JOIN card cb ON cb.source = b
         |ORDER BY src_a, src_b""".stripMargin,
    "s08_spherical_kmeans" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> floor(x * CAST(1000000 AS DOUBLE))) v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, len(v)+1), i -> v[i]*v[i])),
        |      (p,q)->p+q)) nrm
        |  FROM e),
        |c0 AS (SELECT vec_id cid, v cv, nrm cn FROM n WHERE vec_id < 8),
        |sim0 AS (SELECT n.vec_id, n.v, n.nrm, c.cid,
        |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, len(n.v)+1), i -> n.v[i]*c.cv[i])),
        |        (p,q)->p+q) / (n.nrm * c.cn), 6) csim
        |  FROM n CROSS JOIN c0 c),
        |asg0 AS (SELECT vec_id, v, cid FROM (
        |    SELECT vec_id, v, cid,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id
        |                         ORDER BY csim DESC, cid) rn
        |    FROM sim0) t WHERE rn = 1),
        |pos AS (SELECT UNNEST(range(1, 65)) i),
        |sums AS (SELECT cid, i, sum(v[i]) sv_i
        |  FROM asg0 CROSS JOIN pos GROUP BY cid, i),
        |c1 AS (SELECT cid, sv,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, len(sv)+1), i -> sv[i]*sv[i])),
        |      (p,q)->p+q)) sn
        |  FROM (SELECT cid, list(sv_i ORDER BY i) sv FROM sums GROUP BY cid)),
        |sim1 AS (SELECT n.vec_id, c.cid,
        |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, len(n.v)+1), i -> n.v[i]*c.sv[i])),
        |        (p,q)->p+q) / (n.nrm * c.sn), 6) csim
        |  FROM n CROSS JOIN c1 c),
        |asg1 AS (SELECT vec_id, cid, csim FROM (
        |    SELECT vec_id, cid, csim,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id
        |                         ORDER BY csim DESC, cid) rn
        |    FROM sim1) t WHERE rn = 1)
        |SELECT vec_id, cid AS cluster, csim AS sim FROM asg1
        |ORDER BY vec_id""".stripMargin,
    "t10_normalize" ->
      """WITH c AS (SELECT doc_id, text,
        |    lower(regexp_replace(trim(text), '\s+', ' ', 'g')) canon
        |  FROM documents)
        |SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    [CAST(ascii(x) AS BIGINT) for x in string_split(canon,'')]),
        |    (a,b)->(a*31+b)%1000000007) AS canon_fp,
        |  CAST(length(text) - length(canon) AS BIGINT) AS delta_len
        |FROM c ORDER BY doc_id""".stripMargin,
    "t11_bpe_tokens" -> {
      val chain = bpeChainSql
      s"""WITH $W
         |SELECT doc_id,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(w, word ->
         |      CAST(len($chain) - len(replace($chain, '[', ''))
         |           AS BIGINT))),
         |    (a,b) -> a + b) AS n_bpe,
         |  CAST(len(regexp_extract_all(text,
         |    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INTEGER) AS n_bpe_est
         |FROM words JOIN documents USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },
    "m06_interleaved_pack" -> {
      val chain = bpeChainSql
      s"""WITH $W,
         |t AS (SELECT doc_id,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(w, word ->
         |        CAST(len($chain) - len(replace($chain, '[', ''))
         |             AS BIGINT))),
         |      (a,b) -> a + b) AS n_text_tokens
         |  FROM words),
         |c AS (SELECT doc_id, n_text_tokens,
         |    CAST(doc_id % 3 AS BIGINT) AS n_images,
         |    n_text_tokens + (doc_id % 3) * 64 AS cost
         |  FROM t),
         |p AS (SELECT doc_id, n_text_tokens, n_images, cost,
         |    CAST(COALESCE(SUM(cost) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS strt
         |  FROM c)
         |SELECT doc_id, n_text_tokens, n_images, cost,
         |       strt // 2048 AS seq_id, strt % 2048 AS seq_off
         |FROM p ORDER BY doc_id""".stripMargin
    },
    "t19_bpe_vocab_scale" -> {
      // the 40k-table chain with no-op rules eliminated (t19ChainSql);
      // the OOV guard poisons every row on corpus-vocabulary drift
      val chain = t19ChainSql
      val vocabList = T19Vocab.map(w => s"'$w'").mkString(", ")
      s"""WITH $W,
         |sw AS (SELECT doc_id, w FROM words WHERE doc_id % 11 = 0),
         |oov AS (SELECT count(*) c FROM (
         |    SELECT UNNEST(w) word FROM sw) t
         |  WHERE word NOT IN ($vocabList)),
         |cnt AS (SELECT doc_id,
         |    CASE WHEN (SELECT c FROM oov) > 0 THEN NULL ELSE
         |      list_reduce(list_prepend(CAST(0 AS BIGINT),
         |        list_transform(w, word ->
         |          CAST(len($chain) - len(replace($chain, '[', ''))
         |               AS BIGINT))),
         |        (a,b) -> a + b) END AS n_bpe
         |  FROM sw)
         |SELECT c.doc_id, c.n_bpe,
         |  round(CAST(d.n_chars AS DOUBLE) / greatest(c.n_bpe, 1), 4)
         |    AS chars_per_token
         |FROM cnt c JOIN documents d USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },
    "t12_hashed_classifier" ->
      s"""WITH $W,
         |mdl AS (SELECT list_transform(range(0, 1024),
         |          j -> (j * 2654435761) % 2001 - 1000) wv),
         |sc AS (SELECT doc_id, CAST(len(w) AS BIGINT) n_toks,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(w, t ->
         |        wv[CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |              [CAST(ascii(x) AS BIGINT) for x in string_split(t,'')]),
         |              (a,b)->(a*31+b)%1000000007) % 1024 AS INTEGER) + 1])),
         |      (a,b) -> a + b) logit
         |  FROM words CROSS JOIN mdl)
         |SELECT doc_id, n_toks, logit,
         |       CAST(logit > 0 AS BIGINT) keep
         |FROM sc ORDER BY doc_id""".stripMargin,
    "a03_cms_freq" ->
      """WITH words AS (SELECT string_split_regex(trim(text), '\s+') w
        |               FROM documents),
        |tk AS (SELECT UNNEST(w) tok FROM words),
        |tf AS (SELECT tok,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(x) AS BIGINT) for x in string_split(tok,'')]),
        |      (a,b)->(a*31+b)%1000000007) f
        |  FROM tk),
        |cells AS (SELECT f, UNNEST(range(0,4)) i FROM tf),
        |cc AS (SELECT i, (f*(2*i+3)+(11+i)) % 1000000007 % 32 cell,
        |              count(*) c
        |       FROM cells GROUP BY 1, 2),
        |exact AS (SELECT tok, f, count(*) n FROM tf GROUP BY tok, f),
        |top AS (SELECT tok, f, n FROM (
        |    SELECT tok, f, n,
        |      ROW_NUMBER() OVER (ORDER BY n DESC, tok) rk FROM exact) t
        |  WHERE rk <= 20),
        |probe AS (SELECT tok, n, i,
        |    (f*(2*i+3)+(11+i)) % 1000000007 % 32 cell
        |  FROM top CROSS JOIN (SELECT UNNEST(range(0,4)) i))
        |SELECT p.tok, CAST(p.n AS BIGINT) n_exact,
        |       CAST(min(cc.c) AS BIGINT) n_cms
        |FROM probe p JOIN cc ON cc.i = p.i AND cc.cell = p.cell
        |GROUP BY p.tok, p.n
        |ORDER BY n_exact DESC, p.tok""".stripMargin,
    "r02_topk_sample" ->
      """WITH h AS (SELECT doc_id, lang,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(x) AS BIGINT) for x in string_split(text,'')]),
        |      (a,b)->(a*31+b)%1000000007) h
        |  FROM documents),
        |r AS (SELECT doc_id, lang,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id)
        |         AS BIGINT) rk
        |  FROM h)
        |SELECT doc_id, lang, rk FROM r WHERE rk <= 20
        |ORDER BY lang, rk""".stripMargin,
    "r03_temperature_sample" ->
      """WITH m AS (SELECT source, SUM(n_chars) mass FROM documents
        |           GROUP BY source),
        |wg AS (SELECT source,
        |    CAST(floor(sqrt(CAST(mass AS DOUBLE))) AS BIGINT) wgt FROM m),
        |al AS (SELECT source, wgt, SUM(wgt) OVER () sw FROM wg),
        |ba AS (SELECT source, (200*wgt)//sw base, (200*wgt)%sw rem FROM al),
        |po AS (SELECT source, base, 200 - SUM(base) OVER () leftn,
        |    CAST(ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS BIGINT) pos
        |  FROM ba),
        |quotas AS (SELECT source,
        |    base + CASE WHEN pos <= leftn THEN 1 ELSE 0 END quota FROM po),
        |h AS (SELECT doc_id, source,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(x) AS BIGINT) for x in string_split(text,'')]),
        |      (a,b)->(a*31+b)%1000000007) h
        |  FROM documents),
        |r AS (SELECT source, doc_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id)
        |         AS BIGINT) rk
        |  FROM h)
        |SELECT r.source, r.doc_id, r.rk
        |FROM r JOIN quotas q ON r.source = q.source
        |WHERE r.rk <= q.quota ORDER BY r.source, r.rk""".stripMargin,
    "p04_data_mixture" ->
      """WITH d AS (SELECT doc_id, lang,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(x) AS BIGINT) for x in string_split(text,'')]),
        |      (a,b)->(a*31+b)%1000000007) h
        |  FROM documents),
        |c AS (SELECT lang, count(*) n_in FROM d GROUP BY lang),
        |q AS (SELECT lang, n_in,
        |    CASE WHEN lang='en' THEN 2 ELSE 3 END num,
        |    CASE WHEN lang='en' THEN 5
        |         ELSE 5*((SELECT count(*) FROM c)-1) END den
        |  FROM c),
        |q2 AS (SELECT lang, n_in, num, den, n_in*den//num cap FROM q),
        |q4 AS (SELECT lang, n_in,
        |    (SELECT min(cap) FROM q2)*num//den quota FROM q2),
        |r AS (SELECT doc_id, lang,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id) rk
        |  FROM d),
        |kept AS (SELECT r.lang, r.doc_id FROM r
        |         JOIN q4 USING (lang) WHERE rk <= quota)
        |SELECT q4.lang, CAST(q4.n_in AS BIGINT) n_in,
        |       CAST(q4.quota AS BIGINT) quota,
        |       CAST(count(k.doc_id) AS BIGINT) n_kept,
        |       min(k.doc_id) keep_min, max(k.doc_id) keep_max
        |FROM q4 LEFT JOIN kept k ON k.lang = q4.lang
        |GROUP BY q4.lang, q4.n_in, q4.quota
        |ORDER BY q4.lang""".stripMargin,
    "l01_zorder_layout" ->
      """WITH words AS (SELECT doc_id, n_chars,
        |    string_split_regex(trim(text), '\s+') w FROM documents),
        |d AS (SELECT doc_id, n_chars % 256 za, len(w) % 256 zb FROM words),
        |z AS (SELECT doc_id, za, zb,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(range(0, 8), i ->
        |      (((za >> i) & 1) << (2*i)) + (((zb >> i) & 1) << (2*i+1)))),
        |    (a,b)->a+b) AS BIGINT) zkey
        |  FROM d)
        |SELECT doc_id, CAST(za AS BIGINT) AS za, CAST(zb AS BIGINT) AS zb,
        |       zkey, zkey // 8192 AS bucket
        |FROM z ORDER BY doc_id""".stripMargin,
    "l02_snapshot_merge" ->
      """WITH fp0 AS (SELECT doc_id, source, n_chars,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(x) AS BIGINT) for x in string_split(text,'')]),
        |      (a,b)->(a*31+b)%1000000007) AS f1,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(x) AS BIGINT)
        |       for x in string_split(text || ' v2','')]),
        |      (a,b)->(a*31+b)%1000000007) AS f2
        |  FROM documents),
        |allr AS (
        |  SELECT doc_id, CAST(1 AS BIGINT) AS version, source, n_chars,
        |         f1 AS content_fp, 'U' AS op FROM fp0
        |  UNION ALL
        |  SELECT doc_id, 2, source, n_chars + 3, f2, 'U' FROM fp0
        |  WHERE doc_id % 7 = 3
        |  UNION ALL
        |  SELECT doc_id, 3, source, n_chars, f1, 'D' FROM fp0
        |  WHERE doc_id % 13 = 5),
        |w AS (SELECT *, ROW_NUMBER() OVER
        |        (PARTITION BY doc_id ORDER BY version DESC,
        |         CASE WHEN op = 'D' THEN 1 ELSE 0 END DESC) rn
        |      FROM allr)
        |SELECT doc_id, version, source, n_chars, content_fp
        |FROM w WHERE rn = 1 AND op = 'U' ORDER BY doc_id""".stripMargin,
    "l03_time_travel" ->
      """WITH fp0 AS (SELECT doc_id, source, n_chars,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(x) AS BIGINT) for x in string_split(text,'')]),
        |      (a,b)->(a*31+b)%1000000007) AS f1,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(x) AS BIGINT)
        |       for x in string_split(text || ' v2','')]),
        |      (a,b)->(a*31+b)%1000000007) AS f2
        |  FROM documents),
        |s0 AS (SELECT doc_id, CAST(1 AS BIGINT) AS version, source,
        |         n_chars, f1 AS content_fp FROM fp0),
        |s1 AS (SELECT s.doc_id,
        |         CASE WHEN s.doc_id % 7 = 3 THEN CAST(2 AS BIGINT)
        |              ELSE s.version END AS version, s.source,
        |         CASE WHEN s.doc_id % 7 = 3 THEN s.n_chars + 3
        |              ELSE s.n_chars END AS n_chars,
        |         CASE WHEN s.doc_id % 7 = 3 THEN f.f2
        |              ELSE s.content_fp END AS content_fp
        |  FROM s0 s JOIN fp0 f ON s.doc_id = f.doc_id),
        |s2 AS (SELECT * FROM s1 WHERE doc_id % 13 <> 5)
        |SELECT CAST(0 AS BIGINT) epoch, doc_id, version, source,
        |       n_chars, content_fp FROM s0
        |UNION ALL
        |SELECT CAST(1 AS BIGINT), doc_id, version, source, n_chars,
        |       content_fp FROM s1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), doc_id, version, source, n_chars,
        |       content_fp FROM s2
        |ORDER BY epoch, doc_id""".stripMargin,
    "p03_export_manifest" ->
      """WITH fp AS (SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(x) AS BIGINT) for x in string_split(
        |        coalesce(CAST(doc_id AS VARCHAR), chr(2)) || chr(1) ||
        |        coalesce(lang, chr(2)) || chr(1) ||
        |        coalesce(text, chr(2)),
        |        '')]),
        |      (a,b)->(a*31+b)%1000000007) AS rfp,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(x) AS BIGINT) for x in string_split(
        |        CAST(doc_id AS VARCHAR), '')]),
        |      (a,b)->(a*31+b)%1000000007) % 8 AS shard
        |  FROM documents)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
        |       bit_xor(rfp) AS checksum,
        |       min(doc_id) AS key_min, max(doc_id) AS key_max
        |FROM fp GROUP BY shard ORDER BY shard""".stripMargin,
    "p01_curation_pipeline" ->
      s"""WITH words0 AS (SELECT doc_id, text,
         |        string_split_regex(trim(text), '\\s+') w FROM documents),
         |sc AS (SELECT doc_id, text, CAST(len(w) AS INTEGER) n_tokens,
         |    round((len(list_distinct(w))*1.0/len(w)) *
         |          least(len(w)/100.0, 1.0), 4) quality,
         |    len(list_filter(w, t -> t='the' OR t='a')) s_en,
         |    len(list_filter(w, t -> t='der' OR t='und')) s_de,
         |    len(list_filter(w, t -> t='le' OR t='et')) s_fr,
         |    len(list_filter(w, t -> t='el' OR t='y')) s_es
         |  FROM words0),
         |en AS (SELECT doc_id, text, n_tokens, quality FROM sc
         |  WHERE s_en>=s_de AND s_en>=s_fr AND s_en>=s_es AND s_en>0
         |    AND quality >= 0.3),
         |keep2 AS (SELECT doc_id, text, n_tokens, quality FROM (
         |    SELECT doc_id, text, n_tokens, quality,
         |      ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) rn
         |    FROM en) t WHERE rn = 1),
         |${JACfrom("keep2")},
         |$LSHCAND,
         |removed AS (SELECT DISTINCT b FROM jac JOIN cand USING (a, b)
         |            WHERE jac >= 0.8)
         |SELECT doc_id, n_tokens, quality FROM keep2
         |WHERE doc_id NOT IN (SELECT b FROM removed)
         |ORDER BY doc_id""".stripMargin,
    "d01_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,
    "d02_dedup_ngram_jaccard" ->
      s"""WITH $JAC
         |SELECT a, b, round(jac, 4) AS jac FROM jac
         |WHERE jac >= 0.8 ORDER BY a, b""".stripMargin,
    "d03_dedup_minhash_lsh" ->
      s"""WITH $JAC,
         |$LSHCAND
         |SELECT a, b, round(jac, 4) AS jac
         |FROM jac JOIN cand USING (a, b)
         |WHERE jac >= 0.8 ORDER BY a, b""".stripMargin,
    "d04_dedup_simhash" ->
      s"""WITH $FP,
         |bits AS (SELECT doc_id, j,
         |    CASE WHEN SUM(CASE WHEN (f*(2*j+3)+j) % 1000000007 % 2 = 1
         |                       THEN 1 ELSE -1 END) > 0
         |         THEN CAST(1 AS BIGINT) ELSE 0 END AS bt
         |  FROM fp CROSS JOIN (SELECT UNNEST(range(0,32)) j)
         |  GROUP BY doc_id, j),
         |sh AS (SELECT doc_id, CAST(SUM(bt << j) AS BIGINT) h
         |       FROM bits GROUP BY doc_id)
         |SELECT x.doc_id a, y.doc_id b,
         |       CAST(bit_count(xor(x.h, y.h)) AS INTEGER) AS hamming
         |FROM sh x JOIN sh y ON x.doc_id < y.doc_id
         |WHERE bit_count(xor(x.h, y.h)) <= 5
         |ORDER BY a, b""".stripMargin,
    "d08_dup_clusters" ->
      s"""WITH RECURSIVE $JAC,
         |$LSHCAND,
         |pairs AS (SELECT jac.a, jac.b FROM jac JOIN cand USING (a, b)
         |          WHERE jac >= 0.8),
         |edges AS (SELECT a src, b dst FROM pairs
         |          UNION ALL SELECT b, a FROM pairs),
         |reach(id, lbl) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.id = e.dst)
         |SELECT id AS doc_id, min(lbl) AS cluster_id,
         |       CAST(CASE WHEN id = min(lbl) THEN 1 ELSE 0 END AS BIGINT)
         |         AS is_canon
         |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,
    "d09_edit_distance" ->
      """WITH d AS (SELECT doc_id, lang, substr(text,1,48) pfx, n_chars,
        |                  n_chars//8 bkt FROM documents),
        |v AS (SELECT doc_id, lang, translate(pfx,'e','3') vfx, n_chars,
        |             bkt FROM d),
        |cand AS (SELECT x.doc_id a, y.doc_id b, x.pfx pa, y.vfx vb
        |  FROM d x JOIN v y ON x.lang = y.lang
        |    AND y.bkt BETWEEN x.bkt-1 AND x.bkt+1
        |    AND x.doc_id < y.doc_id AND abs(x.n_chars-y.n_chars) <= 8)
        |SELECT a, b, CAST(levenshtein(pa,vb) AS BIGINT) dist FROM cand
        |WHERE levenshtein(pa,vb) <= 8 ORDER BY a, b""".stripMargin,
    "d10_lsh_recall" ->
      s"""WITH $JAC,
         |$LSHCAND,
         |ex AS (SELECT a, b FROM jac WHERE jac >= 0.8),
         |found AS (SELECT ex.a, ex.b FROM ex
         |          JOIN cand ON cand.a = ex.a AND cand.b = ex.b)
         |SELECT (SELECT count(*) FROM ex) n_exact,
         |       (SELECT count(*) FROM found) n_found,
         |       CASE WHEN (SELECT count(*) FROM ex) = 0 THEN 1.0
         |            ELSE round((SELECT count(*) FROM found) * 1.0 /
         |                       (SELECT count(*) FROM ex), 4)
         |       END recall""".stripMargin,
    "d11_incremental_dedup" ->
      s"""WITH sdocs AS (SELECT doc_id, text FROM documents
         |               WHERE doc_id % 5 <> 0),
         |ddocs AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
         |${SigBandFrom("sdocs", "s")},
         |${SigBandFrom("ddocs", "d")},
         |cs AS (SELECT DISTINCT d.doc_id b, s.doc_id a
         |       FROM bandd d JOIN bands s
         |         ON d.band = s.band AND d.k = s.k),
         |cd AS (SELECT DISTINCT x.doc_id b, y.doc_id a
         |       FROM bandd x JOIN bandd y
         |         ON x.band = y.band AND x.k = y.k AND y.doc_id < x.doc_id),
         |ests AS (SELECT c.b, c.a,
         |         sum(CASE WHEN sd.m = ss.m THEN 1 ELSE 0 END)/16.0 est
         |         FROM cs c JOIN sigd sd ON sd.doc_id = c.b
         |                   JOIN sigs ss ON ss.doc_id = c.a AND ss.i = sd.i
         |         GROUP BY 1, 2),
         |estd AS (SELECT c.b, c.a,
         |         sum(CASE WHEN sx.m = sy.m THEN 1 ELSE 0 END)/16.0 est
         |         FROM cd c JOIN sigd sx ON sx.doc_id = c.b
         |                   JOIN sigd sy ON sy.doc_id = c.a AND sy.i = sx.i
         |         GROUP BY 1, 2),
         |dup AS (SELECT b doc_id, min(a) dup_of FROM (
         |         SELECT a, b FROM ests WHERE est >= 0.5
         |         UNION ALL SELECT a, b FROM estd WHERE est >= 0.5) u
         |        GROUP BY 1)
         |SELECT d.doc_id, dup.dup_of,
         |       CAST(dup.dup_of IS NULL AS BIGINT) kept
         |FROM ddocs d LEFT JOIN dup ON d.doc_id = dup.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    "d12_substring_spans" ->
      s"""WITH $W,
         |wins AS (SELECT doc_id,
         |    UNNEST(list_transform(range(1, len(w) - 4),
         |      i -> array_to_string(w[i:i+5], ' '))) AS span
         |  FROM words WHERE len(w) >= 6)
         |SELECT span, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occ
         |FROM wins GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2
         |ORDER BY n_docs DESC, n_occ DESC, span LIMIT 100""".stripMargin,
    "d14_max_dup_segments" ->
      s"""WITH $W,
         |wins AS (SELECT doc_id, UNNEST(range(1, len(w) - 4)) AS i, w
         |  FROM words WHERE len(w) >= 6),
         |hcs AS (SELECT doc_id, i,
         |    [CAST(ascii(x) AS BIGINT) for x in string_split(
         |      array_to_string(w[i:i+5], ' '), '')] AS cs FROM wins),
         |hits0 AS (SELECT doc_id, i,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT), cs),
         |      (a,b)->(a*31+b)%1000000007) * 999999937 +
         |    list_reduce(list_prepend(CAST(0 AS BIGINT), cs),
         |      (a,b)->(a*131+b)%999999937) AS spfp FROM hcs),
         |dup AS (SELECT spfp FROM hits0
         |  GROUP BY spfp HAVING count(DISTINCT doc_id) >= 2),
         |hits AS (SELECT doc_id, i FROM hits0 JOIN dup USING (spfp)),
         |isl AS (SELECT doc_id, i,
         |    CASE WHEN i > coalesce(lag(i) OVER
         |        (PARTITION BY doc_id ORDER BY i), -100) + 6
         |      THEN 1 ELSE 0 END ns
         |  FROM hits),
         |seg0 AS (SELECT doc_id, i,
         |    sum(ns) OVER (PARTITION BY doc_id ORDER BY i) seg FROM isl),
         |segs AS (SELECT doc_id, seg, min(i) a, max(i) + 5 b
         |  FROM seg0 GROUP BY 1, 2),
         |ext AS (SELECT s.doc_id,
         |    CAST(b - a + 1 AS BIGINT) seg_tokens,
         |    CAST(length(array_to_string(w[1:b], ' ')) -
         |      CASE WHEN a > 1
         |        THEN length(array_to_string(w[1:a-1], ' ')) + 1
         |        ELSE 0 END AS BIGINT) seg_chars
         |  FROM segs s JOIN words USING (doc_id)),
         |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) n_segments,
         |    CAST(sum(seg_tokens) AS BIGINT) dup_tokens,
         |    CAST(sum(seg_chars) AS BIGINT) dup_chars
         |  FROM ext GROUP BY 1)
         |SELECT g.doc_id, n_segments, dup_tokens, dup_chars,
         |  round(dup_chars * 1.0 /
         |    length(array_to_string(w, ' ')), 4) AS dup_frac
         |FROM agg g JOIN words USING (doc_id) ORDER BY doc_id""".stripMargin,
    "d15_paragraph_dedup" ->
      s"""WITH $W,
         |segs AS (SELECT doc_id, len(w) n_tok,
         |    UNNEST(range(0, (len(w) + 15) // 16)) j, w FROM words),
         |segc AS (SELECT doc_id, j, n_tok,
         |    [CAST(ascii(x) AS BIGINT) for x in string_split(
         |      array_to_string(w[j*16+1:(j+1)*16], ' '), '')] cs
         |  FROM segs),
         |seg2 AS (SELECT doc_id, j,
         |    least(16, n_tok - j * 16) ntok,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT), cs),
         |      (a,b)->(a*31+b)%1000000007) * 999999937 +
         |    list_reduce(list_prepend(CAST(0 AS BIGINT), cs),
         |      (a,b)->(a*131+b)%999999937) fp
         |  FROM segc),
         |rn AS (SELECT doc_id, j, ntok,
         |    row_number() OVER (PARTITION BY fp ORDER BY doc_id, j) rn
         |  FROM seg2)
         |SELECT doc_id, CAST(count(*) AS BIGINT) n_segs,
         |  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    n_dup_segs,
         |  CAST(sum(CASE WHEN rn > 1 THEN ntok ELSE 0 END) AS BIGINT)
         |    tokens_removed,
         |  round(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) * 1.0 /
         |    count(*), 4) dup_frac
         |FROM rn GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "d19_incremental_paragraph" ->
      s"""WITH $W,
         |segs AS (SELECT doc_id, len(w) n_tok,
         |    UNNEST(range(0, (len(w) + 15) // 16)) j, w FROM words),
         |segc AS (SELECT doc_id, j, n_tok,
         |    [CAST(ascii(x) AS BIGINT) for x in string_split(
         |      array_to_string(w[j*16+1:(j+1)*16], ' '), '')] cs
         |  FROM segs),
         |seg2 AS (SELECT doc_id, j,
         |    least(16, n_tok - j * 16) ntok,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT), cs),
         |      (a,b)->(a*31+b)%1000000007) * 999999937 +
         |    list_reduce(list_prepend(CAST(0 AS BIGINT), cs),
         |      (a,b)->(a*131+b)%999999937) fp
         |  FROM segc),
         |snapfp AS (SELECT DISTINCT fp FROM seg2 WHERE doc_id % 3 <> 0),
         |rn AS (SELECT doc_id, j, ntok, fp,
         |    row_number() OVER (PARTITION BY fp ORDER BY doc_id, j) rnk
         |  FROM seg2 WHERE doc_id % 3 = 0),
         |fl AS (SELECT r.doc_id, r.ntok,
         |    CASE WHEN s.fp IS NOT NULL THEN 1 ELSE 0 END dup_snap,
         |    CASE WHEN s.fp IS NULL AND r.rnk > 1 THEN 1 ELSE 0 END
         |      dup_within
         |  FROM rn r LEFT JOIN snapfp s ON s.fp = r.fp)
         |SELECT doc_id, CAST(count(*) AS BIGINT) n_segs,
         |  CAST(sum(dup_snap) AS BIGINT) dup_vs_corpus,
         |  CAST(sum(dup_within) AS BIGINT) dup_within,
         |  CAST(sum((dup_snap + dup_within) * ntok) AS BIGINT)
         |    tokens_removed,
         |  round(sum(dup_snap + dup_within) * 1.0 / count(*), 4) dup_frac
         |FROM fl GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "d16_cluster_keep_best" ->
      s"""WITH RECURSIVE $JAC,
         |$LSHCAND,
         |pairs AS (SELECT jac.a, jac.b FROM jac JOIN cand USING (a, b)
         |          WHERE jac >= 0.8),
         |edges AS (SELECT a src, b dst FROM pairs
         |          UNION ALL SELECT b, a FROM pairs),
         |reach(id, lbl) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.id = e.dst),
         |lab AS (SELECT id doc_id, min(lbl) cluster_id
         |  FROM reach GROUP BY id),
         |sc AS (SELECT doc_id, n_chars,
         |    CAST(len(list_distinct(string_split_regex(trim(text),
         |      '\\s+'))) * CAST(1000000 AS BIGINT) //
         |      len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
         |      score
         |  FROM documents),
         |m AS (SELECT l.cluster_id, s.doc_id, s.score, s.n_chars
         |  FROM lab l JOIN sc s USING (doc_id)),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY cluster_id
         |    ORDER BY score DESC, doc_id) rnk FROM m),
         |agg AS (SELECT cluster_id, CAST(count(*) AS BIGINT) n_members,
         |    sum(n_chars) tot_chars FROM m GROUP BY cluster_id)
         |SELECT a.cluster_id, r.doc_id keep_id, r.score keep_score,
         |  a.n_members, a.n_members - 1 n_removed,
         |  CAST(a.tot_chars - r.n_chars AS BIGINT) chars_removed
         |FROM agg a JOIN rk r
         |  ON r.cluster_id = a.cluster_id AND r.rnk = 1
         |ORDER BY a.cluster_id""".stripMargin,
    "d17_semantic_decontaminate" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |n AS (SELECT vec_id, v,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, len(v)+1), i -> v[i]*v[i])),
        |      (p,q)->p+q)) nrm
        |  FROM e),
        |cents AS (SELECT vec_id cid, v cv, nrm cn FROM n WHERE vec_id < 8),
        |tocent AS (SELECT n.vec_id, n.v, n.nrm, c.cid,
        |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, len(n.v)+1), i -> n.v[i]*c.cv[i])),
        |        (p,q)->p+q) / (n.nrm * c.cn), 6) csim
        |  FROM n CROSS JOIN cents c),
        |asg AS (SELECT vec_id, v, nrm, cid FROM (
        |    SELECT vec_id, v, nrm, cid,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id
        |                         ORDER BY csim DESC, cid) rn
        |    FROM tocent WHERE vec_id % 17 <> 0) t WHERE rn <= 2),
        |probes AS (SELECT q, qv, qn, cid FROM (
        |    SELECT vec_id q, v qv, nrm qn, cid,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id
        |                         ORDER BY csim DESC, cid) rn
        |    FROM tocent WHERE vec_id % 17 = 0) t WHERE rn <= 2),
        |scored AS (SELECT DISTINCT a.vec_id, p.q,
        |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, len(p.qv)+1), i -> p.qv[i]*a.v[i])),
        |        (x,y)->x+y) / (p.qn * a.nrm), 6) sim
        |  FROM probes p JOIN asg a ON a.cid = p.cid)
        |SELECT vec_id, CAST(count(*) AS BIGINT) n_eval_hits,
        |       max(sim) max_sim
        |FROM scored WHERE sim >= 0.3
        |GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "d18_decontam_recall" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |n AS (SELECT vec_id, v,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, len(v)+1), i -> v[i]*v[i])),
        |      (p,q)->p+q)) nrm
        |  FROM e),
        |cents AS (SELECT vec_id cid, v cv, nrm cn FROM n WHERE vec_id < 8),
        |tocent AS (SELECT n.vec_id, n.v, n.nrm, c.cid,
        |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, len(n.v)+1), i -> n.v[i]*c.cv[i])),
        |        (p,q)->p+q) / (n.nrm * c.cn), 6) csim
        |  FROM n CROSS JOIN cents c),
        |asg AS (SELECT vec_id, v, nrm, cid FROM (
        |    SELECT vec_id, v, nrm, cid,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id
        |                         ORDER BY csim DESC, cid) rn
        |    FROM tocent WHERE vec_id % 17 <> 0) t WHERE rn <= 2),
        |probes AS (SELECT q, qv, qn, cid FROM (
        |    SELECT vec_id q, v qv, nrm qn, cid,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id
        |                         ORDER BY csim DESC, cid) rn
        |    FROM tocent WHERE vec_id % 17 = 0) t WHERE rn <= 2),
        |aflag AS (SELECT DISTINCT a.vec_id
        |  FROM probes p JOIN asg a ON a.cid = p.cid
        |  WHERE round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, len(p.qv)+1), i -> p.qv[i]*a.v[i])),
        |      (x,y)->x+y) / (p.qn * a.nrm), 6) >= 0.3),
        |ex AS (SELECT DISTINCT x.vec_id
        |  FROM n x JOIN n y ON y.vec_id % 17 = 0
        |  WHERE x.vec_id % 17 <> 0
        |    AND round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, len(x.v)+1), i -> x.v[i]*y.v[i])),
        |      (p,q)->p+q) / (x.nrm * y.nrm), 6) >= 0.3)
        |SELECT CAST(count(*) AS BIGINT) n_exact,
        |  (SELECT CAST(count(*) AS BIGINT) FROM aflag) n_approx,
        |  CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
        |       AS BIGINT) n_hit,
        |  round(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
        |        * 1.0 / count(*), 4) recall
        |FROM ex LEFT JOIN aflag a ON a.vec_id = ex.vec_id""".stripMargin,
    "d05_dedup_embed_cosine" ->
      s"""WITH $EMB
         |SELECT a, b, sim FROM pair_sim
         |WHERE a < b AND sim >= 0.45 ORDER BY a, b""".stripMargin,
    "d06_semantic_dedup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |n AS (SELECT vec_id, v,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, len(v)+1), i -> v[i]*v[i])),
        |      (p,q)->p+q)) nrm
        |  FROM e),
        |cents AS (SELECT vec_id cid, v cv, nrm cn FROM n WHERE vec_id < 8),
        |tocent AS (SELECT n.vec_id, n.v, n.nrm, c.cid,
        |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, len(n.v)+1), i -> n.v[i]*c.cv[i])),
        |        (p,q)->p+q) / (n.nrm * c.cn), 6) csim
        |  FROM n CROSS JOIN cents c),
        |asg AS (SELECT vec_id, v, nrm, cid FROM (
        |    SELECT vec_id, v, nrm, cid,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id
        |                         ORDER BY csim DESC, cid) rn
        |    FROM tocent) t WHERE rn = 1),
        |pairs AS (SELECT y.vec_id removed_id, x.vec_id kept,
        |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, len(x.v)+1), i -> x.v[i]*y.v[i])),
        |        (p,q)->p+q) / (x.nrm * y.nrm), 6) sim
        |  FROM asg x JOIN asg y ON x.cid = y.cid AND x.vec_id < y.vec_id)
        |SELECT removed_id, min(kept) AS dup_of, count(*) AS n_dups,
        |       max(sim) AS max_sim
        |FROM pairs WHERE sim >= 0.4
        |GROUP BY removed_id ORDER BY removed_id""".stripMargin,
    "s01_ann_cosine_topk" -> S01Sql,
    "s06_ann_filtered" ->
      s"""WITH $EMB,
         |en AS (SELECT doc_id FROM documents WHERE lang = 'en'),
         |ranked AS (SELECT a q, b nb, sim,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY a ORDER BY sim DESC, b)
         |         AS INTEGER) rk
         |  FROM pair_sim JOIN en ON en.doc_id = b
         |  WHERE a < 10 AND a <> b)
         |SELECT q, rk, nb, sim FROM ranked WHERE rk <= 5
         |ORDER BY q, rk""".stripMargin,
    "s07_ann_sq8_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v
        |           FROM embeddings),
        |un AS (SELECT vec_id,
        |    list_transform(v, x -> x /
        |      sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, len(v)+1), i -> v[i]*v[i])),
        |        (p,s)->p+s))) u
        |  FROM e),
        |dims AS (SELECT UNNEST(range(1, mxd + 1)) i
        |         FROM (SELECT max(len(u)) mxd FROM un)),
        |st AS (SELECT i, min(u[i]) mn, max(u[i]) mx
        |       FROM un CROSS JOIN dims GROUP BY i),
        |bnd AS (SELECT list(mn ORDER BY i) mn, list(mx ORDER BY i) mx
        |        FROM st),
        |qz AS (SELECT vec_id,
        |    list_transform(range(1, len(u)+1), i ->
        |      CASE WHEN bnd.mx[i] > bnd.mn[i]
        |           THEN bnd.mn[i]
        |                + CAST(CAST(floor((u[i] - bnd.mn[i]) * 255.0
        |                                  / (bnd.mx[i] - bnd.mn[i]))
        |                       AS BIGINT) AS DOUBLE)
        |                  * (bnd.mx[i] - bnd.mn[i]) / 255.0
        |           ELSE bnd.mn[i] END) dv
        |  FROM un CROSS JOIN bnd),
        |isc AS (SELECT x.vec_id q, y.vec_id nb,
        |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, len(x.dv)+1), i -> x.dv[i]*y.dv[i])),
        |      (p,s)->p+s), 6) ascore
        |  FROM qz x JOIN qz y ON x.vec_id < 10 AND y.vec_id <> x.vec_id),
        |cand AS (SELECT q, nb FROM (
        |    SELECT q, nb,
        |      ROW_NUMBER() OVER (PARTITION BY q ORDER BY ascore DESC, nb) crk
        |    FROM isc) t WHERE crk <= 20),
        |n AS (SELECT vec_id, v,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, len(v)+1), i -> v[i]*v[i])),
        |      (p,s)->p+s)) nrm
        |  FROM e),
        |rer AS (SELECT c.q, c.nb,
        |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, len(qq.v)+1), i -> qq.v[i]*nn.v[i])),
        |        (p,s)->p+s) / (qq.nrm * nn.nrm), 6) sim
        |  FROM cand c JOIN n qq ON qq.vec_id = c.q
        |              JOIN n nn ON nn.vec_id = c.nb)
        |SELECT q, rk, nb, sim FROM (
        |  SELECT q, nb, sim,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q ORDER BY sim DESC, nb)
        |         AS INTEGER) rk
        |  FROM rer) t WHERE rk <= 5 ORDER BY q, rk""".stripMargin,
    "s02_ann_lsh_topk" ->
      s"""WITH $EMB,
         |bkt AS (SELECT vec_id, v,
         |  (SELECT SUM(CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(range(0, len(v)),
         |        d -> v[d+1] * CAST((CAST(1103515245 AS BIGINT)*(j*64+d)+12345)%2001-1000 AS DOUBLE))),
         |      (p,q)->p+q) > 0 THEN 1 << j ELSE 0 END)
         |   FROM (SELECT UNNEST(range(0,4)) j)) bucket
         |  FROM e),
         |scored AS (SELECT q.vec_id q, c.vec_id nb,
         |    round(
         |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |        list_transform(range(1, len(q.v)+1), i -> q.v[i]*c.v[i])), (p,s)->p+s)
         |      / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |           list_transform(range(1, len(q.v)+1), i -> q.v[i]*q.v[i])), (p,s)->p+s))
         |       * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |           list_transform(range(1, len(c.v)+1), i -> c.v[i]*c.v[i])), (p,s)->p+s)))
         |    , 6) sim
         |  FROM bkt q JOIN bkt c
         |    ON q.bucket = c.bucket AND q.vec_id < 10 AND c.vec_id <> q.vec_id),
         |ranked AS (SELECT q, nb, sim,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q ORDER BY sim DESC, nb)
         |         AS INTEGER) rk FROM scored)
         |SELECT q, rk, nb, sim FROM ranked WHERE rk <= 5
         |ORDER BY q, rk""".stripMargin,
    "s03_ann_ivf_topk" -> S03Sql,
    "s11_ann_hnsw" -> S11Sql,
    "s12_graph_recall" -> S12Sql,
    "s10_ann_indexed" -> S10Sql,
    "s05_ann_recall" ->
      s"""WITH ex AS ($S01Sql),
         |ap AS ($S03Sql)
         |SELECT ex.q, CAST(count(*) AS BIGINT) AS k,
         |  CAST(count(ap.nb) AS BIGINT) AS n_hit,
         |  round(count(ap.nb) * 1.0 / count(*), 4) AS recall_at_k
         |FROM ex LEFT JOIN ap ON ap.q = ex.q AND ap.nb = ex.nb
         |GROUP BY ex.q ORDER BY ex.q""".stripMargin,
    "s04_ann_ivfpq_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |n AS (SELECT vec_id, v,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, len(v)+1), i -> v[i]*v[i])),
        |      (p,q)->p+q)) nrm
        |  FROM e),
        |cents AS (SELECT vec_id cid, v cv, nrm cn FROM n WHERE vec_id < 8),
        |tocent AS (SELECT n.vec_id, n.v, n.nrm, c.cid,
        |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, len(n.v)+1), i -> n.v[i]*c.cv[i])),
        |        (p,q)->p+q) / (n.nrm * c.cn), 6) csim
        |  FROM n CROSS JOIN cents c),
        |asg AS (SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id
        |                         ORDER BY csim DESC, cid) rn
        |    FROM tocent) t WHERE rn = 1),
        |probes AS (SELECT q, qv, qn, cid FROM (
        |    SELECT vec_id q, v qv, nrm qn, cid,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id
        |                         ORDER BY csim DESC, cid) rn
        |    FROM tocent WHERE vec_id < 10) t WHERE rn <= 2),
        |mm AS (SELECT UNNEST(range(0, 4)) m),
        |sub AS (SELECT vec_id, m, list_slice(v, m*16+1, m*16+16) sv
        |  FROM e CROSS JOIN mm),
        |cb AS (SELECT m, vec_id pcid, sv cv FROM sub WHERE vec_id < 16),
        |dist AS (SELECT s.vec_id, s.m, c.pcid, c.cv,
        |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, 17),
        |        i -> (s.sv[i]-c.cv[i])*(s.sv[i]-c.cv[i]))),
        |      (p,q)->p+q), 6) d2
        |  FROM sub s JOIN cb c ON c.m = s.m),
        |code AS (SELECT vec_id, m, cv FROM (
        |    SELECT vec_id, m, cv,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id, m
        |                         ORDER BY d2 ASC, pcid ASC) rn
        |    FROM dist) t WHERE rn = 1),
        |pq AS (SELECT vec_id, list(cv ORDER BY m) cvs FROM code
        |  GROUP BY vec_id),
        |pqn AS (SELECT vec_id, cvs,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, 5),
        |        m -> list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |          list_transform(range(1, 17), i -> cvs[m][i]*cvs[m][i])),
        |          (p,q)->p+q))),
        |      (p,q)->p+q)) rnrm
        |  FROM pq),
        |scored AS (SELECT p.q, a.vec_id nb,
        |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(0, 4),
        |          m -> list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |            list_transform(range(1, 17),
        |              i -> p.qv[m*16+i]*x.cvs[m+1][i])), (p2,q2)->p2+q2))),
        |        (p3,q3)->p3+q3)
        |      / (p.qn * x.rnrm), 6) sim
        |  FROM probes p JOIN asg a ON a.cid = p.cid AND a.vec_id <> p.q
        |       JOIN pqn x ON x.vec_id = a.vec_id),
        |ranked AS (SELECT q, nb, sim,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q ORDER BY sim DESC, nb)
        |         AS INTEGER) rk FROM scored)
        |SELECT q, rk, nb, sim FROM ranked WHERE rk <= 5
        |ORDER BY q, rk""".stripMargin,
    "a01_array_element_sum" ->
      """WITH arrs AS (SELECT l_returnflag,
        |    list_slice([l_quantity, CAST(l_linenumber AS DOUBLE),
        |                l_quantity + l_linenumber],
        |               1, CAST(l_orderkey % 3 + 1 AS INTEGER)) arr
        |  FROM lineitem),
        |flat AS (SELECT l_returnflag, UNNEST(arr) v,
        |                UNNEST(range(1, len(arr)+1)) idx FROM arrs),
        |sums AS (SELECT l_returnflag, idx, SUM(v) s FROM flat GROUP BY 1, 2)
        |SELECT l_returnflag,
        |       array_to_string(list(CAST(s AS BIGINT) ORDER BY idx), ',') AS sums
        |FROM sums GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "m01_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    [CAST(ascii(x) AS BIGINT) for x in string_split(text,'')]),
        |    (a,b)->(a*31+b)%1000000007) AS checksum,
        |  CAST(octet_length(encode(text)) % 64 + 1 AS INTEGER) AS fake_w,
        |  CAST(octet_length(encode(text)) % 48 + 1 AS INTEGER) AS fake_h
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m02_media_features" ->
      """WITH fp AS (SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(x) AS BIGINT) for x in string_split(text,'')]),
        |      (a,b)->(a*31+b)%1000000007) seed,
        |    CAST(octet_length(encode(text)) AS INTEGER) n_bytes,
        |    CAST(n_chars % 24 + 8 AS INTEGER) w,
        |    CAST(n_chars % 16 + 8 AS INTEGER) h
        |  FROM documents),
        |px AS (SELECT doc_id, n_bytes, w, h,
        |    ((seed * 3 + (UNNEST(range(0, CAST(w AS BIGINT) * h)) + 1)
        |      * 1000003) % 1000000007) % 1021 AS k
        |  FROM fp),
        |agg AS (SELECT doc_id, n_bytes, w, h, COUNT(*) n,
        |        SUM(k) s, SUM(k*k) s2, MIN(k) mn, MAX(k) mx
        |  FROM px GROUP BY 1, 2, 3, 4)
        |SELECT doc_id AS media_id, n_bytes, w AS width, h AS height,
        |  round(CAST(s AS DOUBLE) / (n * 1021.0), 6) AS px_mean,
        |  round(sqrt(greatest(0.0,
        |    CAST(s2 AS DOUBLE) / (n * 1021.0 * 1021.0)
        |    - (CAST(s AS DOUBLE) / (n * 1021.0))
        |      * (CAST(s AS DOUBLE) / (n * 1021.0)))), 6) AS px_std,
        |  round(CAST(mn AS DOUBLE) / 1021.0, 6) AS px_min,
        |  round(CAST(mx AS DOUBLE) / 1021.0, 6) AS px_max
        |FROM agg ORDER BY media_id""".stripMargin,
    "m03_media_frame_sample" ->
      """SELECT doc_id AS media_id,
        |       CAST(((doc_id % 7 + 1) + 1) // 2 AS BIGINT) AS n_frames_sampled
        |FROM documents WHERE doc_id % 3 = 2 ORDER BY media_id""".stripMargin,
    // m04 replays the resize loop bit-for-bit for the two corner output
    // pixels: float32 source pixels (k/1021 cast to REAL), row-major
    // sequential double fold over the source box, one division, float32
    // store — the identical arithmetic Multimodal.resized runs.
    "m04_media_resize" ->
      """WITH fp AS (SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(x) AS BIGINT) for x in string_split(text,'')]),
        |      (a,b)->(a*31+b)%1000000007) seed,
        |    CAST(n_chars % 24 + 8 AS INTEGER) w,
        |    CAST(n_chars % 16 + 8 AS INTEGER) h
        |  FROM documents),
        |px AS (SELECT doc_id,
        |  flatten(list_transform(range(0, h // 8), y ->
        |    list_transform(range(0, w // 8), x ->
        |      CAST((((seed * 3 + (y * w + x + 1) * 1000003) % 1000000007)
        |        % 1021) / 1021.0 AS FLOAT)))) v0,
        |  flatten(list_transform(range(7 * h // 8, h), y ->
        |    list_transform(range(7 * w // 8, w), x ->
        |      CAST((((seed * 3 + (y * w + x + 1) * 1000003) % 1000000007)
        |        % 1021) / 1021.0 AS FLOAT)))) v1
        |  FROM fp)
        |SELECT doc_id AS media_id,
        |  CAST(8 AS INTEGER) AS out_w, CAST(8 AS INTEGER) AS out_h,
        |  round(CAST(CAST(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    [CAST(v AS DOUBLE) for v in v0]), (a,b)->a+b) / len(v0)
        |    AS FLOAT) AS DOUBLE), 6) AS px_first,
        |  round(CAST(CAST(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    [CAST(v AS DOUBLE) for v in v1]), (a,b)->a+b) / len(v1)
        |    AS FLOAT) AS DOUBLE), 6) AS px_last
        |FROM px ORDER BY media_id""".stripMargin,
    // m05 rebuilds every 4×4 output pixel from the lattice (same block
    // bounds, row-major double fold, float32 store as the resize), then
    // re-derives the 16 threshold bits and the bucket aggregate.
    "m05_media_ahash_dedup" ->
      """WITH fp AS (SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(x) AS BIGINT) for x in string_split(text,'')]),
        |      (a,b)->(a*31+b)%1000000007) seed,
        |    CAST(n_chars % 24 + 8 AS INTEGER) w,
        |    CAST(n_chars % 16 + 8 AS INTEGER) h
        |  FROM documents),
        |px AS (SELECT doc_id, flatten(list_transform(range(0, 4), ty ->
        |    list_transform(range(0, 4), tx ->
        |      CAST(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        flatten(list_transform(range(ty * h // 4, (ty+1) * h // 4),
        |          y -> list_transform(range(tx * w // 4, (tx+1) * w // 4),
        |            x -> CAST(CAST((((seed * 3 + (y * w + x + 1) * 1000003)
        |              % 1000000007) % 1021) / 1021.0 AS FLOAT)
        |              AS DOUBLE))))),
        |        (a,b)->a+b)
        |        / (((ty+1) * h // 4 - ty * h // 4)
        |           * ((tx+1) * w // 4 - tx * w // 4))
        |      AS FLOAT)))) v
        |  FROM fp),
        |m AS (SELECT doc_id, v,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      [CAST(x AS DOUBLE) for x in v]), (a,b)->a+b) / 16 mean
        |  FROM px),
        |hsh AS (SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(0, 16), i ->
        |        CASE WHEN CAST(v[CAST(i + 1 AS INTEGER)] AS DOUBLE) > mean
        |             THEN (CAST(1 AS BIGINT) << i)
        |             ELSE CAST(0 AS BIGINT) END)),
        |      (a,b)->a+b) ahash
        |  FROM m)
        |SELECT ahash, CAST(count(*) AS BIGINT) n_media,
        |       min(doc_id) media_min, max(doc_id) media_max
        |FROM hsh GROUP BY ahash HAVING count(*) >= 2
        |ORDER BY ahash""".stripMargin,
  )
}
