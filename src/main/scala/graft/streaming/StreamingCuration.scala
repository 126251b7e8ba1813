package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{fingerprint, tokens}

/** Streaming counterpart of the batch curation pipeline (LlmQueries p01):
  * documents arrive on a stream and flow through PII redaction → language
  * vote → quality floor → watermarked exact dedup → near-dup candidate
  * detection, producing a curated append stream.
  *
  * Stage design mirrors what scales on a real cluster:
  *  - redaction / scoring / language vote are STATELESS projections — they
  *    fuse into the stream's scan stage, no state store, no shuffle;
  *  - exact dedup is `dropDuplicatesWithinWatermark` on the text
  *    fingerprint — state is one row per distinct fingerprint inside the
  *    watermark horizon, evicted by event time (an unbounded
  *    dropDuplicates would grow state forever on an infinite corpus);
  *  - near-dup detection reuses [[StreamingDedup]]'s incremental
  *    MinHash-LSH `flatMapGroupsWithState` (band-keyed signature index,
  *    bounded buckets). It is NOT chained inside [[curate]]: Spark's
  *    unsupported-operation checker rejects `flatMapGroupsWithState`
  *    downstream of another stateful operator, so [[curateNearDup]] runs
  *    it as a companion query over the SAME stateless stages. Exact
  *    duplicates collide there at est = 1.0 (identical text → identical
  *    signature), so the near-dup query subsumes the exact stage rather
  *    than needing to run after it.
  *
  * The stateless stages reuse the SAME column expressions the batch
  * pipeline oracles (t07's regexes, t02's quality, t03's vote), so batch
  * and streaming answers agree by construction — parity is pinned in
  * `StreamingCurationSpec` by replaying a corpus both ways.
  */
object StreamingCuration {

  /** t07's PII patterns, applied in the same fixed order. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9][0-9().-]{6,}[0-9]"
  val IpRe = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  def redact(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(text,
      EmailRe, "[EMAIL]"), PhoneRe, "[PHONE]"), IpRe, "[IP]")

  /** Stateless curation stages over a streaming (or batch) documents
    * frame with columns (doc_id, ts, text): redact, score, vote, filter.
    * Output columns: doc_id, ts, text (redacted), n_tokens, quality. */
  def scored(docs: DataFrame, minQuality: Double = 0.3): DataFrame = {
    def hits(w: Column, words: Seq[String]): Column =
      size(filter(w, t => words.map(t === _).reduce(_ || _)))
    val quality =
      round((size(array_distinct(col("w"))) * lit(1.0d) / size(col("w"))) *
        least(size(col("w")) / lit(100.0d), lit(1.0d)), 4)
    docs
      .withColumn("text", redact(col("text")))
      .withColumn("w", tokens(col("text")))
      .where(size(col("w")) >= 1)
      .withColumn("n_tokens", size(col("w")))
      .withColumn("quality", quality)
      .withColumn("s_en", hits(col("w"), Seq("the", "a")))
      .withColumn("s_de", hits(col("w"), Seq("der", "und")))
      .withColumn("s_fr", hits(col("w"), Seq("le", "et")))
      .withColumn("s_es", hits(col("w"), Seq("el", "y")))
      .where(col("s_en") >= col("s_de") && col("s_en") >= col("s_fr") &&
        col("s_en") >= col("s_es") && col("s_en") > 0 &&
        col("quality") >= minQuality)
      .select(col("doc_id"), col("ts"), col("text"),
        col("n_tokens"), col("quality"))
  }

  /** Full streaming pipeline: stateless stages + watermarked exact dedup.
    * `docs` must be a STREAMING frame with an event-time `ts` column.
    * The returned stream appends curated, exact-unique documents. */
  def curate(docs: DataFrame, watermark: String = "10 minutes",
      minQuality: Double = 0.3): DataFrame =
    scored(docs, minQuality)
      .withColumn("fp", fingerprint(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp")

  /** Streaming decontamination — the batch d07 check on the streaming
    * surface: each arriving document's k-shingle fingerprints equi-join
    * the eval-set fingerprint frame (GPT-3-style n-gram overlap; never
    * pairwise), and a watermarked per-document aggregate emits each
    * contaminated document's overlapping-shingle count once its
    * event-time window closes.
    *
    * `evalFps` is a STATIC (f) frame — typically `spark.read.parquet` of
    * the published eval-benchmark fingerprints. Stream-static joins
    * re-evaluate the static side every micro-batch, so republishing the
    * eval set takes effect on the next batch without restarting the
    * query; `broadcast()` keeps it a map-side hash join (eval sets are
    * tiny next to the corpus — the same shape batch d07 pins).
    *
    * Per-document shingle dedup happens STATELESSLY via `array_distinct`
    * before the explode (a document's shingles all travel in its one
    * row), so the only state store is the closing aggregate's. A document
    * arriving twice counts twice — run the exact-dedup stage of
    * [[curate]] upstream. */
  def decontaminate(docs: DataFrame, evalFps: DataFrame, k: Int = 8,
      watermark: String = "10 minutes",
      windowDur: String = "10 minutes"): DataFrame = {
    val shingles = transform(
      sequence(lit(1), size(col("w")) - (k - 1)),
      i => concat_ws(" ", (0 until k).map(j => element_at(col("w"), i + j)): _*))
    docs
      .withColumn("w", tokens(col("text")))
      .where(size(col("w")) >= k)
      .withWatermark("ts", watermark)
      .select(col("doc_id"), col("ts"),
        explode(array_distinct(transform(shingles, fingerprint(_)))).as("f"))
      .join(broadcast(evalFps.select(col("f"))), "f")
      .groupBy(window(col("ts"), windowDur), col("doc_id"))
      .agg(count(lit(1)).as("n_contaminated_shingles"))
      .select(col("doc_id"), col("n_contaminated_shingles"))
  }

  /** Near-dup companion to [[curate]]: the same stateless curation stages,
    * then [[StreamingDedup.candidates]] flags each arriving survivor that
    * near-duplicates (est ≥ `estThreshold`) an already-accepted one. Exact
    * dups agree on every signature position (est = 1.0), so this single
    * stateful stage covers both dedup tiers — which is what lets it stand
    * alone instead of chaining after `dropDuplicatesWithinWatermark`
    * (Spark rejects `flatMapGroupsWithState` after a stateful operator).
    * Returns the candidate-pair stream; subtract `b` ids from `curate`'s
    * output downstream to materialize the near-dup-free corpus. */
  def curateNearDup(docs: DataFrame, estThreshold: Double = 0.5,
      minQuality: Double = 0.3): DataFrame =
    StreamingDedup.candidates(
      scored(docs, minQuality).select(col("doc_id"), col("text")),
      estThreshold).toDF()
}
