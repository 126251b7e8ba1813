package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TextFunctions._

/** Streaming near-duplicate detection — incremental MinHash-LSH over a
  * document stream. The batch near-dedup queries (LlmQueries d02/d03)
  * answer "which documents in this corpus are near-dups"; a training-data
  * INGEST pipeline needs the online form: "is this arriving document a
  * near-dup of anything already accepted". No built-in operator carries a
  * seen-signature index across micro-batches, so this is
  * `flatMapGroupsWithState` keyed by LSH band value.
  *
  * Same deterministic arithmetic as the batch path (TextFunctions: shingle
  * PolyHash → 16 affine minhash perms → 4 bands × 4 rows), so a document
  * flagged here would also pair in d03 over the accumulated corpus —
  * candidates are band-collisions, confirmed by estimated Jaccard
  * (fraction of agreeing signature positions) ≥ `estThreshold`.
  *
  * Scale shape: state is one signature (16 longs) per seen document PER
  * BAND BUCKET — the stream shuffles once on band value, buckets stay
  * partition-local, and a near-dup-free corpus spreads uniformly (band
  * values are minhash tuples, i.e. already hashed). `maxPerBucket` caps a
  * degenerate bucket (boilerplate-heavy corpora) at bounded memory and
  * emits an overflow marker row instead of silently degrading; real
  * deployments shard such buckets or pre-filter boilerplate. A pair that
  * collides in several bands emits once per band — dedupe downstream with
  * `dropDuplicates("a","b")` (the emitted frame is append-mode).
  */
object StreamingDedup {

  /** One arriving document, signature precomputed plan-side. */
  case class SigDoc(band: String, doc_id: Long, sig: Seq[Long])

  /** A flagged near-dup candidate: arriving doc `b` against seen doc `a`;
    * overflow=true marks a bucket that hit `maxPerBucket` (est is then the
    * bucket fill, not a similarity). */
  case class NearDup(a: Long, b: Long, est: Double, band: String,
      overflow: Boolean)

  /** Per-band-bucket seen set (public: the state encoder's generated code
    * must be able to construct it). */
  case class BucketState(ids: Seq[Long], sigs: Seq[Seq[Long]])

  /** Signature+band derivation (pure Catalyst, identical arithmetic to the
    * batch d03): 16 minhash positions over 3-word shingle fingerprints,
    * concatenated 4-at-a-time into 4 band keys, prefixed with the band
    * index so bands never collide across positions. Documents with fewer
    * than 3 tokens have no shingles and are dropped (cannot near-dup). */
  def withBands(docs: DataFrame): DataFrame =
    sigBands(docs
      .withColumn("fps", array_distinct(transform(
        shingles3(tokens(col("text"))), s => graft.plans.PolyHash(s))))
      .where(size(col("fps")) > 0))

  /** The same derivation from an ALREADY-EXPLODED fingerprint table
    * (doc_id, f) — the shape the batch pipeline session-caches and shares
    * across the dedup family. Derives sigs with 16 min aggregates instead
    * of per-row array folds; identical output to [[withBands]]. */
  def withBandsFromFps(fps: DataFrame): DataFrame =
    sigBands(fps.groupBy(col("doc_id"))
      .agg(collect_set(col("f")).as("fps")))

  private def sigBands(withFps: DataFrame): DataFrame = {
    val sig = array((0 until 16).map(i =>
      array_min(transform(col("fps"), f => minhashPerm(f, i)))): _*)
    val bandKeys = (0 until 4).map(b =>
      concat_ws(",", lit(b).cast("string") +:
        (0 until 4).map(r => element_at(col("sig"), 4 * b + r + 1)): _*))
    withFps
      .withColumn("sig", sig)
      .select(col("doc_id"), col("sig"),
        explode(array(bandKeys: _*)).as("band"))
  }

  /** Start-to-end: documents (doc_id, text) → streaming candidate pairs. */
  def candidates(docs: DataFrame, estThreshold: Double = 0.5,
      maxPerBucket: Int = 256): Dataset[NearDup] = {
    implicit val sigEnc = Encoders.product[SigDoc]
    val sigs = withBands(docs)
      .select(col("band"), col("doc_id"), col("sig")).as[SigDoc]
    detect(sigs, estThreshold, maxPerBucket)
  }

  /** The stateful core, exposed for tests that build SigDoc streams
    * directly. State never expires by time: corpus membership is the
    * semantic (a dup of a year-old document is still a dup). */
  def detect(sigs: Dataset[SigDoc], estThreshold: Double,
      maxPerBucket: Int): Dataset[NearDup] = {
    implicit val stateEnc = Encoders.product[BucketState]
    implicit val outEnc = Encoders.product[NearDup]
    implicit val keyEnc = Encoders.STRING

    def update(band: String, rows: Iterator[SigDoc],
        state: GroupState[BucketState]): Iterator[NearDup] = {
      var st = state.getOption.getOrElse(BucketState(Nil, Nil))
      val out = ArrayBuffer[NearDup]()
      // deterministic fold order within a micro-batch
      rows.toSeq.sortBy(_.doc_id).foreach { d =>
        if (!st.ids.contains(d.doc_id)) {
          if (st.ids.size >= maxPerBucket) {
            out += NearDup(-1L, d.doc_id, st.ids.size.toDouble, band,
              overflow = true)
          } else {
            var i = 0
            while (i < st.ids.size) {
              val matches = st.sigs(i).zip(d.sig).count(p => p._1 == p._2)
              val est = matches.toDouble / d.sig.size
              if (est >= estThreshold)
                out += NearDup(st.ids(i), d.doc_id, est, band,
                  overflow = false)
              i += 1
            }
            st = BucketState(st.ids :+ d.doc_id, st.sigs :+ d.sig)
          }
        }
      }
      state.update(st)
      out.iterator
    }

    sigs.groupByKey(_.band)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(update)
  }
}
