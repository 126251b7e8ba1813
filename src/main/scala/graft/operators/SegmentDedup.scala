package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{fingerprintWide, tokens}

/** Incremental paragraph-granularity dedup — the d11 production shape at
  * d15's unit: "which 16-token segments of this NEW batch already exist
  * in the standing corpus", answered WITHOUT re-exploding the standing
  * corpus. The batch query (d15) derives every segment each run; at
  * 100 TB the standing side must be a materialized fingerprint snapshot
  * each delta batch probes.
  *
  * Layout (same argument as [[IncrementalDedup]]):
  *  - [[writeSnapshot]] stores the standing corpus's DISTINCT segment
  *    fingerprints (one long per ~16 tokens) BUCKETED by fp via
  *    [[BucketedLayout]] — a few bytes per segment, written once per
  *    accepted corpus revision.
  *  - [[dedupDelta]] probes the snapshot on fp: the snapshot side is
  *    read bucket-for-bucket with no Exchange (only the delta shuffles,
  *    to the bucket count); within-delta first-occurrence is the same
  *    min-struct aggregate as d15.
  *  - [[appendCommit]] admits a batch: its genuinely-new fingerprints
  *    append bucket-preservingly under the [[TableCommit]] protocol
  *    (one file per touched bucket per batch — compaction on rebuild,
  *    the [[IvfIndex.append]] small-files story).
  */
object SegmentDedup {

  val SegTokens = 16

  /** Fingerprint-format tag of the CURRENT segment keyspace, recorded as
    * a commit-dir marker beside every snapshot this operator writes. The
    * r10 key widening (mod-1e9+7 → the ~2^60 paired-prime
    * `fingerprintWide`) changed what a stored fp MEANS: an old-format
    * snapshot never matches new-format probes, so every previously-
    * admitted segment would silently re-admit as unique. The marker
    * turns that silent divergence into a loud rebuild instruction —
    * [[dedupDelta]] and [[appendCommit]] refuse a snapshot whose
    * recorded format differs from the code's. */
  val FpFormat = "fpw60"

  private def requireFormat(spark: SparkSession, table: String): Unit = {
    val have = TableCommit.readMarker(spark, table, "segfmt")
    if (!have.contains(FpFormat))
      throw new IllegalStateException(
        s"segment snapshot '$table' carries fingerprint format " +
          s"${have.getOrElse("(none — pre-format-marker table)")} but " +
          s"this build emits $FpFormat: old keys never match new probes," +
          " so duplicates would pass undetected. Rebuild the snapshot " +
          "(SegmentDedup.writeSnapshot from the standing corpus).")
  }

  /** (doc_id, seg_idx, seg_ntok, fp): the deterministic non-overlapping
    * 16-token segmentation d15 defines — ONE derivation shared by the
    * batch query, this operator, and their oracles. fp is the ~2^60
    * pair-of-primes key ([[graft.functions.TextFunctions.fingerprintWide]]):
    * the fingerprint IS the dedup identity here, so a mod-1e9+7 keyspace
    * would birthday-collide at corpus scale and silently drop unique
    * segments. */
  def segments(docs: DataFrame): DataFrame = {
    val L = SegTokens
    docs
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), size(col("w")).as("n_tok"),
        posexplode(expr(
          s"transform(sequence(0, (size(w) + ${L - 1}) div $L - 1), " +
            s"j -> concat_ws(' ', slice(w, j * $L + 1, $L)))"))
          .as(Seq("seg_idx", "seg")))
      .select(col("doc_id"), col("seg_idx"),
        least(lit(L), col("n_tok") - col("seg_idx") * L).cast("long")
          .as("seg_ntok"),
        fingerprintWide(col("seg")).as("fp"))
  }

  /** Materialize the standing corpus's distinct segment fingerprints as
    * a bucketed managed table (fp, bucketed+sorted by fp). */
  def writeSnapshot(docs: DataFrame, table: String,
      nBuckets: Int = 32): Unit = {
    val spark = docs.sparkSession
    SnapshotMerge.dropTableAndLocation(spark, table)
    BucketedLayout.writeBucketed(
      segments(docs).select(col("fp")).distinct(), table, "fp", nBuckets)
    TableCommit.writeMarker(spark, table, "segfmt", FpFormat)
  }

  /** Per-delta-document removal budget vs the standing snapshot AND
    * within the batch: (doc_id, n_segs, dup_vs_corpus, dup_within,
    * tokens_removed, dup_frac). A segment drops when the standing corpus
    * already has its fingerprint, or an earlier (doc_id, seg_idx) in the
    * SAME batch contributed it first — the d15 rule with the standing
    * side materialized. */
  def dedupDelta(spark: SparkSession, delta: DataFrame,
      table: String): DataFrame = {
    requireFormat(spark, table)
    // the snapshot may have been appended to by ANOTHER session (a
    // streaming micro-batch runs in a cloned session; a concurrent
    // admitter is its own session) — this session's cached file listing
    // for the table is then stale and the probe would silently miss the
    // newest fingerprints. Refresh is O(listing), not O(data)
    spark.catalog.refreshTable(table)
    // two consumers (snapshot probe + within-batch first-occurrence):
    // pay the explode once — delta batches are small by nature. Eager
    // localCheckpoint, NOT persist: this runs every micro-batch in
    // StreamingSegmentDedup, and a CacheManager entry nobody unpersists
    // accumulates for the life of the session; checkpoint blocks are
    // reclaimed by the ContextCleaner as soon as the caller drops the
    // returned frame (the DupClusters round pattern)
    val segs = segments(delta).localCheckpoint(true)
    val first = segs.groupBy(col("fp"))
      .agg(min(struct(col("doc_id"), col("seg_idx"))).as("keep"))
    val probed = segs
      .join(spark.table(table).select(col("fp"), lit(1L).as("in_snap")),
        Seq("fp"), "left")
      .join(first, "fp")
      .select(col("doc_id"), col("seg_ntok"),
        coalesce(col("in_snap"), lit(0L)).as("dup_snap"),
        (col("in_snap").isNull &&
          (col("keep.doc_id") =!= col("doc_id") ||
            col("keep.seg_idx") =!= col("seg_idx"))).cast("long")
          .as("dup_within"))
    probed.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_segs"),
        sum(col("dup_snap")).as("dup_vs_corpus"),
        sum(col("dup_within")).as("dup_within"),
        sum((col("dup_snap") + col("dup_within")) * col("seg_ntok"))
          .as("tokens_removed"))
      .select(col("doc_id"), col("n_segs"), col("dup_vs_corpus"),
        col("dup_within"), col("tokens_removed"),
        round((col("dup_vs_corpus") + col("dup_within"))
          .cast("double") / col("n_segs"), 4).as("dup_frac"))
  }

  /** Admit an accepted delta batch: its fingerprints NOT already in the
    * snapshot append under the [[TableCommit]] single-winner protocol,
    * preserving the bucket spec. Returns the new epoch. */
  def appendCommit(delta: DataFrame, table: String,
      nBuckets: Int = 32): Long = {
    val spark = delta.sparkSession
    requireFormat(spark, table)
    spark.catalog.refreshTable(table) // see dedupDelta: cross-session appends
    val newFps = segments(delta).select(col("fp")).distinct()
      .join(spark.table(table), Seq("fp"), "left_anti")
    val base = TableCommit.epochOf(spark, table)
    TableCommit.commit(spark, table, base) {
      newFps.repartition(nBuckets, col("fp"))
        .write.mode(SaveMode.Append)
        .bucketBy(nBuckets, "fp").sortBy("fp")
        .format("parquet").saveAsTable(table)
      base + 1
    }
  }
}
