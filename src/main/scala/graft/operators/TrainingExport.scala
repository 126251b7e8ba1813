package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.fingerprint

/** Deterministic sharded export for curated training data — the hand-off
  * step at the end of a curation pipeline: the corpus leaves the engine as
  * `nShards` stable partition directories plus a verifiable manifest.
  *
  * Design points that matter at 100 TB:
  *  - **Shard assignment is content-keyed** (`fingerprint(key) % nShards`),
  *    never round-robin / `spark_partition_id()` — the same row lands in
  *    the same shard across retries, cluster sizes, and input layouts, so
  *    a re-run after a partial failure overwrites shards idempotently
  *    instead of reshuffling the corpus into a new layout.
  *  - **Rows sort by key within each shard file** — downstream readers get
  *    locality (range pruning inside a shard) and byte-stable files.
  *  - **The manifest checksum is an XOR of row fingerprints** — order- and
  *    partitioning-independent, so verification can stream shards in any
  *    order and still reproduce it; one cheap scan audits an export.
  *
  * The write is one shuffle (repartition by shard) + a per-partition sort
  * — the minimum for a sorted, sharded layout.
  */
object TrainingExport {

  /** Shard id for a key column: fingerprint of its string form, mod n. */
  def shardOf(key: org.apache.spark.sql.Column, nShards: Int) =
    pmod(fingerprint(key.cast("string")), lit(nShards.toLong))

  /** Per-row content checksum: fingerprint of all columns (in the frame's
    * column order) joined on U+0001 — a separator that cannot occur in the
    * data keeps ("ab","c") and ("a","bc") from hashing alike. NULLs map to
    * a U+0002 sentinel (concat_ws would silently SKIP them, making
    * (NULL,"a") and ("a",NULL) hash alike and hiding null-shift
    * corruption from the checksum). */
  private[graft] def rowFp(df: DataFrame) =
    fingerprint(concat_ws("\u0001", df.columns.map(c =>
      coalesce(col(c).cast("string"), lit("\u0002"))): _*))

  /** The manifest frame for `df` under a `nShards` content-keyed layout —
    * one row per shard: (shard, n_rows, checksum, key_min, key_max). Pure
    * dataflow (no write), so it is also exposed as the oracle-checked
    * `p03_export_manifest` query. One shuffle (the groupBy). */
  def manifestOf(df: DataFrame, key: String, nShards: Int): DataFrame =
    df.withColumn("shard", shardOf(col(key), nShards))
      .withColumn("graft_rfp", rowFp(df))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(graft_rfp)").as("checksum"),
        min(col(key)).as("key_min"), max(col(key)).as("key_max"))
      .orderBy(col("shard"))

  /** Writes `df` as `outDir/shard=N/` parquet, sorted by `key` within
    * each shard, and `outDir/_manifest/` with one row per shard:
    * (shard, n_rows, checksum, key_min, key_max). Returns the manifest. */
  def export(df: DataFrame, key: String, outDir: String,
      nShards: Int): DataFrame = {
    df.withColumn("shard", shardOf(col(key), nShards))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col(key))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard").parquet(outDir)
    // manifest from the files just WRITTEN, not from re-running the input
    // plan: half the cost when df is an expensive pipeline, and the
    // checksums describe what is actually on disk
    val manifest = audit(df.sparkSession, outDir, key)
    manifest.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/_manifest")
    manifest
  }

  /** Re-reads an export and recomputes its manifest from the data; a
    * mismatch (missing shard, lost/duplicated/corrupted row) shows up as
    * a row here that differs from `outDir/_manifest`. */
  def audit(spark: org.apache.spark.sql.SparkSession,
      outDir: String, key: String): DataFrame = {
    val data = spark.read.parquet(outDir)
    val dataCols = data.drop("shard")
    data
      .withColumn("graft_rfp", rowFp(dataCols))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(graft_rfp)").as("checksum"),
        min(col(key)).as("key_min"), max(col(key)).as("key_max"))
      .orderBy(col("shard"))
  }

  /** True iff the stored manifest matches a fresh audit of the data. */
  def verify(spark: org.apache.spark.sql.SparkSession,
      outDir: String, key: String): Boolean = {
    val stored = spark.read.parquet(s"$outDir/_manifest")
    val fresh = audit(spark, outDir, key)
    stored.count() == fresh.count() &&
      stored.exceptAll(fresh).isEmpty && fresh.exceptAll(stored).isEmpty
  }
}
