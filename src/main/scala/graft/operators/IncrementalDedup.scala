package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.streaming.StreamingDedup

/** Incremental (snapshot–delta) near-duplicate detection — the production
  * dedup shape: "is anything in this NEW batch a near-dup of the standing
  * corpus", answered WITHOUT re-pairing the standing corpus against
  * itself. The batch dedup queries (d02/d03) re-derive all pairs from
  * scratch each run; at 100 TB the standing side must be a materialized
  * signature snapshot that each delta batch probes.
  *
  * Layout is the whole point:
  *  - [[writeSnapshot]] stores the standing corpus's MinHash band table
  *    (band key, doc id, 16-long signature — the exact arithmetic of the
  *    batch d03 and streaming [[StreamingDedup]] tiers) BUCKETED by band
  *    key via [[BucketedLayout]]. The snapshot is written once per
  *    accepted corpus revision and is ~tens of bytes per document.
  *  - [[dedupDelta]] joins the delta's band table against the snapshot on
  *    the band key. Because the snapshot is bucketed on that key, ONLY the
  *    delta side shuffles (to the snapshot's bucket count); the snapshot —
  *    the 100 TB side — is read bucket-for-bucket with no Exchange.
  *    `PlanQualitySpec` pins the Exchange-free snapshot scan.
  *
  * Candidates (band-key collisions) are verified by signature agreement —
  * the fraction of the 16 minhash positions that match, an unbiased
  * Jaccard estimate (same confirm rule as the streaming tier, so a doc
  * flagged here is flagged there). Documents with fewer than 3 tokens
  * have no shingles, hence no signature: they can near-dup nothing and
  * pass through as kept.
  */
object IncrementalDedup {

  /** Fraction of the 16 signature positions two docs agree on. */
  private def agree(a: Column, b: Column): Column =
    size(filter(zip_with(a, b, (p, q) => p === q), x => x)) / lit(16.0d)

  /** Materialize the standing corpus's signature snapshot as a bucketed
    * managed table: (band, doc_id, sig) bucketed+sorted by band. `docs`
    * needs (doc_id, text). Re-run to refresh after accepting a batch. */
  def writeSnapshot(docs: DataFrame, table: String, nBuckets: Int = 32): Unit =
    writeSnapshotBands(StreamingDedup.withBands(docs), table, nBuckets)

  /** [[writeSnapshot]] from an already-derived band table (doc_id, sig,
    * band) — the entry point when the corpus's shingle fingerprints are
    * already materialized (the batch pipeline shares them across the
    * whole dedup family; re-tokenizing the standing corpus would double
    * the write's cost). */
  def writeSnapshotBands(bands: DataFrame, table: String,
      nBuckets: Int = 32): Unit = {
    val spark = bands.sparkSession
    // an in-memory catalog forgets tables between sessions but the
    // warehouse directory survives — saveAsTable(Overwrite) then refuses
    // the orphaned location, so clear both the entry and the directory
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    BucketedLayout.writeBucketed(
      bands.select(col("band"), col("doc_id"), col("sig")),
      table, "band", nBuckets)
  }

  /** Flag each delta document against the standing snapshot AND against
    * earlier documents within the same delta batch. Returns one row per
    * delta doc: (doc_id, dup_of = min matched standing-or-earlier-delta
    * doc id or NULL, kept = 1 when dup_of is NULL). */
  def dedupDelta(spark: SparkSession, delta: DataFrame, table: String,
      estThreshold: Double = 0.5): DataFrame =
    dedupDeltaBands(spark, delta.select(col("doc_id")),
      StreamingDedup.withBands(delta), table, estThreshold)

  /** [[dedupDelta]] from an already-derived delta band table; `deltaIds`
    * is every delta doc id (including signature-less short docs, which
    * must still come back as kept). */
  def dedupDeltaBands(spark: SparkSession, deltaIds: DataFrame,
      bands: DataFrame, table: String,
      estThreshold: Double = 0.5): DataFrame = {
    val snap = spark.table(table)
    // two consumers (snapshot probe + within-batch self-join): pay the
    // band derivation once — delta batches are small by nature
    val dband = bands.persist(StorageLevel.MEMORY_AND_DISK)
    val vsSnap = dband.as("d").join(snap.as("s"),
        col("d.band") === col("s.band"))
      .where(agree(col("d.sig"), col("s.sig")) >= estThreshold)
      .select(col("d.doc_id").as("doc_id"), col("s.doc_id").as("src"))
    // within-batch: a delta doc dups any EARLIER delta doc it collides
    // with (arrival order = doc id), mirroring the streaming tier's
    // deterministic fold order
    val vsDelta = dband.as("x").join(dband.as("y"),
        col("x.band") === col("y.band") &&
          col("y.doc_id") < col("x.doc_id"))
      .where(agree(col("x.sig"), col("y.sig")) >= estThreshold)
      .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("src"))
    val dup = vsSnap.union(vsDelta)
      .groupBy(col("doc_id")).agg(min(col("src")).as("dup_of"))
    deltaIds.join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of"),
        col("dup_of").isNull.cast("long").as("kept"))
  }
}
