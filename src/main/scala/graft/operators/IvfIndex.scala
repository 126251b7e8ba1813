package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Persisted IVF (inverted-file) vector index — the "index once, probe
  * many" ANN shape. The per-query IVF (s03) re-derives the centroid
  * assignment every run; a production vector store materializes the
  * assignment ONCE per corpus revision and serves every later query from
  * the persisted lists — this operator is that split, the vector analog
  * of [[IncrementalDedup]]'s signature snapshot.
  *
  * Layout is the whole point: the index is a managed parquet table
  * PARTITIONED by the centroid id, one directory per inverted list, so a
  * probe that visits nProbe of K lists reads exactly those directories.
  * Static probes prune at plan time; a probe TABLE joined on `cid` prunes
  * at runtime via dynamic partition pruning — the scan carries a
  * `dynamicpruning` partition filter fed by the broadcast probe side, and
  * the non-probed (K−nProbe)/K of the corpus is never read
  * (`PlanQualitySpec` pins the DPP filter on the scan). At 100 TB with
  * K=65536 lists and nProbe=64, that is 1/1024th of the index touched
  * per probe batch, decided without a driver round-trip.
  *
  * Writer discipline: hash-repartition by `cid` before the partitioned
  * write, so each inverted-list directory is written by the task(s)
  * owning that centroid — O(1) files per list, not numTasks × K (see
  * [[PartitionedLayout]] for the failure mode).
  */
object IvfIndex {

  /** Size-derived list count: the smallest power of two whose SQUARE
    * covers the corpus (K ≈ √n, floored at 8) — the classic IVF
    * balance point. Both sides of the cost scale with K: assignment
    * scores n·K centroid pairs, a probe scans nProbe·(n/K) list
    * members, and K ≈ √n makes both O(n^1.5)-total / O(√n)-per-probe
    * instead of one of them quadratic. The r10 scale probe measured
    * exactly that failure at a FIXED K: s10's corpus-scaled probe set
    * over K=8 lists read exp 2.12 (5.6 → 58.2 s at x10 → x30) because
    * every list grew with n while the probe count did too. Integer-only
    * (compare squares, never sqrt) so the SQL oracle derives the
    * identical K with no float edge. */
  def kFor(n: Long): Long = {
    var k = 8L
    while (k * k < n) k <<= 1
    k
  }

  /** Coarse-cell count for the two-level assignment: the smallest power
    * of two whose square covers K — the same balance law one level up.
    * With K = kFor(n) ≈ √n lists, a FLAT argmax scores n·K ≈ n^1.5
    * centroid pairs total — correct at x30 (13× better than fixed K)
    * but the dominant cost at a true 100×. Routing coarse-then-children
    * ([[assignTwoLevel]]) makes the assignment pass
    * n·(C + [[CoarseProbes]]·K/C) ≈ n·3√K, the classic two-level IVF
    * trainer shape, while the list layout and the probe path stay
    * exactly as they were. */
  def coarseFor(k: Long): Long = {
    var c = 1L
    while (c * c < k) c <<= 1
    c
  }

  /** Coarse cells each vector routes through before the child argmax.
    * Chosen from the measured agreement curve vs the flat argmax on
    * the synthetic corpus (near-uniform 64-dim — the ADVERSARIAL case
    * for hierarchical routing, since the similarity landscape is all
    * near-ties): id-derived coarse cells read 0.49–0.59 at w=2 and
    * 0.72–0.78 at w=4; ONE Lloyd round over the child centroids lifts
    * the same widths to 0.60–0.70 and 0.83–0.89. w=4 + learned coarse
    * is the knee; the residual disagreements are near-tie list swaps
    * whose probe-recall cost `IvfIndexSpec` measures. Shared with the
    * s10 SQL oracle. */
  val CoarseProbes = 4

  /** Quantization step for the coarse LEARNING pass: coarse reps are
    * element-wise sums of member centroids, and double summation order
    * differs between Spark and DuckDB — so the learning runs on
    * floor(x·1e4) integer-valued doubles (the s08 replay trick), whose
    * sums are EXACT (order-free) while
    * members·1e4 · sqrt(dim) < 2^26.5 — ~4k members/cell at 64 dims,
    * far past any kFor/coarseFor ratio. Routing similarities are then
    * identical in both engines; only the final child argmax uses the
    * raw vectors (it approximates the flat argmax, which is raw). */
  val CoarseQuant = 1e4

  /** Two-level nearest-centroid routing — [[assign]]'s scale form, all
    * joins broadcast-equi and every step 6-rounded/id-tie-broken so the
    * SQL oracle replays it exactly:
    *  1. coarse INIT = every (K/C)-th centroid (C = [[coarseFor]](K));
    *  2. one Lloyd round over the quantized child centroids (assign
    *     children to nearest init cell, re-center each cell on the
    *     exact member sum — cosine vs the un-normalized sum equals
    *     cosine vs the mean, the s08 argument) — the learned cells are
    *     what makes the hierarchy geometrically coherent (see
    *     [[CoarseProbes]]'s measured curve);
    *  3. each centroid routes to its nearest learned cell (K·C pairs);
    *  4. each vector scores the C learned cells, keeps its
    *     [[CoarseProbes]] best, then argmaxes over just those cells'
    *     children — n·(C + CoarseProbes·K/C) ≈ n·5√K scored pairs
    *     against the flat pass's n·K.
    * APPROXIMATE by design: a vector whose true nearest child hangs
    * under an unprobed cell lands in a neighboring list — the standard
    * two-level IVF trade, measured (not assumed) in `IvfIndexSpec`
    * against the flat argmax, as probe recall, not just agreement. */
  def assignTwoLevel(vecs: DataFrame, centroids: DataFrame,
      w: Int = CoarseProbes): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions.dot
    val k = centroids.count()
    val c = coarseFor(k)
    val step = k / c
    val qc = centroids
      .withColumn("qcv", transform(col("cv"),
        x => floor(x * lit(CoarseQuant)).cast("double")))
      .withColumn("qcn", sqrt(dot(col("qcv"), col("qcv"))))
    val coarse0 = qc.where(col("cid") % step === 0)
      .select(col("cid").as("ccid"), col("qcv").as("ccv"),
        col("qcn").as("ccn"))
    val lloyd = qc.join(broadcast(coarse0))
      .select(col("cid"), col("qcv"), col("ccid"),
        round(dot(col("qcv"), col("ccv")) / (col("qcn") * col("ccn")), 6)
          .as("csim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("cid"))
          .orderBy(col("csim").desc, col("ccid"))))
      .where(col("rn") === 1)
    val learned = lloyd.groupBy(col("ccid"))
      .agg(graft.functions.ArrayElementSum.column(col("qcv")).as("lv"))
      .withColumn("ln", sqrt(dot(col("lv"), col("lv"))))
    val c2c = qc.join(broadcast(learned))
      .select(col("cid"), col("cv"), col("cn"), col("ccid"),
        round(dot(col("qcv"), col("lv")) / (col("qcn") * col("ln")), 6)
          .as("csim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("cid"))
          .orderBy(col("csim").desc, col("ccid"))))
      .where(col("rn") === 1)
      .select(col("cid"), col("cv"), col("cn"), col("ccid"))
    val v2c = vecs.select(col("vec_id"), col("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .join(broadcast(learned))
      .select(col("vec_id"), col("v"), col("nrm"), col("ccid"),
        round(dot(col("v"), col("lv")) / (col("nrm") * col("ln")), 6)
          .as("csim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("csim").desc, col("ccid"))))
      .where(col("rn") <= w)
      .select(col("vec_id"), col("v"), col("nrm"), col("ccid"))
    val assigned = v2c.join(broadcast(c2c), "ccid")
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"),
        round(dot(col("v"), col("cv")) / (col("nrm") * col("cn")), 6)
          .as("csim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("csim").desc, col("cid"))))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"))
    // CHILDLESS-CELL GUARD (the r11 advice's finding): the final
    // assignment inner-joins v2c⋈c2c on ccid, so a vector whose w
    // probed learned cells ALL ended up with zero children after the
    // c2c re-routing would get no assignment row at all — silently
    // absent from the index, never served as a neighbor (the flat
    // argmax can never drop a vector). A drop needs a childless cell
    // to exist in the first place, and cell-childfulness is decidable
    // from the TINY frames (C learned cells, K centroid routes), so
    // the common case pays two small-row counts and nothing else;
    // only when childless cells exist does the fallback path run —
    // vectors with no surviving row re-route through the flat argmax
    // ([[assign]]), so the index always covers the corpus. The S10
    // SQL oracle mirrors the same rule (asg2's NOT-IN fallback).
    val nChildless = learned
      .join(c2c.select(col("ccid")).distinct(), Seq("ccid"), "left_anti")
      .count()
    if (nChildless == 0) assigned
    else {
      // MEMORY_AND_DISK, not MEMORY_ONLY: `assigned` is corpus-sized WITH
      // its vectors, and a localCheckpoint truncates lineage — an evicted
      // MEMORY_ONLY block is unrecoverable and fails the job at exactly
      // the scale this guard exists for. Disk spill keeps the rare
      // fallback path correct under memory pressure.
      val kept = assigned.localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val missing = vecs.select(col("vec_id"), col("v"))
        .join(kept.select(col("vec_id")), Seq("vec_id"), "left_anti")
      kept.unionByName(assign(missing, centroids))
    }
  }

  /** Write `assigned` (payload columns + a `cid` centroid-id column) as
    * the partitioned index table (overwriting the previous revision). */
  def write(assigned: DataFrame, table: String): Unit = {
    val spark = assigned.sparkSession
    // an in-memory catalog forgets tables between sessions but the
    // warehouse directory survives — saveAsTable(Overwrite) then refuses
    // the orphaned location, so clear both the entry and the directory
    // (same discipline as IncrementalDedup.writeSnapshotBands)
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    assigned.repartition(col("cid"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cid")
      .format("parquet").saveAsTable(table)
  }

  /** Nearest-centroid routing for raw vectors `(vec_id, v)` — the
    * insert-side assignment shared by the batch writer and the
    * streaming ingest path ([[graft.streaming.StreamingAnn.ingest]]):
    * centroids `(cid, cv, cn)` are broadcast (K rows), each vector
    * scores all K and keeps its best list (6-rounded cosine, ties →
    * lower cid — the engine's canonical determinism). */
  def assign(vecs: DataFrame, centroids: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions.dot
    vecs.select(col("vec_id"), col("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .join(broadcast(centroids))
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"),
        round(dot(col("v"), col("cv")) / (col("nrm") * col("cn")), 6)
          .as("csim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("csim").desc, col("cid"))))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"))
  }

  /** Append a delta batch of assigned vectors into the existing index —
    * incremental maintenance (the vector analog of
    * [[IncrementalDedup]]'s snapshot-delta path): new files land ONLY in
    * the touched inverted-list directories; untouched lists keep their
    * files byte-identical, so a 100 TB index absorbs a batch at the cost
    * of the batch, never a rewrite. Same writer discipline as [[write]]
    * (pre-repartition by `cid` → O(1) new files per touched list).
    * Re-[[write]] periodically to re-balance lists if the centroid set
    * is retrained. */
  def append(assigned: DataFrame, table: String): Unit =
    assigned.repartition(col("cid"))
      .write.mode(SaveMode.Append)
      .partitionBy("cid")
      .format("parquet").saveAsTable(table)

  /** [[append]] under the [[TableCommit]] protocol: concurrent appenders
    * to the same index serialize (two simultaneous `saveAsTable(Append)`
    * calls race the catalog and can interleave partial file sets); the
    * loser gets [[TableCommit.ConcurrentWriteException]] and retries.
    * Unlike [[SnapshotMerge.mergeCommit]] the write itself runs inside
    * the lock — an append is delta-sized by nature, and it does not read
    * the table, so there is no stale-base state to stage outside. */
  def appendCommit(assigned: DataFrame, table: String): Long = {
    val spark = assigned.sparkSession
    val base = TableCommit.epochOf(spark, table)
    TableCommit.commit(spark, table, base) {
      append(assigned, table)
      base + 1
    }
  }

  /** The index back as a DataFrame; filters and joins on `cid` prune
    * whole inverted-list directories. */
  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Compact the inverted-list directories that accumulated small files
    * from [[append]] batches — each append adds a file per touched list,
    * and probe latency degrades with footer reads and split planning, not
    * bytes. Delegates per list directory to [[ParquetCompactor.compact]]
    * (crash-safe swap; directories at or under `minFiles` files are
    * skipped, so steady-state runs cost nothing), then refreshes the
    * table so cached file listings drop. Run between append batches —
    * the index has no continuous writer, so every list is closed (the
    * concurrency contract `ParquetCompactor` documents). */
  def compact(spark: SparkSession, table: String,
      targetFileBytes: Long = 128L << 20, minFiles: Int = 8)
      : Seq[ParquetCompactor.CompactionResult] = {
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table)).location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lists = fs.listStatus(loc).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cid="))
      .sortBy(_.getPath.getName)
    val results = lists.map(s => ParquetCompactor.compact(
      spark, s.getPath.toString, targetFileBytes, minFiles))
    spark.sql(s"REFRESH TABLE `$table`")
    results
  }
}
