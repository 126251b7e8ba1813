package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed table layout — the shuffle-free-join story for tables that
  * are joined on the same key again and again (fact↔fact joins too big
  * to broadcast). Writing both sides bucketed AND sorted by the join key
  * means every future join between them is satisfied by the on-disk
  * layout: Spark reads matching buckets pairwise and merge-joins with NO
  * Exchange and NO Sort on either side. At 100 TB that converts every
  * repeated join of the two tables from a full network shuffle into a
  * local streaming merge — the shuffle is paid once, at write time.
  *
  * Spark-native knob: `DataFrameWriter.bucketBy(n, key).sortBy(key)` +
  * `saveAsTable` (works on the in-memory catalog + parquet; no Hive
  * needed). Reading the sort order back is opt-in since Spark 3
  * (`spark.sql.legacy.bucketedTableScan.outputOrdering=true`) and only
  * sound with one file per bucket — which [[writeBucketed]] guarantees.
  * `BucketedJoinSpec` pins the Exchange-free, Sort-free plan.
  */
object BucketedLayout {

  /** Write `df` as a bucketed+sorted managed table (overwriting).
    *
    * The `repartition(n, key)` first is load-bearing: it uses the same
    * hash as the bucketing, so each task holds exactly one bucket's rows
    * and writes ONE file per bucket — the condition under which the scan
    * reports its sort order and the downstream merge-join drops its Sort
    * (with many files per bucket Spark keeps the Sort, since only
    * per-file order is known). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      nBuckets: Int): Unit =
    df.repartition(nBuckets, org.apache.spark.sql.functions.col(key))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
}
