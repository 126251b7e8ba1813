package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sum + fixed-length sequence packing — the
  * "concatenate documents, slice into training windows" step of an LLM
  * data pipeline (GPT-style block packing).
  *
  * A naive `sum(x) over (order by k)` forces every row through ONE
  * partition — the canonical scale killer for global running totals. This
  * operator computes the identical result with the classic two-level
  * scan: rows are bucketed into deterministic key blocks, per-block sums
  * are aggregated (tiny frame: one row per block), block OFFSETS are a
  * running total over that tiny frame only, and the final per-row prefix
  * is blockOffset + within-block running sum (each window partitioned by
  * block, so no single-partition stage ever sees more than a block).
  *
  * Determinism: blocks are `key div blockSize` — a pure function of the
  * key, not of partition placement (spark_partition_id / repartitionByRange
  * sampling would both be nondeterministic under retry).
  */
object SequencePacker {

  /** Adds `prefix` = sum of `weight` over all rows with key < this key
    * (exclusive running total), computed with the two-level scan above.
    * `key` must be unique per row; `weight` must be a LONG column. */
  def withPrefixSum(df: DataFrame, key: String, weight: String,
      prefix: String, blockSize: Long = 1024L): DataFrame = {
    // integral `div`, never `/` (which promotes to double and perturbs
    // keys past 2^53); keys are assumed non-negative ids
    val blk = df.withColumn("graft_blk",
      expr(s"CAST($key AS BIGINT) div ${blockSize}L"))
    val blkOff = blk.groupBy(col("graft_blk"))
      .agg(sum(col(weight)).as("graft_bsum"))
      .withColumn("graft_boff",
        coalesce(sum(col("graft_bsum")).over(
          Window.orderBy(col("graft_blk"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("graft_blk"), col("graft_boff"))
    blk
      .withColumn("graft_ioff",
        coalesce(sum(col(weight)).over(
          Window.partitionBy(col("graft_blk")).orderBy(col(key))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .join(broadcast(blkOff), "graft_blk")
      .withColumn(prefix, col("graft_boff") + col("graft_ioff"))
      .drop("graft_blk", "graft_boff", "graft_ioff")
  }

  /** Packs rows (documents with a token count) into fixed-capacity
    * training sequences: documents are concatenated in `key` order and
    * sliced into `seqLen`-token windows; each document reports the
    * sequence its first token lands in and its offset within it.
    * Output adds `seq_id` and `seq_off`. */
  def pack(df: DataFrame, key: String, nTokens: String,
      seqLen: Long, blockSize: Long = 1024L): DataFrame =
    withPrefixSum(df, key, nTokens, "graft_start", blockSize)
      .withColumn("seq_id", expr(s"graft_start div ${seqLen}L"))
      .withColumn("seq_off", col("graft_start") % seqLen)
      .drop("graft_start")
}
