package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global 1-based rank over a total order WITHOUT the single-partition
  * window: `row_number() OVER (ORDER BY …)` — no PARTITION BY — funnels
  * the entire dataset through one task, the same trap SequencePacker's
  * two-level prefix sum avoids for running sums. Here:
  *
  *  1. range-repartition by the sort key (parallel sampled-boundary
  *     exchange — what orderBy itself does),
  *  2. rank within each partition (window PARTITIONED by partition id —
  *     every task sorts only its slice),
  *  3. per-partition counts → cumulative offsets (one tiny aggregate of
  *     numPartitions rows), broadcast back, rank = local rank + offset.
  *
  * The output rank is deterministic for a UNIQUE sort key even though
  * range boundaries are sampled: boundaries only decide which task
  * computes which slice of the order, never the order itself.
  */
object GlobalRank {

  /** Append `rankCol` = 1-based global rank by `sortCols` (must be a
    * unique total order for determinism). */
  def byKey(df: DataFrame, sortCols: Seq[Column],
      rankCol: String = "rank"): DataFrame = {
    require(sortCols.nonEmpty, "need at least one sort column")
    val parted = df.repartitionByRange(sortCols: _*)
      .withColumn("graft_pid", spark_partition_id())
    val offsets = parted.groupBy(col("graft_pid"))
      .agg(count(lit(1)).as("graft_n"))
      .withColumn("graft_off",
        coalesce(sum(col("graft_n")).over(
          Window.orderBy(col("graft_pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("graft_pid"), col("graft_off"))
    parted
      .withColumn("graft_r", row_number().over(
        Window.partitionBy(col("graft_pid")).orderBy(sortCols: _*)))
      .join(broadcast(offsets), "graft_pid")
      .withColumn(rankCol, (col("graft_off") + col("graft_r")).cast("long"))
      .drop("graft_pid", "graft_r", "graft_off")
  }
}
