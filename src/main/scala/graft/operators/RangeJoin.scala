package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join — pairs of rows sharing a key whose event times lie
  * within ±`radiusMicros` of each other. Spark plans a raw
  * `a.ts BETWEEN b.ts - r AND b.ts + r` condition as a broadcast
  * nested-loop (or worse, a cartesian) because there is no equality to
  * hash on; per busy key that is O(n·m) with no partition parallelism.
  *
  * The banded form restores an equi-join: time is binned into buckets of
  * `2·radius`, the PROBE side explodes to the (at most 2) buckets its
  * ±radius window can touch, the build side keeps its single home
  * bucket, and the join keys on (key, bucket) — hash-partitionable,
  * linear-ish, skew-safe like any equi-join. A build row's home bucket
  * intersects the probe's window-cover exactly once, so no dedup pass is
  * needed; the exact |Δt| ≤ radius predicate filters the band's false
  * positives after the join. Same pigeonhole trick as the SimHash bands
  * (LlmQueries d04) applied to time instead of bits.
  */
object RangeJoin {

  /** Attach to each left row all right rows with the same `on` key and
    * |left.time − right.time| ≤ radiusMicros. Output: left columns ++
    * picked right columns (one output row per matched pair; left rows
    * with no match are absent — aggregate with a left join afterwards if
    * zero-counts are needed).
    *
    * @param pick right columns to attach, as (rightName, outputName) */
  def within(left: DataFrame, right: DataFrame, on: String, time: String,
      radiusMicros: Long, pick: Seq[(String, String)]): DataFrame = {
    require(radiusMicros > 0, "radius must be positive")
    val width = 2L * radiusMicros
    // bucket = us div width with INTEGER `div`, never `/`: Column./
    // promotes to double, and near a bucket boundary a rounded quotient
    // would bin the two join sides differently. (div truncates toward
    // zero = floor for the positive epoch-µs this operates on.)
    // probe window [t-r, t+r] has length exactly one bucket width, so it
    // spans at most 2 buckets
    val probe = left
      .withColumn("_rj_us", unix_micros(col(time)))
      .withColumn("_rj_lo", col("_rj_us") - radiusMicros)
      .withColumn("_rj_hi", col("_rj_us") + radiusMicros)
      .withColumn("_rj_bucket", explode(array_distinct(array(
        expr(s"_rj_lo div $width"), expr(s"_rj_hi div $width")))))
      .drop("_rj_lo", "_rj_hi")
    val build = right.select(
      col(on).as("_rj_on"),
      unix_micros(col(time)).as("_rj_t_us"),
      struct(pick.map { case (r, o) => right(r).as(o) }: _*).as("_rj_r"))
      .withColumn("_rj_bucket", expr(s"_rj_t_us div $width"))
    probe.join(build,
        probe(on) === col("_rj_on") &&
          probe("_rj_bucket") === build("_rj_bucket") &&
          abs(col("_rj_us") - col("_rj_t_us")) <= radiusMicros)
      .select(left.columns.map(col) ++
        pick.map { case (_, o) => col(s"_rj_r.$o").as(o) }: _*)
  }
}
