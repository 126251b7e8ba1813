package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual escape hatch when one
  * join key holds a disproportionate share of the big side's rows and a
  * single reducer partition becomes the straggler.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default here) already splits oversized SORT-MERGE partitions at
  * runtime, and a broadcast join sidesteps skew entirely — use those
  * first. Salting remains the tool when neither applies: the build side
  * is too big to broadcast AND the skew is concentrated enough that AQE's
  * split granularity (map-output blocks of one partition) still leaves a
  * hot reducer — or when a deterministic, planner-independent shape is
  * wanted (e.g. a recurring production job pinned against plan
  * regressions).
  *
  * Shape: the skewed (big) side gets a deterministic per-row salt in
  * [0, buckets); the small-but-unbroadcastable side replicates each row
  * `buckets` times, once per salt value; the join keys on (key, salt), so
  * one hot key spreads over `buckets` reducer partitions. Row-content
  * hashing keeps the salt deterministic across retries (no rand() — a
  * retried task must re-salt identically or shuffle replay double-counts).
  * Cost: the replicated side's shuffle volume × buckets — salt only what
  * skew justifies.
  */
object SaltedJoin {

  /** Inner equi-join of `skewed` and `replicated` on `on`, spread over
    * `buckets` salt values. Output columns: skewed ++ replicated minus
    * the join key's duplicate (like a plain `join(…, Seq(on))`). */
  def join(skewed: DataFrame, replicated: DataFrame, on: String,
      buckets: Int): DataFrame = {
    require(buckets > 1, "buckets must be > 1 (1 = plain join)")
    // deterministic salt from the full row content: same row → same salt
    // on task retry; spreads a hot KEY because its rows differ elsewhere
    val salted = skewed.withColumn("_salt",
      pmod(hash(skewed.columns.map(col): _*), lit(buckets)))
    val fanned = replicated.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(fanned, Seq(on, "_salt")).drop("_salt")
  }
}
