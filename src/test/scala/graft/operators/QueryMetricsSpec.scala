package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The measured-volume counterpart of PlanQualitySpec's shape pins: the
  * numbers come from Spark's own operator SQLMetrics, so a claim like
  * "this query spills nothing at this scale" is checked against what a
  * run actually did, not inferred from the plan. */
class QueryMetricsSpec extends SparkSpec {

  test("a shuffling aggregate reports shuffle volume; row count matches") {
    val df = graft.Tables.load(spark, sf0001, "lineitem")
      .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
    val expected = df.count()
    val cost = QueryMetrics.measure(df)
    assert(cost.rows === expected)
    assert(cost.shuffleBytesWritten > 0)
    assert(cost.shuffleRecordsWritten > 0)
    assert(cost.spillBytes === 0, "sf0.001 aggregate must not spill")
  }

  test("a broadcast-join query moves no shuffle bytes for the join") {
    // nation is broadcast under the default threshold: the only shuffle
    // in this plan is the final aggregate's — measure a pure join+filter
    // (no agg, no sort) and the counter must stay at zero
    val c = graft.Tables.load(spark, sf0001, "customer")
    val n = graft.Tables.load(spark, sf0001, "nation")
    val df = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .where(col("n_name") =!= "FRANCE")
      .select(col("c_custkey"), col("n_name"))
    val cost = QueryMetrics.measure(df)
    assert(cost.rows > 0)
    assert(cost.shuffleBytesWritten === 0,
      s"broadcast join shuffled ${cost.shuffleBytesWritten} bytes")
  }

  test("d03's measured shuffle volume stays far below corpus bytes") {
    graft.queries.LlmQueries.clearStageCache()
    val corpusBytes = graft.Tables.load(spark, sf0001, "documents")
      .agg(sum(length(col("text")))).head.getLong(0)
    val cost = QueryMetrics.measure(
      graft.queries.LlmQueries.all("d03_dedup_minhash_lsh")(spark, sf0001))
    assert(cost.shuffleBytesWritten > 0)
    // the LSH path shuffles signatures/fingerprints, not documents: the
    // multiple of the corpus it moves is bounded (fingerprints ≈ one
    // long per word, several stages) — a cartesian or a text reshuffle
    // per stage would blow well past this
    assert(cost.shuffleBytesWritten < 60L * corpusBytes,
      s"d03 shuffled ${cost.shuffleBytesWritten} B vs corpus $corpusBytes B")
    assert(cost.spillBytes === 0)
  }
}
