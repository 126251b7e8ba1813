package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** Behavior specs for the Bloom-pruned shuffle join: result equality
  * with the plain join (no false negatives by construction), real
  * pruning on a selective build side, and the plan shape — the probe
  * predicate sits below the exchange. */
class BloomJoinSpec extends SparkSpec {

  test("bloom-pruned join equals the plain inner join") {
    val orders = Tables.load(spark, sf0001, "orders")
    val cust = Tables.load(spark, sf0001, "customer")
      .where(col("c_acctbal") > 9000)
      .select(col("c_custkey").as("o_custkey"), col("c_name"))
    val plain = orders.join(cust, "o_custkey")
      .select("o_orderkey", "o_custkey", "c_name")
      .collect().map(_.toSeq).sortBy(_.toString)
    // force the shuffle-join path the operator targets
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val pruned = BloomJoin.inner(orders, cust, "o_custkey")
        .select("o_orderkey", "o_custkey", "c_name")
        .collect().map(_.toSeq).sortBy(_.toString)
      assert(pruned === plain)
      assert(plain.nonEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("the probe side actually shrinks before the shuffle") {
    val orders = Tables.load(spark, sf0001, "orders")
    val cust = Tables.load(spark, sf0001, "customer")
      .where(col("c_acctbal") > 9000)
    val total = orders.count()
    val pruned = BloomJoin.prune(
      orders, cust, orders("o_custkey"), cust("c_custkey")).count()
    // selective build side → far fewer rows enter the exchange; FP rate
    // at mBits=2^22 over a few hundred keys is ~0
    assert(pruned < total / 2, s"pruned=$pruned total=$total")
    assert(pruned > 0)
  }

  test("the bloom predicate sits in the plan as a map-side filter") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = Tables.load(spark, sf0001, "orders")
      val cust = Tables.load(spark, sf0001, "customer")
        .where(col("c_acctbal") > 9000)
        .select(col("c_custkey").as("o_custkey"), col("c_name"))
      val plan = BloomJoin.inner(orders, cust, "o_custkey")
        .queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("bloomprobe"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
