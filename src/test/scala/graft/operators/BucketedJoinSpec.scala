package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class BucketedJoinSpec extends SparkSpec {

  test("bucketed+sorted tables join with no Exchange and no Sort") {
    val orders = Tables.load(spark, sf0001, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.load(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    BucketedLayout.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    BucketedLayout.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 8)
    // disable broadcast so the join would otherwise shuffle both sides;
    // sorted-bucket scan ordering is opt-in since Spark 3 (it is only
    // sound with one file per bucket, which writeBucketed guarantees)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevOrdering =
      spark.conf.get("spark.sql.legacy.bucketedTableScan.outputOrdering")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"bucketed join should read co-located buckets, not shuffle:\n$plan")
      // "Sort [" matches any standalone Sort node (plain or codegen'd
      // "*(n) Sort [") but not "SortMergeJoin ["
      assert(!plan.contains("Sort ["),
        s"sortBy layout should satisfy the merge-join ordering:\n$plan")
      // and the result is still correct
      val viaBuckets = joined.agg(count(lit(1))).head().getLong(0)
      val direct = orders.join(lineitem, "o_orderkey")
        .agg(count(lit(1))).head().getLong(0)
      assert(viaBuckets === direct)
    } finally {
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering",
        prevOrdering)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
