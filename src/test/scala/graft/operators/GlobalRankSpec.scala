package graft.operators

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class GlobalRankSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("rank equals the single-partition row_number on a unique key") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (i.toLong * 7919 % 5001, s"d$i"))
      .toDF("score", "id")
    val got = GlobalRank.byKey(df,
        Seq(col("score").desc, col("id").asc), "pos")
      .orderBy("pos").select("id", "pos").collect().toSeq
    val want = df.orderBy(col("score").desc, col("id").asc)
      .select("id").collect().toSeq.zipWithIndex
      .map { case (r, i) => (r.getString(0), i + 1L) }
    assert(got.map(r => (r.getString(0), r.getLong(1))) == want)
  }

  test("ranks are a 1..n permutation across many partitions") {
    import spark.implicits._
    val df = (1 to 10000).map(i => (i.toLong, s"d$i")).toDF("k", "id")
    val ranks = GlobalRank.byKey(df, Seq(col("k").asc), "pos")
      .select("pos").as[Long].collect().sorted
    assert(ranks.toSeq == (1L to 10000L).toSeq)
  }

  test("no window sorts the whole dataset in one partition") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, s"d$i")).toDF("k", "id")
    val ranked = GlobalRank.byKey(df, Seq(col("k").asc), "pos")
    ranked.collect()
    val plan = ranked.queryExecution.executedPlan
    // every WindowExec must be PARTITIONED (the per-slice rank or the
    // numPartitions-row offset scan) — an empty partitionSpec over the
    // input table would be the single-task global sort trap
    val windows = collectWithSubqueries(plan) { case w: WindowExec => w }
    assert(windows.nonEmpty)
    val unpartitioned = windows.filter(_.partitionSpec.isEmpty)
    // the offsets frame (one counted row per partition, post-aggregate)
    // is the only frame allowed an unpartitioned window: its input must
    // be the graft_pid count aggregate, never the data table
    unpartitioned.foreach { w =>
      assert(w.child.output.map(_.name).contains("graft_n"),
        s"unpartitioned window over a non-offsets input:\n$w")
      assert(hasAggregateChild(w.child),
        s"unpartitioned window input is not an aggregate:\n$w")
    }
  }

  private def hasAggregateChild(p: SparkPlan): Boolean =
    collectWithSubqueries(p) {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }.nonEmpty
}
