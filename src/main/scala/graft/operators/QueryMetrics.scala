package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Measured query cost — the engine's "measure, don't guess" surface.
  *
  * Plan pins ([[graft.queries.PlanQualitySpec]]) assert SHAPES (no
  * cartesian, broadcast here, partial agg there); this complements them
  * with the VOLUMES a run actually moved: executes the frame's own
  * physical plan once and sums the per-operator SQLMetrics that Spark
  * already maintains (shuffle bytes/records written, spill bytes, output
  * rows). At 100 TB the difference between "the plan looks right" and
  * "this stage shuffled 40 TB" is exactly these numbers, and they come
  * from the same counters the Spark UI shows — no extra instrumentation
  * on the hot path.
  *
  * `Bench` emits them per query when `SPARK_GRAFT_BENCH_METRICS=1`
  * (untimed second pass, so the timed methodology is unchanged).
  */
object QueryMetrics {

  /** Summed operator metrics of one executed plan, keyed by Spark's
    * internal SQLMetric names ("shuffleBytesWritten", "spillSize", …). */
  final case class Cost(rows: Long, byKey: Map[String, Long]) {
    def shuffleBytesWritten: Long = byKey.getOrElse("shuffleBytesWritten", 0L)
    def shuffleRecordsWritten: Long =
      byKey.getOrElse("shuffleRecordsWritten", 0L)
    /** Sort/aggregate/join spill to disk, bytes. */
    def spillBytes: Long = byKey.getOrElse("spillSize", 0L)
  }

  /** Execute `df`'s physical plan and return its row count plus the
    * summed operator metrics. Runs the REAL plan (the one `collect`
    * would run), not a `count` rewrite — so scans, shuffles and sorts
    * are all exercised and their counters populated. */
  def measure(df: DataFrame): Cost = {
    val plan = df.queryExecution.executedPlan
    val rows = plan.execute().count()
    val sums = scala.collection.mutable.Map.empty[String, Long]
    flatten(plan).foreach { node =>
      node.metrics.foreach { case (key, m) =>
        // unset SQLMetrics sit at their sentinel initial value (-1 or 0
        // depending on type) — only accumulate real readings
        if (m.value > 0) sums(key) = sums.getOrElse(key, 0L) + m.value
      }
    }
    Cost(rows, sums.toMap)
  }

  /** Post-execution tree walk that sees through AQE wrappers: the final
    * adaptive plan, materialized query stages, and reused exchanges. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
    case q: QueryStageExec => q +: flatten(q.plan)
    case r: ReusedExchangeExec => r +: flatten(r.child)
    case other => other +: other.children.flatMap(flatten)
  }
}
