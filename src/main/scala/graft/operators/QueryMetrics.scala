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

  /** Run `body` and return its result plus the task-level shuffle-write
    * and spill totals of EVERY job it triggered. [[measure]] reads one
    * executed plan's SQLMetrics — which misses work a multi-job operator
    * does eagerly before returning its frame (HnswGraph.build runs its
    * NN-descent rounds through eager localCheckpoints, so the returned
    * plan is only the final prune; measuring it says nothing about the
    * rounds where the r9 x30 probe caught vectors shuffling per pair).
    * This variant listens at the task level instead, so checkpointed
    * sub-jobs count. Single-session scope: the listener is global, so
    * callers must not run concurrent actions they don't want counted
    * (sbt test runs suites sequentially in the forked JVM). */
  final case class JobCost(shuffleBytesWritten: Long,
      shuffleRecordsWritten: Long, spillBytes: Long)
  def measureJobs[T](spark: org.apache.spark.sql.SparkSession)(
      body: => T): (T, JobCost) = {
    val bytes = new java.util.concurrent.atomic.AtomicLong
    val recs = new java.util.concurrent.atomic.AtomicLong
    val spill = new java.util.concurrent.atomic.AtomicLong
    val seen = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val tm = e.taskMetrics
        if (tm != null) {
          bytes.addAndGet(tm.shuffleWriteMetrics.bytesWritten)
          recs.addAndGet(tm.shuffleWriteMetrics.recordsWritten)
          spill.addAndGet(tm.memoryBytesSpilled + tm.diskBytesSpilled)
        }
        seen.incrementAndGet()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val out = body
      // the thunk's actions are synchronous, so all tasks have ENDED by
      // here — only listener-bus delivery is async. Quiesce: stop once
      // no new TaskEnd arrives for 200 ms (bounded at 10 s).
      var rounds = 0
      var settled = false
      while (!settled && rounds < 50) {
        val snap = seen.get()
        Thread.sleep(200)
        settled = seen.get() == snap
        rounds += 1
      }
      (out, JobCost(bytes.get(), recs.get(), spill.get()))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  /** [[measureJobs]] plus a STRUCTURAL audit: for every query execution
    * the thunk triggers (eager localCheckpoints included — every Dataset
    * action fires the QueryExecutionListener), record each shuffle
    * exchange whose output schema moves a raw `array<double>` column.
    * This is the scale-free form of the defect the r9 x30 probe caught:
    * at sf0.01 a vector reshuffle hides inside byte counters (the
    * intermediate is sorted by src, so lz4 crushes the ~1.8k repeats of
    * each 512-byte vector and bytes/record stays pair-width either way
    * — measured 10.8 vs 14.2 B/rec with/without the scorePairs
    * broadcast), but the SCHEMA of the exchange cannot lie: a plan that
    * broadcasts vectors has no array<double> attribute in any shuffle,
    * at any scale. A corpus may legitimately move its vectors through a
    * shuffle a constant number of times (`e ⋈ cells` co-shuffles one
    * row per vector — that is one pass of corpus bytes, the price of
    * any distributed join on the vector table); the defect is vectors
    * crossing once per PAIR, so only exchanges whose written-record
    * count exceeds `benignRecordCap` (callers pass a small multiple of
    * the corpus row count) are flagged. Returns the audit as strings
    * "action: column: type: records" for assertion messages.
    * Array-of-struct buffers (collect_list partial aggregates) are
    * deliberately NOT flagged — bounded agg state, not the corpus
    * vector column. */
  def auditVectorShuffles[T](spark: org.apache.spark.sql.SparkSession,
      benignRecordCap: Long = 0L)(
      body: => T): (T, JobCost, Seq[String]) = {
    val hits = java.util.concurrent.ConcurrentHashMap
      .newKeySet[String]()
    val ql = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        flatten(qe.executedPlan).foreach {
          case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
            val written = s.metrics.get("shuffleRecordsWritten")
              .map(_.value).getOrElse(0L)
            if (written > benignRecordCap) s.output.foreach { a =>
              a.dataType match {
                case org.apache.spark.sql.types.ArrayType(
                    org.apache.spark.sql.types.DoubleType |
                    org.apache.spark.sql.types.FloatType, _) =>
                  hits.add(s"$funcName: ${a.name}: " +
                    s"${a.dataType.simpleString}: $written recs")
                case _ => ()
              }
            }
          case _ => ()
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(ql)
    try {
      // measureJobs' quiesce drains the shared async listener bus, so
      // by return the execution-end events have been delivered too
      val (out, cost) = measureJobs(spark)(body)
      (out, cost, {
        import scala.jdk.CollectionConverters._
        hits.asScala.toSeq.sorted
      })
    } finally spark.listenerManager.unregister(ql)
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
