package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions.{dot, toDouble}

/** The serving-read story, r12 form (the r11 verdict's top item): a
  * micro-batch search over the (layer, pt)-partitioned standing graph
  * must NOT re-scan the full n·m adjacency per hop — and must not pay
  * the r11 orchestration constant either. [[HnswGraph.search]]'s
  * `serving = true` is the driver-beam: the |Q|·ef0 frontier lives on
  * the driver, so each hop's scan is STATICALLY pruned (a literal
  * `pt IN (...)` partition filter at plan time — no DPP subquery,
  * nothing for PruneFilters to delete, the fragility class the r11
  * checkpoint-erased-constraint workaround documented) and the
  * expansion + scoring run as one fused shuffle-free job. Four pins:
  *
  *  1. STRUCTURE — some hop's executed plan carries a static partition
  *     filter on `pt` (the scan's PartitionFilters holds an IN/INSET
  *     over the frontier's partitions), and no executed plan carries a
  *     shuffle exchange (the hops are broadcast-only).
  *  2. VOLUME — [[HnswGraph.SearchStats.hopAdjRead]] (adjacency rows
  *     under the frontier's partitions — what the pruned scan admits)
  *     is bounded by the frontier's partition fraction, with the first
  *     hop (entry width efUpper·|Q|) far below the full table. The r10
  *     layout read ALL layer-0 rows every hop whatever |Q|.
  *  3. SEMANTICS — serving results equal the unpruned batch search
  *     exactly (pruning and the driver beam change the execution,
  *     never the answer).
  *  4. REPLAY — duplicate byte-identical corpus rows (the streaming
  *     ingest's at-least-once window) change NO answer, on either
  *     path (the r11 advice's finding: pre-fix, a duplicated row
  *     occupied two beam ranks and evicted a genuine neighbor).
  *
  * Corpus: 6k generated vectors ([[graft.ScaleData]], pure function of
  * id — machine-independent), big enough that ptFor gives a real
  * partition count (256) while the build stays spec-sized. The
  * x10/x30/x100 serving walls are measured by [[ServeProbe]]
  * (SCALING_r12.json); this is the regression gate.
  */
class HnswPruneSpec extends SparkSpec {

  test("driver-beam serving statically prunes hops to the frontier's " +
      "partitions, runs shuffle-free, and answers exactly like the " +
      "unpruned batch search — with or without replayed corpus rows") {
    import spark.implicits._
    val n = 6000L
    val table = "hnsw_prune_spec"
    val e = spark.range(n).map(i => graft.ScaleData.emb(i))
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .persist()
    e.count()
    val ptMod = HnswGraph.ptFor(n)
    assert(ptMod === 256L, "6k corpus must exercise a real partition count")
    val m = HnswGraph.mFor(n)
    val stride = HnswGraph.strideFor(n)
    SnapshotMerge.dropTableAndLocation(spark, table)
    val cells = HnswGraph.signCells(e, HnswGraph.bitsFor(n))
    HnswGraph.writeGraph(
      HnswGraph.build(e, cells, m = m, stride = stride), table, n)
    val adj = spark.table(table)
    val l0Rows = adj.where(col("layer") === 0).count()

    // a 2-query serving micro-batch
    val qs2 = e.where(col("vec_id").isin(71L, 1332L))
      .select(col("vec_id").as("q"), col("v").as("qv"),
        col("nrm").as("qn"))

    // capture every plan the serving jobs execute (entry + hops run as
    // driver collects), then quiesce the async listener bus
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val ql = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit = plans.add(qe.executedPlan.toString)
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    val stats = new HnswGraph.SearchStats
    spark.listenerManager.register(ql)
    val pruned =
      try {
        val r = HnswGraph.search(adj, e, qs2, stats = Some(stats),
          ptMod = ptMod, serving = true).collect()
        var rounds = 0
        var settled = false
        while (!settled && rounds < 50) {
          val snap = plans.size()
          Thread.sleep(200)
          settled = plans.size() == snap
          rounds += 1
        }
        r
      } finally spark.listenerManager.unregister(ql)

    // 1. STRUCTURE: a hop scan carries a STATIC pt partition filter,
    // and no serving job shuffles DATA (BroadcastExchange is the fused
    // jobs' mechanism; SinglePartition is the stats-only count()'s
    // scalar gather — neither moves row data by key)
    import scala.jdk.CollectionConverters._
    val hopPlans = plans.asScala.filter(_.contains("PartitionFilters"))
    assert(hopPlans.exists(p =>
      p.contains("pt#") && (p.contains("INSET") || p.contains(" IN ("))),
      "no hop scan carried a static pt IN (...) partition filter:\n" +
        hopPlans.take(2).mkString("\n---\n"))
    val shuffling = plans.asScala.filter(p =>
      p.linesIterator.exists(l => l.contains("Exchange") &&
        !l.contains("BroadcastExchange") &&
        !l.contains("SinglePartition")))
    assert(shuffling.isEmpty,
      s"a serving job shuffled:\n${shuffling.headOption.getOrElse("")}")

    // 2. VOLUME: per-hop adjacency reads bounded by the frontier's
    // partition fraction. Entry frontier = efUpper·|Q| = 16 nodes →
    // ≤ 16/256 of the table (+ slack for partition-size skew); later
    // frontiers ≤ ef0·|Q| = 128 nodes → ≤ 128/256 (+ slack). The r10
    // layout read l0Rows for every one of these.
    val reads = stats.hopAdjRead.reverse // recorded LIFO
    assert(reads.nonEmpty)
    assert(reads.head <= (l0Rows * 0.15).toLong,
      s"first hop read ${reads.head} of $l0Rows layer-0 rows — the " +
        "entry-width prune is gone")
    assert(reads.forall(_ <= (l0Rows * 0.62).toLong),
      s"some hop read more than the frontier fraction admits: $reads " +
        s"of $l0Rows")
    assert(reads.sum < (l0Rows.toDouble * reads.size * 0.55).toLong,
      s"total hop reads ${reads.sum} not below 55% of the unpruned " +
        s"${l0Rows * reads.size}")

    // 3. SEMANTICS: identical answers to the unpruned batch path
    def key(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    val unpruned = HnswGraph.search(adj, e, qs2).collect()
    assert(key(pruned) === key(unpruned))

    // 4. REPLAY: byte-identical duplicate corpus rows (a replayed
    // ingest batch before its compact) change neither path's answer
    val dupIds = Seq(9L, 77L, 1332L, 4001L)
    val eDup = e.unionByName(e.where(col("vec_id").isin(dupIds: _*)))
    val servedDup = HnswGraph.search(adj, eDup, qs2,
      ptMod = ptMod, serving = true).collect()
    val batchDup = HnswGraph.search(adj, eDup, qs2).collect()
    assert(key(servedDup) === key(pruned),
      "replayed corpus rows changed the driver-beam answer")
    assert(key(batchDup) === key(unpruned),
      "replayed corpus rows changed the batch answer")

    // EDGE: an empty serving micro-batch (a trigger with no queries)
    // returns an empty frame with the result schema on both paths —
    // no exception, no degenerate plan
    val emptyQs = qs2.where(lit(false))
    val servedEmpty = HnswGraph.search(adj, e, emptyQs,
      ptMod = ptMod, serving = true)
    assert(servedEmpty.columns.toSeq === Seq("q", "rk", "nb", "sim"))
    assert(servedEmpty.count() === 0)
    assert(HnswGraph.search(adj, e, emptyQs).count() === 0)

    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    e.unpersist()
  }

  test("the driver beam refuses an unbounded-degree expansion loudly " +
      "instead of broadcasting a corpus-sized local relation") {
    import spark.implicits._
    // a degenerate hand-built adjacency: one hub node with 2000
    // out-edges — past the frontier·1024 bound no prune-built graph
    // can reach (build caps layer-0 degree at 2m). The landing set is
    // the node-0 fallback alone (no layer-≥1 rows), so hop 1 expands
    // the hub directly.
    val n = 2001L
    val e = spark.range(n).map(i => graft.ScaleData.emb(i))
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val adj = spark.range(1, n)
      .select(lit(0L).as("src"), col("id").as("dst"),
        lit(0).as("layer"), lit(0.5d).as("sim"))
    val qs = e.where(col("vec_id") === 7L)
      .select(col("vec_id").as("q"), col("v").as("qv"),
        col("nrm").as("qn"))
    val ex = intercept[IllegalArgumentException] {
      HnswGraph.search(adj, e, qs, serving = true).collect()
    }
    assert(ex.getMessage.contains("expansion exploded"),
      s"wrong failure: ${ex.getMessage}")
  }

  test("serving accepts non-integral query ids (the r12 advice: the " +
      "final self-exclusion must not asLong the q side)") {
    import spark.implicits._
    val n = 500L
    val e = spark.range(n).map(i => graft.ScaleData.emb(i))
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val cells = HnswGraph.signCells(e, HnswGraph.bitsFor(n))
    val adj = HnswGraph.build(e, cells, m = HnswGraph.mFor(n),
      stride = HnswGraph.strideFor(n))
    // external query ids (a caller's request keys, not corpus vec_ids)
    val qs = e.where(col("vec_id").isin(3L, 42L))
      .select(concat(lit("req-"), col("vec_id")).as("q"),
        col("v").as("qv"), col("nrm").as("qn"))
    val served = HnswGraph.search(adj, e, qs, serving = true).collect()
    assert(served.map(_.getString(0)).toSet === Set("req-3", "req-42"))
    // an external id never matches a corpus node, so no self-exclusion:
    // full k rows per query
    assert(served.count(_.getString(0) == "req-3") === 5)
  }
}
