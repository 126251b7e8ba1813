package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions.{dot, toDouble}

/** The r11 serving-read story (the r10 verdict's top item): a search
  * over the (layer, pt)-partitioned standing graph must NOT re-scan the
  * full n·m adjacency per hop when the query batch is micro-batch-sized
  * — each hop prunes to the frontier's partitions, fed by the broadcast
  * frontier (DPP), the s10 pattern applied to the graph. Three pins:
  *
  *  1. STRUCTURE — some hop's executed plan carries a `dynamicpruning`
  *     partition filter on the adjacency scan (the hops execute inside
  *     search()'s eager checkpoints, so the plans are captured via a
  *     QueryExecutionListener, not from the returned frame).
  *  2. VOLUME — [[HnswGraph.SearchStats.hopAdjRead]] (adjacency rows
  *     under the frontier's partitions — what a pruned scan admits) is
  *     bounded by the frontier's partition fraction, with the first hop
  *     (entry width efUpper·|Q|) far below the full table. The r10
  *     layout read ALL layer-0 rows every hop whatever |Q|.
  *  3. SEMANTICS — pruned+serving results equal the unpruned search
  *     exactly (pt = src mod P is implied by the src equi-key; pruning
  *     changes the scan, never the answer).
  *
  * Corpus: 6k generated vectors ([[graft.ScaleData]], pure function of
  * id — machine-independent), big enough that ptFor gives a real
  * partition count (256) while the build stays spec-sized. The
  * x10/x30 serving fractions are measured by the scale probe
  * (SCALING_r11.json); this is the regression gate.
  */
class HnswPruneSpec extends SparkSpec {

  test("serving search DPP-prunes hops to the frontier's partitions " +
      "and answers exactly like the unpruned search") {
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
    val qs = e.where(col("vec_id").isin(71L, 1332L))
      .select(col("vec_id").as("q"), col("v").as("qv"),
        col("nrm").as("qn"))

    // capture every plan the hops execute (they run inside search()'s
    // eager checkpoints), then quiesce the async listener bus
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
        val r = HnswGraph.search(adj, e, qs, stats = Some(stats),
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

    // 1. STRUCTURE: a hop scan carries the DPP partition filter
    import scala.jdk.CollectionConverters._
    val hopPlans = plans.asScala.filter(_.contains("PartitionFilters"))
    assert(hopPlans.exists(_.contains("dynamicpruning")),
      "no hop scan carried a dynamicpruning partition filter:\n" +
        hopPlans.take(2).mkString("\n---\n"))

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

    // 3. SEMANTICS: identical answers with pruning off
    val unpruned = HnswGraph.search(adj, e, qs).collect()
    assert(pruned.map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSeq.sorted ===
      unpruned.map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .toSeq.sorted)

    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    e.unpersist()
  }
}
