package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.epic.{EpicPipeline, ImageFixtures}

/** Physical-plan assertions: these are the properties that decide whether
  * the same code is still fast at 1000 executors / 100 TB, checked at the
  * plan level so a regression fails CI rather than a cluster. */
class PlanQualitySpec extends SparkSpec
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("Q01: filter and projection push into the parquet scan") {
    val plan = planOf(RelationalQueries.q01(spark, sf0001))
    assert(plan.contains("PushedFilters:"))
    assert(plan.contains("l_shipdate") && plan.contains("l_discount"))
    // pruned read schema: only the 5 referenced columns, not all 11
    assert(!plan.contains("l_comment") && !plan.contains("l_tax"))
  }

  test("Q02/Q03: dimension joins broadcast (no shuffle of the fact side)") {
    val p2 = planOf(RelationalQueries.q02(spark, sf0001))
    assert(p2.contains("BroadcastHashJoin") ||
      p2.contains("BroadcastExchange"))
    val p3 = planOf(RelationalQueries.q03(spark, sf0001))
    assert(p3.contains("BroadcastHashJoin"))
  }

  test("Q13: top-k plans as TakeOrderedAndProject, not a global sort") {
    val plan = planOf(RelationalQueries.q13(spark, sf0001))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("Q10: rank<=k filter pushes down as WindowGroupLimit") {
    // partial per-group top-k runs below the shuffle, so each group
    // buffers k rows instead of its full partition at 100 TB
    val plan = planOf(RelationalQueries.q10(spark, sf0001))
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("R02: rank<=k sample plans as WindowGroupLimit (per-partition top-k)") {
    val plan = planOf(LlmQueries.all("r02_topk_sample")(spark, sf0001))
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("R05: DSIR top-k bounds below the rank window; the ratio table " +
      "broadcasts") {
    val plan = planOf(LlmQueries.all("r05_dsir_select")(spark, sf0001))
    // the limit must reach below the rank window so the scored corpus is
    // never globally sorted: either WindowGroupLimit or (what Spark 4
    // actually plans here) LimitPushDownThroughWindow leaving a
    // TakeOrderedAndProject under the 100-row window
    assert(plan.contains("WindowGroupLimit") ||
      plan.contains("TakeOrderedAndProject"), plan)
    // the ≤4096-row frequency-ratio table joins broadcast
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("A02: KMV sketch partial-aggregates map-side (buffers cross the " +
      "shuffle, not rows)") {
    val plan = planOf(LlmQueries.all("a02_kmv_distinct")(spark, sf0001))
    val exchangeIdx = plan.indexOf("Exchange")
    val partialIdx = plan.indexOf("partial_kmvsketch")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"expected partial KMV aggregate under the shuffle:\n$plan")
  }

  test("P04: the quota table broadcasts (corpus never shuffles for it)") {
    val plan = planOf(LlmQueries.all("p04_data_mixture")(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }

  test("A03: CMS probe join is an equi-join, never a cartesian") {
    val plan = planOf(LlmQueries.all("a03_cms_freq")(spark, sf0001))
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("Q07: aggregation is partial (map-side combine before the shuffle)") {
    val plan = planOf(RelationalQueries.q07(spark, sf0001))
    assert(plan.contains("partial_min") || plan.contains("HashAggregate"))
    // partial agg must appear below the exchange
    val exchangeIdx = plan.indexOf("Exchange")
    val partialIdx = plan.indexOf("partial")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      "expected partial aggregate under the shuffle")
  }

  test("D03/D04/S02: candidate joins are equi-joins, never all-pairs") {
    // pin the FRESH plans: with stages session-cached the inspected tree
    // depends on which suite ran first (InMemoryTableScan vs the full
    // pipeline) — clear so this test always sees the real join shapes
    LlmQueries.clearStageCache()
    for (q <- Seq("d03_dedup_minhash_lsh", "d04_dedup_simhash",
        "s02_ann_lsh_topk", "d09_edit_distance")) {
      val plan = planOf(LlmQueries.all(q)(spark, sf0001))
      assert(!plan.contains("CartesianProduct"),
        s"$q plans a cartesian:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$q plans a nested-loop join:\n$plan")
    }
  }

  test("D07: eval fingerprint set broadcasts; overlap is an equi-join") {
    val plan = planOf(LlmQueries.all("d07_decontaminate")(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("T07/R01: per-row curation stages plan no shuffle before the sort") {
    // redaction is scan → project; sampling is scan → broadcast-join →
    // filter: in both, the ONLY Exchange allowed is the final
    // presentation ordering (rangepartitioning)
    for (q <- Seq("t07_pii_redact", "r01_stratified_sample")) {
      val plan = planOf(LlmQueries.all(q)(spark, sf0001))
      val shuffles = plan.linesIterator
        .filter(_.contains("Exchange"))
        .filterNot(_.contains("rangepartitioning"))
        .filterNot(_.contains("SinglePartition"))
        .filterNot(_.contains("BroadcastExchange")).toSeq
      assert(shuffles.isEmpty, s"$q shuffles:\n${shuffles.mkString("\n")}")
    }
  }

  test("D14: every window partitions by doc_id (islands are per-doc — " +
      "no global window); span membership is an equi-join") {
    val df = LlmQueries.all("d14_max_dup_segments")(spark, sf0001)
    df.collect()
    val windows = collectWithSubqueries(df.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"global window in d14:\n$w"))
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("S11: beam-search hops are equi-joins against the persisted graph " +
      "— never a cartesian or nested loop") {
    // run the query once so the bucketed graph table exists
    LlmQueries.all("s11_ann_hnsw")(spark, sf0001).collect()
    import graft.functions.TextFunctions.{dot, toDouble}
    val e = graft.Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val qs = e.where(col("vec_id") % 7 === 0)
      .select(col("vec_id").as("q"), col("v").as("qv"),
        col("nrm").as("qn"))
    val search = graft.operators.HnswGraph.search(
      spark.table("s11_hnsw_graph"), e, qs)
    val plan = planOf(search)
    assert(!plan.contains("CartesianProduct"), plan)
    // the ONLY nested-loop allowed is the ENTRY join: every query pairs
    // with the single constant entry node, and `node = lit(0)` constant-
    // folds the equi key away, leaving a bare 1-row-build BNLJ (the
    // filter vec_id=0 is pushed into the build side). Such a node prints
    // with NO join condition; a hop join degenerating to a nested loop
    // would carry one — so every BNLJ line must be the bare form
    plan.linesIterator.filter(_.contains("BroadcastNestedLoopJoin"))
      .foreach { l =>
        assert(l.replaceAll("^[:\\s+-]*", "")
          .matches("BroadcastNestedLoopJoin BuildRight, Inner\\s*"),
          s"conditioned nested-loop join (a degenerated hop?):\n$l\n$plan")
      }
    // construction: layer-0 candidates come from the coarse-cell
    // equi-join, never an all-pairs product (upper layers are the
    // documented geometrically-small exact joins)
    val cells = e.select(col("vec_id"), (col("vec_id") % 4).as("cid"))
    val build = graft.operators.HnswGraph.build(e, cells)
    assert(!planOf(build).contains("CartesianProduct"), planOf(build))
  }

  test("T19: the vocab-scale tokenizer fuses into the scan like t11 — " +
      "whole-stage codegen, no shuffle before the sort") {
    val df = LlmQueries.all("t19_bpe_vocab_scale")(spark, sf0001)
    df.collect() // AQE: codegen spans only print on the FINAL plan
    val plan = planOf(df)
    // codegen'd stages print with the "*(n)" star prefix in toString;
    // the encoder must not force the Project out of whole-stage codegen
    assert(plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("Project") && l.contains("bpecount")),
      s"t19's tokenizing Project left whole-stage codegen:\n$plan")
    val shuffles = plan.linesIterator
      .filter(_.contains("Exchange"))
      .filterNot(_.contains("rangepartitioning"))
      .filterNot(_.contains("SinglePartition"))
      .filterNot(_.contains("BroadcastExchange")).toSeq
    assert(shuffles.isEmpty, s"t19 shuffles:\n${shuffles.mkString("\n")}")
  }

  test("T17/T11: extraction and exact tokenization plan no shuffle " +
      "before the sort") {
    // both are per-row string/regex pipelines that must fuse into the
    // scan: the ONLY Exchange allowed is the presentation ordering
    for (q <- Seq("t17_html_extract", "t11_bpe_tokens")) {
      val plan = planOf(LlmQueries.all(q)(spark, sf0001))
      val shuffles = plan.linesIterator
        .filter(_.contains("Exchange"))
        .filterNot(_.contains("rangepartitioning"))
        .filterNot(_.contains("SinglePartition"))
        .filterNot(_.contains("BroadcastExchange")).toSeq
      assert(shuffles.isEmpty, s"$q shuffles:\n${shuffles.mkString("\n")}")
    }
  }

  test("P07: the shuffle position never windows over unpartitioned docs") {
    val df = LlmQueries.all("p07_corpus_shuffle")(spark, sf0001)
    df.collect()
    // same GlobalRank shape as P05: per-slice ranks window PARTITION BY
    // the slice; only the numPartitions-row offsets frame may run
    // unpartitioned
    val windows = collectWithSubqueries(df.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty)
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(w.child.output.map(_.name).contains("graft_n"),
        s"unpartitioned window outside the offsets frame:\n$w")
    }
  }

  test("P02: global prefix sum never windows over unpartitioned raw rows") {
    val plan = planOf(LlmQueries.all("p02_sequence_pack")(spark, sf0001))
    val winLines = plan.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    // two-level scan: exactly two windows, and the unpartitioned one
    // aggregates the per-block sums (see SequencePackerSpec for the
    // operator-level proof)
    assert(winLines.count(_.contains("windowspecdefinition")) === 2, plan)
    assert(winLines.exists(_.contains("graft_bsum")), plan)
  }

  test("P05: curriculum position never windows over unpartitioned docs") {
    val df = LlmQueries.all("p05_curriculum")(spark, sf0001)
    df.collect()
    // GlobalRank's shape: the per-slice rank windows PARTITION BY the
    // partition id; only the numPartitions-row offsets frame (graft_n)
    // may run unpartitioned (see GlobalRankSpec for the operator proof)
    val windows = collectWithSubqueries(df.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty)
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(w.child.output.map(_.name).contains("graft_n"),
        s"unpartitioned window outside the offsets frame:\n$w")
    }
  }

  test("D15: first-occurrence is a partial min-struct aggregate on the " +
      "segment fingerprint — never a window over the global segment " +
      "table, never a cartesian") {
    val plan = planOf(LlmQueries.all("d15_paragraph_dedup")(spark, sf0001))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    // the global-first-occurrence min(struct) must partial-agg below its
    // shuffle (mergeable buffers — the 100 TB shape); a Window here
    // would single-partition the exploded segment table
    val exchangeIdx = plan.indexOf("Exchange")
    val partialIdx = plan.indexOf("partial_min")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"expected partial min-struct under the shuffle:\n$plan")
    assert(!plan.contains("Window"),
      s"d15 must not window over the segment table:\n$plan")
  }

  test("D16: cluster rollup partial-aggregates; scoring joins are " +
      "equi-joins") {
    LlmQueries.clearStageCache()
    val plan = planOf(LlmQueries.all("d16_cluster_keep_best")(spark,
      sf0001))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    val exchangeIdx = plan.indexOf("Exchange")
    val partialIdx = plan.indexOf("partial_min")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"expected partial min-struct (argmax) under the shuffle:\n$plan")
  }

  test("D17/D18: centroids broadcast; the contamination check joins on " +
      "the cell id, never corpus × eval") {
    for (q <- Seq("d17_semantic_decontaminate", "d18_decontam_recall")) {
      val plan = planOf(LlmQueries.all(q)(spark, sf0001))
      // the K-row centroid pass (and d18's small eval side) broadcast;
      // the corpus-sized joins must never degenerate to a cartesian
      assert(plan.contains("BroadcastExchange"), s"$q:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$q:\n$plan")
    }
  }

  test("S03 IVF: centroids broadcast; list search is never a cartesian") {
    val plan = planOf(LlmQueries.all("s03_ann_ivf_topk")(spark, sf0001))
    // the K-row centroid scoring pass must broadcast (a K-bounded
    // nested-loop against a broadcast side is the intended IVF shape);
    // the probe→list search join must not degenerate to a cartesian
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("T16: the profile is one pass — no Expand, sketches partial-agg") {
    val plan = planOf(LlmQueries.all("t16_table_profile")(spark, sf0001))
    // a multi-column exact-distinct profile plans an Expand that
    // multiplies the scan by the column count; the KMV profile must not
    assert(!plan.contains("Expand"), plan)
    val exchangeIdx = plan.indexOf("Exchange")
    val partialIdx = plan.indexOf("partial_kmvsketch")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"expected partial KMV buffers under the shuffle:\n$plan")
  }

  test("S10: the probe join prunes index partitions at runtime (DPP)") {
    val df = LlmQueries.all("s10_ann_indexed")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the persisted-index scan must carry a dynamicpruning partition
    // filter fed by the probe side — at K lists/nProbe probed, the
    // non-probed lists are never read; without the filter every probe
    // batch full-scans the index
    assert(plan.contains("dynamicpruning"), plan)
    assert(!plan.contains("Cartesian"), plan)
  }

  test("S04 IVF-PQ: codebook broadcasts; ADC join is never a cartesian") {
    val plan = planOf(LlmQueries.all("s04_ann_ivfpq_topk")(spark, sf0001))
    // the M×16-row codebook and the K-row coarse centroids broadcast; the
    // probed-list ADC scoring must stay an equi-join on (cid, vec_id)
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("D12: span mining is one aggregation — no join anywhere, top-k " +
      "plans as TakeOrderedAndProject") {
    val plan = planOf(LlmQueries.all("d12_substring_spans")(spark, sf0001))
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // map-side partial aggregation below the one shuffle
    val exchangeIdx = plan.indexOf("Exchange")
    val partialIdx = plan.indexOf("partial")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"expected partial aggregate under the shuffle:\n$plan")
  }

  test("R03: the quota table broadcasts; the corpus never shuffles for it") {
    val plan = planOf(LlmQueries.all("r03_temperature_sample")(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("S07 SQ8: bounds row and candidate list broadcast; no cartesian") {
    val plan = planOf(LlmQueries.all("s07_ann_sq8_topk")(spark, sf0001))
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("EPIC ingest: watchlist broadcasts; pixel path has no shuffle") {
    val images = ImageFixtures.imagesBinaryDf(spark,
      Seq("2022-08-31T23:29:10.000000"))
    val (px, _) = EpicPipeline.pixelsAndMeta(images,
      ImageFixtures.watchlistDf(spark))
    val plan = planOf(px)
    assert(plan.contains("BroadcastExchange"))
    // the only exchanges allowed are broadcasts (watchlist + ephemeris
    // frame) and the distinct-timestamps subquery; the per-pixel dataflow
    // itself must be narrow
    val shuffles = plan.split("\n").count(l =>
      l.contains("Exchange hashpartitioning") ||
        l.contains("Exchange rangepartitioning"))
    assert(shuffles <= 1, s"unexpected shuffles in hot path:\n$plan")
  }

  test("EPIC ingest: image blob is pruned out of the metadata lineage") {
    val images = ImageFixtures.imagesBinaryDf(spark,
      Seq("2022-08-31T23:29:10.000000"))
    val (_, meta) = EpicPipeline.pixelsAndMeta(images,
      ImageFixtures.watchlistDf(spark))
    val analyzed = meta.queryExecution.optimizedPlan.toString
    // metadata derives pre-explode and must never touch the cube bytes
    assert(!analyzed.contains("patchgather") &&
      !analyzed.contains("stridedgather"))
  }

  test("EPIC ingest: exactly one gather per patch, behind a named fence") {
    val images = ImageFixtures.imagesBinaryDf(spark,
      Seq("2022-08-31T23:29:10.000000"))
    val (px, _) = EpicPipeline.pixelsAndMeta(images,
      ImageFixtures.watchlistDf(spark))
    val optimized = px.queryExecution.optimizedPlan.toString.toLowerCase
    // InferFiltersFromGenerate must not clone the gather into a filter
    // guard: one PatchGather in the whole plan, wrapped in the documented
    // OptimizerFence (not the old monotonically_increasing_id hack)
    val gathers = "patchgather".r.findAllIn(optimized).length
    assert(gathers == 1, s"expected exactly 1 gather, found $gathers:\n$optimized")
    assert(optimized.contains("optimizerfence"))
    assert(!optimized.contains("monotonically_increasing_id"))
  }

  test("D11: the signature snapshot joins bucket-for-bucket — no Exchange " +
      "ever touches the snapshot side") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"))
    graft.operators.IncrementalDedup.writeSnapshot(
      docs.where(col("doc_id") % 5 =!= 0), "d11_snapshot_spec")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // broadcast off: with it on, Spark broadcasts the small delta (also a
    // snapshot-stationary plan); the pin targets the at-scale fallback
    // where NEITHER side fits in memory and the bucketing must carry it
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val delta = docs.where(col("doc_id") % 5 === 0)
      val result = graft.operators.IncrementalDedup.dedupDelta(
        spark, delta, "d11_snapshot_spec")
      val plan = result.queryExecution.executedPlan
      // root→scan paths for every snapshot scan; on the segment between
      // each scan and its nearest ancestor JOIN there must be no exchange
      // of either kind — the 100 TB side is read bucket-for-bucket in
      // place (exchanges elsewhere, e.g. the final groupBy, are fine)
      def paths(p: SparkPlan, acc: List[SparkPlan]): Seq[List[SparkPlan]] =
        p match {
          case s: FileSourceScanExec
              if s.tableIdentifier.exists(_.table == "d11_snapshot_spec") =>
            Seq(acc :+ s)
          case other => other.children.flatMap(paths(_, acc :+ other))
        }
      val ps = paths(plan, Nil)
      assert(ps.nonEmpty, s"no snapshot scan found:\n$plan")
      ps.foreach { path =>
        val ji = path.lastIndexWhere(_.isInstanceOf[BaseJoinExec])
        val belowJoin = if (ji >= 0) path.drop(ji) else path
        assert(!belowJoin.exists(n => n.isInstanceOf[ShuffleExchangeExec] ||
            n.isInstanceOf[BroadcastExchangeExec]),
          s"snapshot side moves before its join:\n$plan")
      }
      assert(plan.toString.contains("Bucketed: true"),
        s"snapshot scan is not bucketed:\n$plan")
      // and the answer itself: every delta doc present exactly once
      assert(result.count() === delta.count())
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS d11_snapshot_spec")
    }
  }
}
