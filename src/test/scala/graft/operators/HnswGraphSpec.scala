package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions.{dot, toDouble}

class HnswGraphSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def embeddings: DataFrame =
    graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))

  test("mFor: +5 per corpus doubling above 16 Ki, step doubling past " +
      "the 5th doubling (the r15-measured break), exact at the " +
      "boundaries the SQL oracle derives with power(2,x)") {
    assert(HnswGraph.mFor(1L) === 16)
    assert(HnswGraph.mFor(500L) === 16)      // sf0.01 — oracle-checked
    assert(HnswGraph.mFor(16384L) === 16)    // boundary stays base
    assert(HnswGraph.mFor(16385L) === 21)    // first doubling step
    assert(HnswGraph.mFor(20000L) === 21)    // x10 CI gate corpus
    assert(HnswGraph.mFor(32768L) === 21)
    assert(HnswGraph.mFor(32769L) === 26)
    assert(HnswGraph.mFor(60000L) === 26)    // x30 sweep corpus
    assert(HnswGraph.mFor(200000L) === 36)   // x100 sweep corpus
    // flat-step tail ends at b=5: every standing graph ≤ 524 Ki keeps
    // its degree across the r15 law change by construction
    assert(HnswGraph.mFor(524288L) === 41)
    // b=6: m=46 (flat) MEASURED 0.8818 < the 0.9 floor at 600k; the
    // doubled step's 51 measured 0.9081 (SCALING_r15 degree_law_probe)
    assert(HnswGraph.mFor(524289L) === 51)
    assert(HnswGraph.mFor(600000L) === 51)   // x300 probe corpus
    assert(HnswGraph.mFor(1048577L) === 61)  // b=7: +10/doubling tail
    assert(HnswGraph.mFor(1L << 30) === 151) // the 1 B scaladoc claim
  }

  test("slicesFor: 1 slice until the pool passes the per-slice pair " +
      "bound, 7 at the x300 geometry, LOUD past the 64-slice cap") {
    assert(HnswGraph.slicesFor(500L, 16) === 1)     // sf0.01
    assert(HnswGraph.slicesFor(20000L, 21) === 1)   // x10 CI gate
    assert(HnswGraph.slicesFor(200000L, 36) === 2)  // x100 sweep
    assert(HnswGraph.slicesFor(600000L, 46) === 7)  // x300 r14 probe
    assert(HnswGraph.slicesFor(600000L, 51) === 8)  // x300 law degree
    // just under the cap still derives (64·PoolPairsPerSlice pairs)
    val mCap = 96
    val nAtCap = 64L * HnswGraph.PoolPairsPerSlice /
      ((2L * mCap) * (2L * mCap))
    assert(HnswGraph.slicesFor(nAtCap, mCap) === 64)
    // past the cap the per-slice pair bound would silently erode —
    // r13 verdict missing #4: fail with instructions, not a disk
    // overrun ~10× the x300 geometry later
    val ex = intercept[IllegalArgumentException] {
      HnswGraph.slicesFor(1L << 30, mCap)
    }
    assert(ex.getMessage.contains("PoolPairsPerSlice"))
  }

  test("sliced NN-descent is bit-identical to the single-job build: " +
      "a src's pool sees the same candidates either way") {
    val e = embeddings.persist()
    val cells = HnswGraph.signCells(e, HnswGraph.bitsFor(e.count()))
      .persist()
    val one = HnswGraph.build(e, cells, m = 6, slices = 1)
      .select(col("layer"), col("src"), col("dst"))
    val four = HnswGraph.build(e, cells, m = 6, slices = 4)
      .select(col("layer"), col("src"), col("dst"))
    assert(one.count() === four.count())
    assert(one.exceptAll(four).count() === 0L)
    assert(four.exceptAll(one).count() === 0L)
    e.unpersist(); cells.unpersist()
  }

  test("graph shape: layered, m-bounded out-degree, nested levels") {
    val out = graft.queries.LlmQueries.s11AnnHnsw(spark, dir)
    assert(out.count() > 0) // builds + persists the graph as a side effect
    val adj = spark.table("s11_hnsw_graph")
    val deg = adj.groupBy(col("layer"), col("src"))
      .agg(count(lit(1)).as("d"))
      .agg(max(col("d"))).head().getLong(0)
    assert(deg <= 2 * HnswGraph.DefaultM,
      "out-degree exceeds 2m (m forward + reverse links)")
    // a node on layer l must satisfy the deterministic level rule
    // (stride 8 at this corpus size per strideFor)
    assert(HnswGraph.strideFor(embeddings.count()) === 8L)
    val bad1 = adj.where(col("layer") === 1 && col("src") % 8 =!= 0).count()
    val bad2 = adj.where(col("layer") === 2 && col("src") % 64 =!= 0).count()
    assert(bad1 === 0 && bad2 === 0)
    // upper layers geometrically smaller than layer 0
    val sizes = adj.groupBy(col("layer"))
      .agg(countDistinct(col("src")).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes(2) < sizes(1) && sizes(1) < sizes(0))
  }

  test("beam search recall vs the s01 brute-force answer stays above " +
      "the pinned floor") {
    val e = embeddings
    val ann = graft.queries.LlmQueries.s11AnnHnsw(spark, dir)
      .select(col("q"), col("nb"))
    // brute top-5 for the same probe set (every 7th vector)
    val qs = e.where(col("vec_id") % 7 === 0)
      .select(col("vec_id").as("q"), col("v").as("qv"),
        col("nrm").as("qn"))
    val scored = qs.join(e, col("vec_id") =!= col("q"))
      .select(col("q"), col("vec_id").as("nb"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6)
          .as("sim"))
    val w = Window.partitionBy(col("q"))
      .orderBy(col("sim").desc, col("nb"))
    val brute = scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= 5).select(col("q"), col("nb"))
    val nQ = qs.count()
    val hits = ann.intersect(brute).count()
    val recall = hits.toDouble / (5.0 * nQ)
    // a fixed-schedule beam over an m=6 graph is not exact by design —
    // the floor pins the structure keeps working (s01 is the accuracy
    // baseline, like s03/s04). Raised 0.5 → 0.6 with the r8 bidirectional
    // + pruned graph, then 0.6 → 0.9 with the r9 schedule (ef0 48,
    // 4 layer-0 hops — the HnswSweep-measured knee; observed 0.942).
    assert(recall >= 0.9, f"recall@5 $recall%.3f below floor")
  }

  test("search results are deterministic across runs") {
    val a = graft.queries.LlmQueries.s11AnnHnsw(spark, dir).collect()
    val b = graft.queries.LlmQueries.s11AnnHnsw(spark, dir).collect()
    assert(a.toSeq === b.toSeq)
  }

  private def parquetFiles(table: String): Seq[String] = {
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table)).location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the (layer, pt)-partitioned layout nests files two dirs deep
    def walk(p: org.apache.hadoop.fs.Path): Seq[String] =
      fs.listStatus(p).toSeq.flatMap {
        case d if d.isDirectory => walk(d.getPath)
        case f => Seq(f.getPath.toString)
      }
    walk(loc).filter(_.endsWith(".parquet"))
  }

  test("append links within-batch delta nodes, bounds reverse-edge " +
      "growth to m per standing node, and compact restores the " +
      "one-file-per-bucket layout + the 2m degree invariant") {
    import spark.implicits._
    val m = 6
    val e = embeddings
    val n = e.count()
    val stride = HnswGraph.strideFor(n)
    val table = "hnsw_maint_spec"
    // a previous JVM's warehouse dir survives the fresh catalog —
    // DROP TABLE alone leaves an orphan location
    SnapshotMerge.dropTableAndLocation(spark, table)
    val cells0 = HnswGraph.signCells(e, HnswGraph.bitsFor(n))
    HnswGraph.writeGraph(
      HnswGraph.build(e, cells0, m = m, stride = stride), table, n)
    val files0 = parquetFiles(table).size
    val degBefore = spark.table(table)
      .where(col("layer") === 0 && col("src") === 5L).count()
    // delta: m+3 near-copies of standing vector 5 in ONE batch — every
    // one of them will want node 5 (sim ≈ 1) and each other
    val v5 = e.where(col("vec_id") === 5L)
      .select(col("v")).as[Seq[Double]].head()
    val delta = (0 until m + 3).map { j =>
      (200001L + j, v5.updated(j % v5.size, v5(j % v5.size) + 1e-4 * (j + 1)))
    }.toDF("vec_id", "v")
      .withColumn("nrm",
        sqrt(graft.functions.TextFunctions.dot(col("v"), col("v"))))
    val union = e.unionByName(delta)
    val cells = HnswGraph.signCells(union, HnswGraph.bitsFor(n))
    HnswGraph.append(table, e, delta, cells, m = m, stride = stride)
    val adj = spark.table(table)
    // within-batch linking: the first delta node's forward edges include
    // a SAME-BATCH sibling (they are each other's nearest neighbors)
    val fwdOf0 = adj.where(col("layer") === 0 && col("src") === 200001L)
      .select(col("dst")).as[Long].collect().toSet
    assert(fwdOf0.exists(_ >= 200001L),
      s"delta node links to no same-batch sibling: $fwdOf0")
    // reverse growth bounded: node 5 gained at most m out-edges from
    // m+3 admirers (the per-batch reverse prune)
    val degAfter = adj
      .where(col("layer") === 0 && col("src") === 5L).count()
    assert(degAfter - degBefore <= m,
      s"reverse edges unpruned: $degBefore -> $degAfter")
    assert(parquetFiles(table).size > files0,
      "append should add per-partition delta files")
    // compact: rebuild from the current corpus under the commit
    // protocol. File count after ≠ before in general — the corpus
    // grew, so more (layer, pt) partitions may be populated — but
    // every partition must be back to ONE file.
    val epoch = HnswGraph.compact(table, union, cells, m = m,
      stride = stride)
    assert(epoch >= 1)
    assert(CompactPolicy.maxFilesPerBucket(spark, table) === 1,
      "compact must restore one file per partition")
    val maxDeg = spark.table(table).groupBy(col("layer"), col("src"))
      .agg(count(lit(1)).as("d")).agg(max(col("d"))).head().getLong(0)
    assert(maxDeg <= 2 * m, "compact must restore the M_max prune")
    // parity: the compacted table IS the batch construction over the
    // current corpus
    val fresh = HnswGraph.build(union, cells, m = m, stride = stride)
    assert(spark.table(table).select("layer", "src", "dst")
      .exceptAll(fresh).count() === 0)
    assert(fresh.exceptAll(
      spark.table(table).select("layer", "src", "dst")).count() === 0)
  }

  test("appendWithMembership: identical edges to the corpus-frame " +
      "append, probing only the delta's membership partitions (DPP)") {
    import spark.implicits._
    val m = 6
    val e = embeddings
    val n = e.count()
    val stride = HnswGraph.strideFor(n)
    val cells0 = HnswGraph.signCells(e, HnswGraph.bitsFor(n))
    val graph = HnswGraph.build(e, cells0, m = m, stride = stride)
      .persist()
    graph.count()
    val tA = "hnsw_memb_a"
    val tB = "hnsw_memb_b"
    for (t <- Seq(tA, tB)) {
      SnapshotMerge.dropTableAndLocation(spark, t)
      SnapshotMerge.dropTableAndLocation(spark, HnswGraph.membTable(t))
      SnapshotMerge.dropTableAndLocation(spark, HnswGraph.upperTable(t))
      SnapshotMerge.dropTableAndLocation(spark, HnswGraph.dirsTable(t))
      HnswGraph.writeGraph(graph, t, n)
    }
    HnswGraph.writeMembership(e, cells0, tB, n)
    val v5 = e.where(col("vec_id") === 5L)
      .select(col("v")).as[Seq[Double]].head()
    val delta = (0 until 5).map { j =>
      (400001L + j, v5.updated(j % v5.size, v5(j % v5.size) + 1e-4 * (j + 1)))
    }.toDF("vec_id", "v")
      .withColumn("nrm",
        sqrt(graft.functions.TextFunctions.dot(col("v"), col("v"))))
    // path A: the corpus-frame append (cells over corpus ∪ delta)
    val cellsA = HnswGraph.signCells(e.unionByName(delta),
      HnswGraph.bitsFor(n))
    HnswGraph.append(tA, e, delta, cellsA, m = m, stride = stride)
    // path B: satellites only — capture executed plans for the DPP pin
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val ql = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit = plans.add(qe.executedPlan.toString)
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          ex: Exception): Unit = ()
    }
    spark.listenerManager.register(ql)
    try {
      HnswGraph.appendWithMembership(tB, delta, m = m, stride = stride)
      var rounds = 0
      var settled = false
      while (!settled && rounds < 50) {
        val snap = plans.size()
        Thread.sleep(200)
        settled = plans.size() == snap
        rounds += 1
      }
    } finally spark.listenerManager.unregister(ql)
    // edge parity: the two paths derive the identical delta linkage
    val a = spark.table(tA).select("layer", "src", "dst")
    val b = spark.table(tB).select("layer", "src", "dst")
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0,
      "membership-path edges differ from the corpus-frame append's")
    // the membership probe pruned partitions dynamically
    import scala.jdk.CollectionConverters._
    assert(plans.asScala.exists(p => p.contains("dynamicpruning") &&
        p.contains("mb")),
      "no executed plan carried a dynamicpruning filter on the " +
        "membership partitions")
    // satellites absorbed the delta: a second batch probing the same
    // region sees the first batch's vectors as standing members
    val memb = spark.table(HnswGraph.membTable(tB))
    assert(memb.where(col("vec_id") >= 400001L).count() > 0)
    graph.unpersist()
    for (t <- Seq(tA, tB, HnswGraph.membTable(tB),
        HnswGraph.upperTable(tB), HnswGraph.dirsTable(tB)))
      spark.sql(s"DROP TABLE IF EXISTS `$t`")
  }

  test("a corpus too small for layer-1 edges still searches (node-0 " +
      "landing fallback): exact answers on a 10-vector graph") {
    import spark.implicits._
    val e = (0L until 10L).map { i =>
      (i, Seq(1.0 + i % 3, 2.0 + i % 4, 1.0 + i % 5, i.toDouble))
    }.toDF("vec_id", "v")
      .withColumn("nrm",
        sqrt(graft.functions.TextFunctions.dot(col("v"), col("v"))))
    val cells = HnswGraph.signCells(e, 3)
    val adj = HnswGraph.build(e, cells, m = 4, stride = 8L)
    // stride 8 over 10 ids → layer-1 members {0, 8} but it is the
    // FALLBACK that must make this non-empty even when upper layers
    // carry no edges at all
    val qs = e.select(col("vec_id").as("q"), col("v").as("qv"),
      col("nrm").as("qn"))
    val res = HnswGraph.search(adj, e, qs, k = 3)
    assert(res.groupBy(col("q")).count().count() === 10,
      "every query must get results on a tiny corpus")
    // 6 hops at beam 64 fully explore a 10-node graph → exact top-3
    val w = Window.partitionBy(col("q")).orderBy(col("sim").desc, col("nb"))
    val brute = qs.join(e, col("vec_id") =!= col("q"))
      .select(col("q"), col("vec_id").as("nb"),
        round(graft.functions.TextFunctions.dot(col("qv"), col("v")) /
          (col("qn") * col("nrm")), 6).as("sim"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3).select(col("q"), col("nb"))
    assert(res.select(col("q"), col("nb")).exceptAll(brute).count() === 0)
  }

  test("staleness bound: recall over the grown corpus after 3 appends " +
      "without rebuild stays above the floor, and compact restores it") {
    import spark.implicits._
    val e = embeddings
    val n = e.count()
    val stride = HnswGraph.strideFor(n)
    val m = HnswGraph.DefaultM
    val table = "hnsw_stale_spec"
    SnapshotMerge.dropTableAndLocation(spark, table)
    val cells0 = HnswGraph.signCells(e, HnswGraph.bitsFor(n))
    HnswGraph.writeGraph(
      HnswGraph.build(e, cells0, m = m, stride = stride), table, n)
    // three append batches of near-dup deltas (the re-crawl shape):
    // each delta is a 1e-4-perturbed copy of a standing vector — the
    // adversarial case for staleness, because delta reverse edges
    // crowd exactly the standing nodes queries want
    var corpus = e
    for (b <- 0 until 3) {
      val srcIds = (0 until 15).map(j => (b * 37 + j * 11) % n)
      val deltaRows = corpus.where(col("vec_id").isin(srcIds.map(Long.box): _*))
        .where(col("vec_id") < n) // perturb standing originals only
        .select(col("vec_id"), col("v")).as[(Long, Seq[Double])]
        .collect().map { case (id, v) =>
          (300000L + b * 1000L + id, v.updated((id % v.size).toInt,
            v((id % v.size).toInt) + 1e-4 * (b + 1)))
        }.toSeq
      val delta = deltaRows.toDF("vec_id", "v")
        .withColumn("nrm",
          sqrt(graft.functions.TextFunctions.dot(col("v"), col("v"))))
      val union = corpus.unionByName(delta)
      val cells = HnswGraph.signCells(union, HnswGraph.bitsFor(n))
      HnswGraph.append(table, corpus, delta, cells, m = m, stride = stride)
      corpus = union
    }
    corpus = corpus.persist()
    // recall of the ORIGINAL probe set over the GROWN corpus, on the
    // stale (append-only) graph
    def recallNow(): Double = {
      val qs = corpus.where(col("vec_id") % 7 === 0 && col("vec_id") < n)
        .select(col("vec_id").as("q"), col("v").as("qv"),
          col("nrm").as("qn"))
      val nQ = qs.count()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q")).orderBy(col("sim").desc, col("nb"))
      val brute = qs.join(corpus, col("vec_id") =!= col("q"))
        .select(col("q"), col("vec_id").as("nb"),
          round(graft.functions.TextFunctions.dot(col("qv"), col("v")) /
            (col("qn") * col("nrm")), 6).as("sim"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 5).select(col("q"), col("nb"))
      val ann = HnswGraph.search(spark.table(table), corpus, qs)
        .select(col("q"), col("nb"))
      ann.intersect(brute).count().toDouble / (5.0 * nQ)
    }
    val stale = recallNow()
    info(f"recall after 3 appends, no rebuild: $stale%.3f")
    // the documented degradation-until-rebuild bound: appended
    // near-dups legitimately ENTER the true top-5, and the append-only
    // graph still finds the grown corpus's answers above this floor
    assert(stale >= 0.8, f"stale-graph recall $stale%.3f below bound")
    // compact = full rebuild over the grown corpus → full-recall floor
    val cells = HnswGraph.signCells(corpus, HnswGraph.bitsFor(n))
    HnswGraph.compact(table, corpus, cells, m = m, stride = stride)
    val fresh = recallNow()
    info(f"recall after compact: $fresh%.3f")
    assert(fresh >= 0.9, f"compacted recall $fresh%.3f below floor")
    corpus.unpersist()
  }

  test("append: delta vectors join the standing graph and become " +
      "findable; standing edges are untouched") {
    import spark.implicits._
    graft.queries.LlmQueries.s11AnnHnsw(spark, dir).collect() // build
    val e = embeddings
    val before = spark.table("s11_hnsw_graph").collect().toSet
    // delta: near-copies of three standing vectors, at fresh ids that
    // stay on layer 0 (not ≡ 0 mod 8)
    val srcIds = Seq(5L, 17L, 41L)
    val deltaRows = e.where(col("vec_id").isin(srcIds: _*))
      .select(col("vec_id"), col("v")).as[(Long, Seq[Double])]
      .collect().map { case (id, v) =>
        (100001L + id, v.updated(0, v.head + 1e-4))
      }.toSeq
    val delta = deltaRows.toDF("vec_id", "v")
      .select(col("vec_id"), col("v"))
      .withColumn("nrm",
        sqrt(graft.functions.TextFunctions.dot(col("v"), col("v"))))
    // the s11 cell rule over corpus ∪ delta: sign buckets sized by the
    // CORPUS the standing graph was built from (the build-time params
    // the append must share)
    val union = e.unionByName(delta)
    val cells = HnswGraph.signCells(union,
      HnswGraph.bitsFor(e.count()))
    val epoch = HnswGraph.append("s11_hnsw_graph", e, delta, cells,
      stride = HnswGraph.strideFor(e.count()))
    assert(epoch >= 1)
    val after = spark.table("s11_hnsw_graph").collect().toSet
    assert(before.subsetOf(after), "append must not rewrite standing edges")
    // every delta node has forward edges and at least one reverse edge
    // (reachability precondition)
    val adj = spark.table("s11_hnsw_graph")
    deltaRows.foreach { case (id, _) =>
      assert(adj.where(col("src") === id).count() > 0, s"no fwd for $id")
      assert(adj.where(col("dst") === id).count() > 0, s"no rev for $id")
    }
    // querying AT each original vector now surfaces its near-copy
    val qs = e.where(col("vec_id").isin(srcIds: _*))
      .select(col("vec_id").as("q"), col("v").as("qv"),
        col("nrm").as("qn"))
    val res = HnswGraph.search(adj, union, qs).collect()
      .groupBy(_.getLong(0)).map { case (q, rows) =>
        q -> rows.map(_.getLong(2)).toSet }
    srcIds.foreach { id =>
      assert(res(id).contains(100001L + id),
        s"near-copy of $id not found: ${res(id)}")
    }
  }
}
