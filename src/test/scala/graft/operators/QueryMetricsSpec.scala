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

  test("the graph build shuffles pair ids, never raw vectors") {
    // the defect class the r9 x30 probe caught in production: NN-descent
    // shuffling the 512-byte embedding vectors once per CANDIDATE PAIR
    // (x10→x30 measured 8.7×/3× with spill) instead of broadcasting the
    // vector table and shuffling two-long pair ids. Byte counters can't
    // pin this at spec scale — the wide intermediate is sorted by src,
    // so lz4 crushes the repeated vectors and bytes/record reads
    // pair-width in BOTH regimes (measured 10.8 vs 14.2 B/rec) — so the
    // pin is structural: across every job of the eager build, no
    // shuffle exchange may carry an array<double>/array<float> column
    // more than a constant number of times per corpus row (the 4n cap
    // admits the one benign co-shuffle, e ⋈ cells, which moves each
    // vector ONCE — a pair-width regression moves them n·(2m)² times).
    // Verified to fire: reverting scorePairs' broadcast() hints puts
    // `sv`/`v` exchanges in the audit and fails this test.
    // autoBroadcast is disabled during the measure: at spec scale Spark
    // would otherwise auto-broadcast the small vector table and mask a
    // removed hint (the explicit hint still wins over the conf).
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val e = graft.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
        .select(col("vec_id"),
          graft.functions.TextFunctions.toDouble(col("embedding")).as("v"))
        .withColumn("nrm",
          sqrt(graft.functions.TextFunctions.dot(col("v"), col("v"))))
        .persist()
      val n = e.count()
      val cells = HnswGraph.signCells(e, HnswGraph.bitsFor(n))
      val ((), cost, vectorShuffles) =
        QueryMetrics.auditVectorShuffles(spark, benignRecordCap = 4 * n) {
          HnswGraph.build(e, cells, m = HnswGraph.mFor(n),
            stride = HnswGraph.strideFor(n)).count()
          ()
        }
      e.unpersist()
      assert(vectorShuffles.isEmpty,
        "graph build shuffled raw vector columns — scorePairs lost " +
          s"its broadcast: ${vectorShuffles.mkString("; ")}")
      assert(cost.shuffleRecordsWritten > 0)
      val avg = cost.shuffleBytesWritten.toDouble / cost.shuffleRecordsWritten
      // measured 10.8 B/record across all build jobs with the broadcast
      // in place — the volume pin on top of the structural one
      assert(avg < 64.0,
        f"graph build shuffles $avg%.1f B/record — not pair-id width")
      assert(cost.spillBytes === 0, "sf0.01 graph build must not spill")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("append's delta-side broadcast: corpus vectors cross at most " +
      "ONE shuffle per micro-batch (the membership attach)") {
    import spark.implicits._
    // same masking concern as the build test: disable auto-broadcast so
    // only the explicit delta-side hints keep the plan vector-free
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val e = graft.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
        .select(col("vec_id"),
          graft.functions.TextFunctions.toDouble(col("embedding")).as("v"))
        .withColumn("nrm",
          sqrt(graft.functions.TextFunctions.dot(col("v"), col("v"))))
        .persist()
      val n = e.count()
      val table = "metrics_append_spec"
      SnapshotMerge.dropTableAndLocation(spark, table)
      val cells0 = HnswGraph.signCells(e, HnswGraph.bitsFor(n))
      HnswGraph.writeGraph(
        HnswGraph.build(e, cells0, m = HnswGraph.mFor(n),
          stride = HnswGraph.strideFor(n)), table, n)
      val v0 = e.where(col("vec_id") === 5L)
        .select(col("v")).as[Seq[Double]].head()
      val delta = (0 until 4).map { j =>
        (300001L + j, v0.updated(j % v0.size, v0(j % v0.size) + 1e-4))
      }.toDF("vec_id", "v")
        .withColumn("nrm",
          sqrt(graft.functions.TextFunctions.dot(col("v"), col("v"))))
      val union = e.unionByName(delta)
      val cells = HnswGraph.signCells(union, HnswGraph.bitsFor(n))
      // measured regimes at cap 0 (n=500, |delta|=4): WITH the
      // delta-side broadcast the only corpus-sized vector exchange is
      // the corpus ⋈ cells membership attach (500 recs = exactly one
      // pass); WITHOUT it, the cid equi-join additionally shuffles the
      // whole two-cells-per-vector union (1008 recs ≈ 2(n+Δ)). The
      // 1.2n cap sits between the regimes, so removing the hint fails
      // here (verified by hand in both directions). The one remaining
      // pass is append's NAMED per-batch scale bound — a cid-
      // partitioned membership table (the IvfIndex layout) is the
      // design that would remove it; BASELINE.md §r10 records it
      val ((), _, vectorShuffles) =
        QueryMetrics.auditVectorShuffles(spark,
            benignRecordCap = n + n / 5) {
          HnswGraph.append(table, e, delta, cells,
            m = HnswGraph.mFor(n), stride = HnswGraph.strideFor(n))
          ()
        }
      assert(vectorShuffles.isEmpty,
        "append re-shuffled corpus vectors beyond the one membership " +
          s"pass — the delta-side broadcast is gone: " +
          vectorShuffles.mkString("; "))
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
      e.unpersist()
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("appendWithMembership: vector-carrying exchanges are DELTA-" +
      "sized, not corpus-sized — the r10 1.2n membership-attach cap " +
      "tightens to o(n)") {
    import spark.implicits._
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val e = graft.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
        .select(col("vec_id"),
          graft.functions.TextFunctions.toDouble(col("embedding")).as("v"))
        .withColumn("nrm",
          sqrt(graft.functions.TextFunctions.dot(col("v"), col("v"))))
        .persist()
      val n = e.count()
      val table = "metrics_memb_spec"
      for (t <- Seq(table, HnswGraph.membTable(table),
          HnswGraph.upperTable(table), HnswGraph.dirsTable(table)))
        SnapshotMerge.dropTableAndLocation(spark, t)
      val cells0 = HnswGraph.signCells(e, HnswGraph.bitsFor(n))
      HnswGraph.writeGraph(
        HnswGraph.build(e, cells0, m = HnswGraph.mFor(n),
          stride = HnswGraph.strideFor(n)), table, n)
      HnswGraph.writeMembership(e, cells0, table, n)
      val v0 = e.where(col("vec_id") === 5L)
        .select(col("v")).as[Seq[Double]].head()
      val nDelta = 4
      val delta = (0 until nDelta).map { j =>
        (300001L + j, v0.updated(j % v0.size, v0(j % v0.size) + 1e-4))
      }.toDF("vec_id", "v")
        .withColumn("nrm",
          sqrt(graft.functions.TextFunctions.dot(col("v"), col("v"))))
      // the ONLY vector-carrying exchange is the delta's own satellite
      // repartition (2 membership rows per delta vector) — cap it at
      // 8·|delta|, three orders below append's n-row membership attach
      val ((), _, vectorShuffles) =
        QueryMetrics.auditVectorShuffles(spark,
            benignRecordCap = 8L * nDelta) {
          HnswGraph.appendWithMembership(table, delta,
            m = HnswGraph.mFor(n), stride = HnswGraph.strideFor(n))
          ()
        }
      assert(vectorShuffles.isEmpty,
        "membership append moved a corpus-scale vector exchange: " +
          vectorShuffles.mkString("; "))
      for (t <- Seq(table, HnswGraph.membTable(table),
          HnswGraph.upperTable(table), HnswGraph.dirsTable(table)))
        spark.sql(s"DROP TABLE IF EXISTS `$t`")
      e.unpersist()
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
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
