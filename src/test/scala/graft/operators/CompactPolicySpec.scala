package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[CompactPolicy]]: the files-per-bucket reading on both standing
  * index layouts, and the CLI's `--max-files` gate (the scriptable form
  * of the streaming ingest paths' auto-compact; the mid-stream firing
  * itself is pinned by `StreamingSoakSpec`). */
class CompactPolicySpec extends SparkSpec {

  test("flat bucketed layout: counts files sharing a bucket id; " +
      "appends raise the reading, one-file-per-bucket reads 1") {
    import spark.implicits._
    val t = "policy_bucketed_spec"
    SnapshotMerge.dropTableAndLocation(spark, t)
    val df = (0L until 64L).map(i => (i, i % 7)).toDF("k", "v")
    BucketedLayout.writeBucketed(df, t, "k", 4)
    assert(CompactPolicy.maxFilesPerBucket(spark, t) === 1)
    assert(!CompactPolicy.shouldCompact(spark, t, 2))
    // two appends in the bucketed writer's own layout → 3 files in
    // every touched bucket
    for (_ <- 0 until 2)
      df.repartition(4, col("k")).write.mode("append")
        .bucketBy(4, "k").sortBy("k").format("parquet").saveAsTable(t)
    assert(CompactPolicy.maxFilesPerBucket(spark, t) === 3)
    assert(CompactPolicy.shouldCompact(spark, t, 2))
    spark.sql(s"DROP TABLE IF EXISTS `$t`")
  }

  test("partitioned (inverted-list) layout: counts files per cid= " +
      "directory") {
    import spark.implicits._
    val t = "policy_lists_spec"
    SnapshotMerge.dropTableAndLocation(spark, t)
    val assigned = (0L until 40L)
      .map(i => (i, Seq(1.0, 2.0), 1.0, i % 4)).toDF("vec_id", "v", "nrm", "cid")
    IvfIndex.write(assigned, t)
    assert(CompactPolicy.maxFilesPerBucket(spark, t) === 1)
    // an append touching only cid=0 raises exactly that list
    IvfIndex.append(
      Seq((100L, Seq(3.0, 4.0), 5.0, 0L)).toDF("vec_id", "v", "nrm", "cid"), t)
    assert(CompactPolicy.maxFilesPerBucket(spark, t) === 2)
    assert(CompactPolicy.shouldCompact(spark, t, 1))
    assert(!CompactPolicy.shouldCompact(spark, t, 2))
    spark.sql(s"DROP TABLE IF EXISTS `$t`")
  }

  test("CLI table-compact --max-files: within policy is a no-op " +
      "(epoch unchanged), exceeding rebuilds") {
    import spark.implicits._
    val t = "policy_cli_spec"
    SnapshotMerge.dropTableAndLocation(spark, t)
    graft.operators.TableCommit.reset(spark, t)
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"),
        graft.functions.TextFunctions.toDouble(col("embedding")).as("v"))
      .withColumn("nrm",
        sqrt(graft.functions.TextFunctions.dot(col("v"), col("v"))))
    val n = e.count()
    val cells = HnswGraph.signCells(e, HnswGraph.bitsFor(n))
    BucketedLayout.writeBucketed(
      HnswGraph.build(e, cells, m = HnswGraph.mFor(n),
        stride = HnswGraph.strideFor(n)), t, "src", 8)
    val epoch0 = TableCommit.epochOf(spark, t)
    // within policy → the CLI must not touch the table. Cli.run, not
    // Cli.main: main owns (and STOPS) its session, which would kill
    // the suite-shared SparkContext for every later suite
    graft.Cli.run(spark, Array("table-compact",
      "--in", "/root/testdata/sf0.001", "--table", t,
      "--max-files", "99"))
    assert(TableCommit.epochOf(spark, t) === epoch0)
    assert(CompactPolicy.maxFilesPerBucket(spark, t) === 1)
    // exceeding (any bucket has ≥ 1 > 0 files) → rebuild commits an epoch
    graft.Cli.run(spark, Array("table-compact",
      "--in", "/root/testdata/sf0.001", "--table", t,
      "--max-files", "0"))
    assert(TableCommit.epochOf(spark, t) === epoch0 + 1)
    assert(CompactPolicy.maxFilesPerBucket(spark, t) === 1)
    // standing membership satellites must be REBUILT by a CLI compact
    // (the r11 advice's finding: a compact that leaves them derived
    // from the pre-compact corpus makes later appendWithMembership
    // batches link with stale cells/stride — silent quality loss).
    // Seed deliberately-stale satellites (half the corpus), compact,
    // and require the rebuild to cover the full corpus again.
    val half = e.where(col("vec_id") % 2 === 0)
    HnswGraph.writeMembership(half,
      HnswGraph.signCells(half, HnswGraph.bitsFor(n)), t, n)
    val membBefore = spark.table(HnswGraph.membTable(t)).count()
    assert(membBefore < 2 * n, "stale seed must under-cover the corpus")
    graft.Cli.run(spark, Array("table-compact",
      "--in", "/root/testdata/sf0.001", "--table", t,
      "--max-files", "0"))
    spark.catalog.refreshTable(HnswGraph.membTable(t))
    assert(spark.table(HnswGraph.membTable(t)).count() === 2 * n,
      "CLI compact left the membership satellite stale")
    spark.sql(s"DROP TABLE IF EXISTS `$t`")
    Seq(HnswGraph.membTable(t), HnswGraph.upperTable(t),
      HnswGraph.dirsTable(t)).foreach(st =>
      SnapshotMerge.dropTableAndLocation(spark, st))
  }
}
