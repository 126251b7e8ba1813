package graft.operators

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import graft.SparkSpec

class TableCommitSpec extends SparkSpec {

  private def snapshot(table: String): Set[(Long, Long, String)] =
    spark.table(table).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  private def seed(table: String): Unit = {
    import spark.implicits._
    SnapshotMerge.writeSnapshot(
      Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("k", "version", "v"),
      table, "k", nBuckets = 2)
  }

  test("stale-base writer fails the epoch CAS; winner's delta survives") {
    import spark.implicits._
    seed("tc_cas")
    try {
      val e0 = TableCommit.epochOf(spark, "tc_cas")
      // writer A commits an update to k=1
      val eA = SnapshotMerge.mergeCommit(spark, "tc_cas",
        Seq((1L, 2L, "U", "a2")).toDF("k", "version", "op", "v"), "k", 2)
      assert(eA === e0 + 1)
      // writer B based its merge on e0 — replicate that by committing
      // with the stale base epoch directly
      val mergedB = SnapshotMerge.merge(spark, "tc_cas",
        Seq((2L, 2L, "U", "b2")).toDF("k", "version", "op", "v"), "k")
        .collect() // force the read before the failed commit
      val ex = intercept[TableCommit.ConcurrentWriteException] {
        TableCommit.commit(spark, "tc_cas", e0) {
          fail("swap must not run on a stale base"); ()
        }
      }
      assert(ex.getMessage.contains("re-read and retry"))
      assert(mergedB.nonEmpty)
      // winner's state intact
      assert(snapshot("tc_cas") ===
        Set((1L, 2L, "a2"), (2L, 1L, "b")))
      // B retries against the refreshed snapshot and succeeds
      SnapshotMerge.mergeCommit(spark, "tc_cas",
        Seq((2L, 2L, "U", "b2")).toDF("k", "version", "op", "v"), "k", 2)
      assert(snapshot("tc_cas") ===
        Set((1L, 2L, "a2"), (2L, 2L, "b2")))
    } finally spark.sql("DROP TABLE IF EXISTS tc_cas")
  }

  test("two racing writers: exactly one wins, loser fails cleanly, " +
      "no mixed snapshot, no leaked stage tables") {
    import spark.implicits._
    seed("tc_race")
    try {
      val start = new CountDownLatch(1)
      val pool = Executors.newFixedThreadPool(2)
      def writer(k: Long, v: String) = pool.submit(
        new java.util.concurrent.Callable[Either[Throwable, Long]] {
          def call(): Either[Throwable, Long] = {
            start.await()
            try Right(SnapshotMerge.mergeCommit(spark, "tc_race",
              Seq((k, 2L, "U", v)).toDF("k", "version", "op", "v"),
              "k", 2))
            catch { case t: Throwable => Left(t) }
          }
        })
      val fa = writer(1L, "a2")
      val fb = writer(2L, "b2")
      start.countDown()
      val (ra, rb) = (fa.get(120, TimeUnit.SECONDS),
        fb.get(120, TimeUnit.SECONDS))
      pool.shutdown()
      val results = Seq(ra, rb)
      val wins = results.count(_.isRight)
      // both may win only if the race resolved serially (second writer
      // read the epoch after the first committed) — then both deltas
      // applied; with a true interleave exactly one wins and the loser
      // got the protocol exception, never a mixed/corrupt state
      assert(wins >= 1)
      // a loser fails CLEANLY: the protocol exception (lost the lock or
      // the epoch CAS), or — if its stage build was reading the table in
      // the instant of the winner's drop+rename — the analysis error the
      // StreamingMerge scaladoc documents for un-isolated readers.
      // Either way nothing of the loser reaches the table.
      results.collect { case Left(t) => t }.foreach { t =>
        val clean =
          t.isInstanceOf[TableCommit.ConcurrentWriteException] ||
            t.isInstanceOf[org.apache.spark.sql.AnalysisException]
        assert(clean, s"loser must fail cleanly, got $t")
      }
      val snap = snapshot("tc_race")
      if (wins == 2)
        assert(snap === Set((1L, 2L, "a2"), (2L, 2L, "b2")))
      else
        assert(snap === Set((1L, 2L, "a2"), (2L, 1L, "b")) ||
          snap === Set((1L, 1L, "a"), (2L, 2L, "b2")),
          s"snapshot must be exactly one writer's result, got $snap")
      // losers must have dropped their stage tables
      val stages = spark.catalog.listTables().collect()
        .map(_.name).filter(_.startsWith("tc_race_c"))
      assert(stages.isEmpty, s"leaked stages: ${stages.mkString(",")}")
    } finally spark.sql("DROP TABLE IF EXISTS tc_race")
  }

  test("a crashed writer's abandoned lock blocks commits until " +
      "breakStaleLock, which respects the age threshold") {
    import spark.implicits._
    SnapshotMerge.writeSnapshot(
      Seq((1L, 1L, "a")).toDF("k", "version", "v"), "tc_stale", "k",
      nBuckets = 2)
    try {
      // simulate a writer that died inside the critical section: create
      // the abandoned lock directly, the way a kill -9 mid-swap leaves
      // it (commit() itself always releases in finally)
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), ".commits/tc_stale.lock")
      val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.create(wh, false).close()
      val e = intercept[TableCommit.ConcurrentWriteException] {
        SnapshotMerge.mergeCommit(spark, "tc_stale",
          Seq((1L, 2L, "U", "b")).toDF("k", "version", "op", "v"), "k",
          nBuckets = 2)
      }
      assert(e.getMessage.contains("lock held"))
      // too young: the breaker refuses (a LIVE writer may hold it)
      assert(!TableCommit.breakStaleLock(spark, "tc_stale",
        minAgeMs = 600000L))
      // old enough: broken, and the next commit goes through
      assert(TableCommit.breakStaleLock(spark, "tc_stale", minAgeMs = 0L))
      val e2 = SnapshotMerge.mergeCommit(spark, "tc_stale",
        Seq((1L, 2L, "U", "b")).toDF("k", "version", "op", "v"), "k",
        nBuckets = 2)
      assert(e2 === TableCommit.epochOf(spark, "tc_stale"))
      assert(spark.table("tc_stale").collect()
        .map(r => (r.getLong(0), r.getString(2))).toSet ===
        Set(1L -> "b"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS tc_stale")
      TableCommit.reset(spark, "tc_stale")
    }
  }

  test("ivf appendCommit serializes and bumps the epoch") {
    import spark.implicits._
    val vecs = Seq((0L, Array(1.0, 0.0), 0L), (1L, Array(0.0, 1.0), 1L))
      .toDF("vec_id", "v", "cid")
    IvfIndex.write(vecs, "tc_ivf")
    try {
      val e0 = TableCommit.epochOf(spark, "tc_ivf")
      val e1 = IvfIndex.appendCommit(
        Seq((2L, Array(0.5, 0.5), 0L)).toDF("vec_id", "v", "cid"),
        "tc_ivf")
      assert(e1 === e0 + 1)
      assert(spark.table("tc_ivf").count() === 3)
    } finally spark.sql("DROP TABLE IF EXISTS tc_ivf")
  }
}
