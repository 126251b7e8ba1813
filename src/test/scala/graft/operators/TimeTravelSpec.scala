package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Time travel over the commit-protocol snapshot tables:
  * [[SnapshotMerge.mergeCommitRetain]] retains each superseded snapshot
  * under its commit epoch, [[SnapshotMerge.readAt]] reproduces the
  * corpus as of any retained epoch, and [[SnapshotMerge.vacuumVersions]]
  * bounds the retained history — the `VERSION AS OF` + `VACUUM` pair of
  * a lakehouse table format, proven here epoch by epoch. */
class TimeTravelSpec extends SparkSpec {
  import spark.implicits._

  private val T = "timetravel_spec"

  private def cleanup(): Unit = {
    spark.catalog.listTables().collect().map(_.name)
      .filter(n => n == T || n.startsWith(s"${T}__v") ||
        n.startsWith(s"${T}_c"))
      .foreach(n => spark.sql(s"DROP TABLE IF EXISTS `$n`"))
    TableCommit.reset(spark, T)
  }

  private def state(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), (r.getLong(1), r.getString(2))))
      .toMap

  test("readAt reproduces every retained epoch exactly; vacuum bounds " +
      "history and a vacuumed read fails loudly") {
    cleanup()
    try {
      SnapshotMerge.writeSnapshot(
        Seq((1L, 1L, "a1"), (2L, 1L, "b1")).toDF("k", "version", "v"),
        T, "k", nBuckets = 2)
      assert(TableCommit.epochOf(spark, T) === 0L)

      val e1 = SnapshotMerge.mergeCommitRetain(spark, T,
        Seq((2L, 2L, "U", "b2"), (3L, 1L, "U", "c1"))
          .toDF("k", "version", "op", "v"), "k", nBuckets = 2)
      assert(e1 === 1L)
      val e2 = SnapshotMerge.mergeCommitRetain(spark, T,
        Seq((1L, 2L, "D", "x"), (3L, 2L, "U", "c2"))
          .toDF("k", "version", "op", "v"), "k", nBuckets = 2)
      assert(e2 === 2L)

      // each epoch reads back as the state that was live then
      assert(state(SnapshotMerge.readAt(spark, T, 0L)) ===
        Map(1L -> ((1L, "a1")), 2L -> ((1L, "b1"))))
      assert(state(SnapshotMerge.readAt(spark, T, 1L)) ===
        Map(1L -> ((1L, "a1")), 2L -> ((2L, "b2")), 3L -> ((1L, "c1"))))
      assert(state(SnapshotMerge.readAt(spark, T, 2L)) ===
        Map(2L -> ((2L, "b2")), 3L -> ((2L, "c2"))))
      // the current epoch IS the live table
      assert(state(SnapshotMerge.readAt(spark, T, 2L)) ===
        state(spark.table(T)))

      // vacuum keeps the newest retained version only
      val dropped = SnapshotMerge.vacuumVersions(spark, T, keepLast = 1)
      assert(dropped === Seq(0L))
      assert(state(SnapshotMerge.readAt(spark, T, 1L)) ===
        Map(1L -> ((1L, "a1")), 2L -> ((2L, "b2")), 3L -> ((1L, "c1"))))
      val e = intercept[IllegalArgumentException] {
        SnapshotMerge.readAt(spark, T, 0L)
      }
      assert(e.getMessage.contains("epoch 0"))
      // vacuuming again is a no-op
      assert(SnapshotMerge.vacuumVersions(spark, T, keepLast = 1).isEmpty)
    } finally cleanup()
  }

  test("a reader pinned to an old epoch is isolated from later commits " +
      "(training-run reproducibility)") {
    cleanup()
    try {
      SnapshotMerge.writeSnapshot(
        Seq((1L, 1L, "orig")).toDF("k", "version", "v"), T, "k",
        nBuckets = 2)
      SnapshotMerge.mergeCommitRetain(spark, T,
        Seq((1L, 2L, "U", "edit1")).toDF("k", "version", "op", "v"), "k",
        nBuckets = 2)
      val pinned = SnapshotMerge.readAt(spark, T, 1L)
      val before = state(pinned)
      // a later commit lands; the pinned epoch re-reads identically
      SnapshotMerge.mergeCommitRetain(spark, T,
        Seq((1L, 3L, "U", "edit2")).toDF("k", "version", "op", "v"), "k",
        nBuckets = 2)
      assert(state(SnapshotMerge.readAt(spark, T, 1L)) === before)
      assert(before === Map(1L -> ((2L, "edit1"))))
      assert(state(spark.table(T)) === Map(1L -> ((3L, "edit2"))))
    } finally cleanup()
  }

  test("retained renames preserve the bucketed layout (the versioned " +
      "read stays Exchange-free on the snapshot side)") {
    cleanup()
    try {
      SnapshotMerge.writeSnapshot(
        Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("k", "version", "v"),
        T, "k", nBuckets = 4)
      SnapshotMerge.mergeCommitRetain(spark, T,
        Seq((2L, 2L, "U", "b2")).toDF("k", "version", "op", "v"), "k",
        nBuckets = 4)
      // the retained v0 table still carries its bucket spec: a
      // bucket-keyed aggregate plans without an Exchange
      val plan = SnapshotMerge.readAt(spark, T, 0L)
        .groupBy(col("k")).agg(max(col("version")))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"retained snapshot lost its bucketing:\n$plan")
    } finally cleanup()
  }
}
