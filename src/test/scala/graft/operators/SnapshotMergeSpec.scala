package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SnapshotMergeSpec extends SparkSpec {
  import spark.implicits._

  private def snapDf(rows: (Long, Long, String)*) =
    rows.toDF("k", "version", "val")
  private def deltaDf(rows: (Long, Long, String, String)*) =
    rows.toDF("k", "version", "op", "val")

  test("merge applies upserts, inserts, deletes; last writer wins") {
    SnapshotMerge.writeSnapshot(
      snapDf((1L, 1L, "one"), (2L, 2L, "two"), (3L, 1L, "three"),
        (4L, 1L, "four")), "snapmerge_spec", "k", nBuckets = 4)
    try {
      val delta = deltaDf(
        (2L, 3L, "U", "two-v3"),   // update beats older snapshot version
        (3L, 2L, "D", "x"),        // delete removes the key
        (5L, 1L, "U", "five"),     // insert of an absent key
        (6L, 1L, "D", "x"),        // delete of an absent key: no-op
        (7L, 1L, "U", "seven-a"),  // same key twice in one delta:
        (7L, 2L, "U", "seven-b"))  //   higher version wins
      val got = SnapshotMerge.merge(spark, "snapmerge_spec", delta, "k")
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getString(2))))
        .toMap
      assert(got === Map(
        1L -> ((1L, "one")),       // untouched
        2L -> ((3L, "two-v3")),
        4L -> ((1L, "four")),      // untouched
        5L -> ((1L, "five")),
        7L -> ((2L, "seven-b"))))
    } finally spark.sql("DROP TABLE IF EXISTS snapmerge_spec")
  }

  test("delta wins a version tie with the snapshot (idempotent re-send); " +
      "a same-version delete beats its upsert") {
    SnapshotMerge.writeSnapshot(
      snapDf((1L, 5L, "old")), "snapmerge_spec2", "k", nBuckets = 2)
    try {
      val got = SnapshotMerge.merge(spark, "snapmerge_spec2",
          deltaDf((1L, 5L, "U", "resent")), "k")
        .collect().map(r => (r.getLong(0), r.getString(2))).toMap
      assert(got === Map(1L -> "resent"))
      // same key, same version, U and D in one delta: struct order
      // ('D' > 'U') makes the delete the deterministic winner
      val got2 = SnapshotMerge.merge(spark, "snapmerge_spec2",
          deltaDf((1L, 6L, "U", "up"), (1L, 6L, "D", "x")), "k")
        .collect()
      assert(got2.isEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS snapmerge_spec2")
  }

  test("merge is idempotent and stackable: re-merging the same delta or " +
      "the union of two deltas gives the same standing corpus") {
    SnapshotMerge.writeSnapshot(
      snapDf((1L, 1L, "a"), (2L, 1L, "b")), "snapmerge_spec3", "k",
      nBuckets = 2)
    try {
      val d1 = deltaDf((1L, 2L, "U", "a2"))
      val d2 = deltaDf((2L, 2L, "D", "x"))
      val once = SnapshotMerge.merge(spark, "snapmerge_spec3",
        d1.union(d2), "k")
      // refresh the snapshot with the merge result, then re-apply d1:
      // version-tie goes to the delta with identical bytes — unchanged
      SnapshotMerge.writeSnapshot(
        once.select(col("k"), col("version"), col("val")),
        "snapmerge_spec3b", "k", nBuckets = 2)
      val again = SnapshotMerge.merge(spark, "snapmerge_spec3b", d1, "k")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .toSet
      assert(again === Set((1L, 2L, "a2")))
    } finally {
      spark.sql("DROP TABLE IF EXISTS snapmerge_spec3")
      spark.sql("DROP TABLE IF EXISTS snapmerge_spec3b")
    }
  }

  test("the snapshot side of the merge join never moves: no Exchange " +
      "between the bucketed scan and the join") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    SnapshotMerge.writeSnapshot(
      snapDf((1L to 100L).map(i => (i, 1L, s"v$i")): _*),
      "snapmerge_plan", "k", nBuckets = 4)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBroadcast =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // broadcast off: the pin targets the at-scale fallback where neither
    // side fits in memory and the bucketing must carry the join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val merged = SnapshotMerge.merge(spark, "snapmerge_plan",
        deltaDf((1L, 2L, "U", "upd"), (200L, 1L, "U", "new")), "k")
      val plan = merged.queryExecution.executedPlan
      def paths(p: SparkPlan, acc: List[SparkPlan]): Seq[List[SparkPlan]] =
        p match {
          case s: FileSourceScanExec
              if s.tableIdentifier.exists(_.table == "snapmerge_plan") =>
            Seq(acc :+ s)
          case other => other.children.flatMap(paths(_, acc :+ other))
        }
      val ps = paths(plan, Nil)
      assert(ps.size === 1, s"snapshot must be scanned exactly once:\n$plan")
      ps.foreach { path =>
        val ji = path.lastIndexWhere(_.isInstanceOf[BaseJoinExec])
        val belowJoin = if (ji >= 0) path.drop(ji) else path
        assert(!belowJoin.exists(n => n.isInstanceOf[ShuffleExchangeExec] ||
            n.isInstanceOf[BroadcastExchangeExec]),
          s"snapshot side moves before its join:\n$plan")
      }
      assert(plan.toString.contains("Bucketed: true"),
        s"snapshot scan is not bucketed:\n$plan")
      assert(merged.count() === 101L)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS snapmerge_plan")
    }
  }

  test("schema evolution: a delta with a new payload column null-fills " +
      "the snapshot rows; a type change fails loudly; default is strict") {
    SnapshotMerge.writeSnapshot(
      snapDf((1L, 1L, "one"), (2L, 1L, "two")), "snapmerge_evo", "k",
      nBuckets = 2)
    try {
      // delta adds a `score` column the snapshot has never seen
      val delta = Seq((2L, 2L, "U", "two-v2", 9L), (3L, 1L, "U", "three", 7L))
        .toDF("k", "version", "op", "val", "score")
      val got = SnapshotMerge.merge(spark, "snapmerge_evo", delta, "k",
          evolve = true)
      assert(got.columns.toSeq === Seq("k", "version", "val", "score"))
      val byKey = got.collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getString(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
      assert(byKey === Map(
        1L -> ((1L, "one", None)),        // untouched: new column is null
        2L -> ((2L, "two-v2", Some(9L))),
        3L -> ((1L, "three", Some(7L)))))

      // the evolved schema round-trips: persist, then a delta MISSING the
      // evolved column (an old producer) null-fills ITS rows instead
      SnapshotMerge.writeSnapshot(got, "snapmerge_evo2", "k", nBuckets = 2)
      val old = Seq((4L, 1L, "U", "four")).toDF("k", "version", "op", "val")
      val got2 = SnapshotMerge.merge(spark, "snapmerge_evo2", old, "k",
          evolve = true)
      val r4 = got2.where(col("k") === 4L).collect().head
      assert(r4.getString(2) === "four" && r4.isNullAt(3))
      assert(got2.where(col("k") === 2L).collect().head.getLong(3) === 9L)

      // same-named column with a different type: loud failure
      val bad = Seq((5L, 1L, "U", "five", "not-a-long"))
        .toDF("k", "version", "op", "val", "score")
      val e = intercept[IllegalArgumentException] {
        SnapshotMerge.merge(spark, "snapmerge_evo2", bad, "k",
          evolve = true).collect()
      }
      assert(e.getMessage.contains("score"))

      // strict default: a payload mismatch FAILS LOUDLY in either
      // direction — an unknown delta column is a schema change the
      // caller didn't opt into, and a delta MISSING a snapshot column
      // would null-overwrite it for every key it wins (the r8 advice
      // finding: sideCols null-filled unconditionally)
      val eStrict = intercept[IllegalArgumentException] {
        SnapshotMerge.merge(spark, "snapmerge_evo", delta, "k")
      }
      assert(eStrict.getMessage.contains("score"))
      val eMissing = intercept[IllegalArgumentException] {
        SnapshotMerge.merge(spark, "snapmerge_evo",
          Seq((5L, 3L, "U")).toDF("k", "version", "op"), "k")
      }
      assert(eMissing.getMessage.contains("val"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS snapmerge_evo")
      spark.sql("DROP TABLE IF EXISTS snapmerge_evo2")
    }
  }
}
