package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental paragraph-granularity dedup ([[SegmentDedup]], the d19
  * engine): the standing fingerprint snapshot, the delta probe, and the
  * append/admission cycle — plus the plan property the layout exists
  * for (the snapshot side never moves). */
class SegmentDedupSpec extends SparkSpec {
  import spark.implicits._

  private val T = "segdedup_spec"

  // 16-token segments by construction: each phrase below is exactly 16
  // words, so segment boundaries are predictable
  private def words16(tag: String): String =
    (1 to 16).map(i => s"$tag$i").mkString(" ")

  private def cleanup(): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$T`")
    TableCommit.reset(spark, T)
  }

  test("delta segments dedup against the snapshot and within the batch; " +
      "appendCommit admits a batch so its segments dup the NEXT batch") {
    cleanup()
    try {
      val standing = Seq(
        (1L, words16("a")),
        (2L, words16("b") + " " + words16("c"))).toDF("doc_id", "text")
      SegmentDedup.writeSnapshot(standing, T, nBuckets = 4)

      // delta: doc 30 repeats a standing segment + a fresh one; doc 31
      // repeats doc 30's fresh segment (within-batch dup); doc 32 is new
      val delta1 = Seq(
        (30L, words16("a") + " " + words16("x")),
        (31L, words16("x")),
        (32L, words16("y"))).toDF("doc_id", "text")
      val r1 = SegmentDedup.dedupDelta(spark, delta1, T)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(r1(30L) === ((1L, 0L, 16L)))  // "a" in corpus: 16 tokens drop
      assert(r1(31L) === ((0L, 1L, 16L)))  // "x": doc 30 was first
      assert(r1(32L) === ((0L, 0L, 0L)))   // all fresh

      // admit delta1, then a second batch repeating its segments
      val e1 = SegmentDedup.appendCommit(delta1, T, nBuckets = 4)
      assert(e1 === 1L)
      val r2 = SegmentDedup.dedupDelta(spark,
          Seq((40L, words16("x") + " " + words16("y")))
            .toDF("doc_id", "text"), T)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(2), r.getLong(3)))).toMap
      // both segments are now IN the corpus (admitted with delta1)
      assert(r2(40L) === ((2L, 0L)))
      // idempotent admission: re-appending delta1 adds nothing
      SegmentDedup.appendCommit(delta1, T, nBuckets = 4)
      val n1 = spark.table(T).count()
      SegmentDedup.appendCommit(delta1, T, nBuckets = 4)
      assert(spark.table(T).count() === n1)
    } finally cleanup()
  }

  test("segmentation is exactly d15's: short tails keep their real token " +
      "count") {
    val segs = SegmentDedup.segments(
        Seq((7L, "one two three")).toDF("doc_id", "text"))
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(segs.toSeq === Seq((0, 3L)))
  }

  test("the snapshot side of the probe never moves: no Exchange between " +
      "the bucketed scan and the join") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    cleanup()
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBroadcast =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // broadcast off: the pin targets the at-scale fallback where the
    // snapshot cannot broadcast and the bucketing must carry the join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      SegmentDedup.writeSnapshot(
        (1L to 50L).map(i => (i, words16(s"s$i"))).toDF("doc_id", "text"),
        T, nBuckets = 4)
      val plan = SegmentDedup.dedupDelta(spark,
          Seq((99L, words16("s1"))).toDF("doc_id", "text"), T)
        .queryExecution.executedPlan
      def paths(p: SparkPlan, acc: List[SparkPlan]): Seq[List[SparkPlan]] =
        p match {
          case s: FileSourceScanExec
              if s.tableIdentifier.exists(_.table == T) =>
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
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      cleanup()
    }
  }
}
