package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def frames = {
    import spark.implicits._
    // left: probes (id, key, time); right: quotes (id, key, time, px)
    val left = Seq(
      (100L, 1L, ts("2024-01-01 10:00:00"), "probe_a"),
      (101L, 1L, ts("2024-01-01 12:00:00"), "probe_b"),
      (102L, 2L, ts("2024-01-01 09:00:00"), "probe_c"), // before any quote
      (103L, 3L, ts("2024-01-01 10:30:00"), "probe_d")  // equal-ts case
    ).toDF("event_id", "k", "t", "tag")
    val right = Seq(
      (1L, 1L, ts("2024-01-01 09:30:00"), 10.0),
      (2L, 1L, ts("2024-01-01 11:00:00"), 20.0),
      (3L, 2L, ts("2024-01-01 23:00:00"), 30.0),
      (4L, 3L, ts("2024-01-01 10:30:00"), 40.0), // exactly at probe_d
      (5L, 3L, ts("2024-01-01 10:30:00"), 50.0)  // same instant, higher id
    ).toDF("event_id", "k", "t", "px")
    (left, right)
  }

  test("each left row gets the latest right row at-or-before its time") {
    val (left, right) = frames
    val got = AsOfJoin.asOf(left, right, on = "k", time = "t",
        ord = "event_id", pick = Seq("event_id" -> "qid", "px" -> "qpx"))
      .orderBy("event_id").collect()
    // probe_a (10:00): quote 1 (09:30); probe_b (12:00): quote 2 (11:00)
    assert(got(0).getLong(4) == 1L && got(0).getDouble(5) == 10.0)
    assert(got(1).getLong(4) == 2L && got(1).getDouble(5) == 20.0)
    // probe_c precedes every key-2 quote → null attribution
    assert(got(2).isNullAt(4) && got(2).isNullAt(5))
    // probe_d at the same instant as quotes 4 and 5: inclusive semantics
    // see them, ties resolve to the largest ord
    assert(got(3).getLong(4) == 5L && got(3).getDouble(5) == 50.0)
    // picked columns come atomically from one right row
    assert(got.forall(r => r.isNullAt(4) == r.isNullAt(5)))
  }

  test("strict mode hides right rows at exactly the left row's time") {
    val (left, right) = frames
    val got = AsOfJoin.asOf(left, right, on = "k", time = "t",
        ord = "event_id", pick = Seq("event_id" -> "qid"),
        inclusive = false)
      .orderBy("event_id").collect()
    assert(got(0).getLong(4) == 1L) // strictly-before still matches
    assert(got(3).isNullAt(4))      // the same-instant quotes are hidden
  }

  test("plan: one shuffle by key, window over union, no join node") {
    val (left, right) = frames
    val plan = AsOfJoin.asOf(left, right, on = "k", time = "t",
        ord = "event_id", pick = Seq("px" -> "qpx"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    val shuffles = plan.split("\n")
      .count(_.contains("Exchange hashpartitioning"))
    assert(shuffles == 1, plan)
  }
}
