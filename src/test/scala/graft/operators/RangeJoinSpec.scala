package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("pairs within the radius match exactly once; outside never") {
    import spark.implicits._
    val probes = Seq(
      (1L, 7L, ts("2024-01-01 12:00:00")),
      (2L, 7L, ts("2024-01-01 18:00:00")),
      (3L, 8L, ts("2024-01-01 12:00:00"))  // other key
    ).toDF("event_id", "k", "t")
    val others = Seq(
      (10L, 7L, ts("2024-01-01 11:30:00")), // 30 min before probe 1
      (11L, 7L, ts("2024-01-01 13:00:00")), // exactly +1h from probe 1
      (12L, 7L, ts("2024-01-01 13:00:01")), // 1h + 1s — outside
      (13L, 9L, ts("2024-01-01 12:00:00"))  // right key absent from probes
    ).toDF("oid", "k", "t")
    val got = RangeJoin.within(probes, others, on = "k", time = "t",
        radiusMicros = 3600000000L, pick = Seq("oid" -> "oid"))
      .orderBy("event_id", "oid").collect()
    // probe 1 matches 10 and the exact-boundary 11 (inclusive), not 12;
    // probe 2 and probe 3 match nothing; each pair appears exactly once
    // (a build row's home bucket meets the probe's 2-bucket cover once)
    assert(got.map(r => (r.getLong(0), r.getLong(3))).toSeq ==
      Seq((1L, 10L), (1L, 11L)))
  }

  test("bucket-boundary pairs are found (the band never splits a radius)") {
    import spark.implicits._
    // radius 1h ⇒ width 2h ⇒ bucket edges at even hours UTC: place the
    // pair on opposite sides of an edge, 2 s apart
    val probes = Seq((1L, 7L, ts("2024-01-01 13:59:59")))
      .toDF("event_id", "k", "t")
    val others = Seq((10L, 7L, ts("2024-01-01 14:00:01")))
      .toDF("oid", "k", "t")
    val got = RangeJoin.within(probes, others, on = "k", time = "t",
        radiusMicros = 3600000000L, pick = Seq("oid" -> "oid")).collect()
    assert(got.length == 1 && got(0).getLong(3) == 10L)
  }

  test("plan: equi-join on (key, bucket), never a nested loop") {
    import spark.implicits._
    val probes = Seq((1L, 7L, ts("2024-01-01 12:00:00")))
      .toDF("event_id", "k", "t")
    val others = Seq((10L, 7L, ts("2024-01-01 11:30:00")))
      .toDF("oid", "k", "t")
    val plan = RangeJoin.within(probes, others, on = "k", time = "t",
        radiusMicros = 3600000000L, pick = Seq("oid" -> "oid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
