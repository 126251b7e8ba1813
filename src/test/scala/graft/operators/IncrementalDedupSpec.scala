package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private val lorem = "the quick brown fox jumps over the lazy dog and " +
    "then runs far away into the deep dark woods tonight"

  private def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("delta near-dup of a standing doc is flagged with its source; " +
      "fresh delta docs are kept") {
    val standing = docsDf(
      1L -> lorem,
      2L -> ("completely different content about spark query planning " +
        "and catalyst optimizer rules for distributed execution engines"))
    // 10: near-dup of 1 (one word changed); 15: unrelated fresh text
    val delta = docsDf(
      10L -> lorem.replace("tonight", "today"),
      15L -> ("unrelated fresh document that matches nothing in the " +
        "standing corpus at all and should simply be kept as new"))
    IncrementalDedup.writeSnapshot(standing, "incdedup_spec")
    try {
      val rows = IncrementalDedup.dedupDelta(spark, delta, "incdedup_spec")
        .collect().map(r => r.getLong(0) ->
          ((if (r.isNullAt(1)) None else Some(r.getLong(1))), r.getLong(2)))
        .toMap
      assert(rows(10L) === ((Some(1L), 0L)), rows)
      assert(rows(15L) === ((None, 1L)), rows)
    } finally spark.sql("DROP TABLE IF EXISTS incdedup_spec")
  }

  test("within-batch dup resolves to the EARLIEST delta doc, and chains " +
      "point at the minimum match") {
    val standing = docsDf(1L -> ("nothing shares shingles with the " +
      "delta documents in this standing corpus of one entry here"))
    // 20 and 30 duplicate each other (not the standing side): 30 -> 20
    val delta = docsDf(
      20L -> lorem,
      30L -> lorem.replace("tonight", "today"))
    IncrementalDedup.writeSnapshot(standing, "incdedup_spec2")
    try {
      val rows = IncrementalDedup.dedupDelta(spark, delta, "incdedup_spec2")
        .collect().map(r => r.getLong(0) ->
          ((if (r.isNullAt(1)) None else Some(r.getLong(1))), r.getLong(2)))
        .toMap
      assert(rows(20L) === ((None, 1L)), rows)
      assert(rows(30L) === ((Some(20L), 0L)), rows)
    } finally spark.sql("DROP TABLE IF EXISTS incdedup_spec2")
  }

  test("short docs (no shingles) pass through as kept, and snapshot " +
      "refresh picks up the accepted batch") {
    val standing = docsDf(1L -> lorem)
    val delta = docsDf(40L -> "too short", 50L -> (lorem + " extra"))
    IncrementalDedup.writeSnapshot(standing, "incdedup_spec3")
    try {
      val first = IncrementalDedup.dedupDelta(spark, delta, "incdedup_spec3")
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(first(40L) === 1L, "shingle-less doc must be kept")
      assert(first(50L) === 0L, "near-dup of standing must be dropped")
      // accept the batch: refresh the snapshot with the union, then a
      // re-arrival of the formerly-fresh text dups the NEW snapshot row
      IncrementalDedup.writeSnapshot(
        standing.union(docsDf(60L -> ("a wholly new accepted document " +
          "with enough words to carry shingles of its very own kind"))),
        "incdedup_spec3")
      val again = IncrementalDedup.dedupDelta(spark,
          docsDf(70L -> ("a wholly new accepted document with enough " +
            "words to carry shingles of its very own kind")),
          "incdedup_spec3")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      assert(again(70L) === 60L, again)
    } finally spark.sql("DROP TABLE IF EXISTS incdedup_spec3")
  }
}
