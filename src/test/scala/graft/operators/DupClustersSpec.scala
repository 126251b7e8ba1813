package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DupClustersSpec extends SparkSpec {

  private def pairsDf(ps: (Long, Long)*) = {
    import spark.implicits._
    ps.toDF("a", "b")
  }

  test("chain, triangle, and isolated pair collapse to min-id components") {
    // chain 1-2-3-4 (diameter 3, needs >1 round), triangle 10-11-12,
    // pair 20-21
    val pairs = pairsDf(1L -> 2L, 2L -> 3L, 3L -> 4L,
      10L -> 11L, 11L -> 12L, 10L -> 12L, 20L -> 21L)
    val got = DupClusters.clusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("empty pair list yields an empty cluster table") {
    val got = DupClusters.clusters(pairsDf())
    assert(got.count() === 0)
  }

  test("deduplicate keeps one canonical row per cluster plus unpaired rows") {
    import spark.implicits._
    val docs = (1L to 6L).map(i => (i, s"text$i")).toDF("doc_id", "text")
    val pairs = pairsDf(1L -> 2L, 2L -> 3L, 5L -> 6L)
    val kept = DupClusters.deduplicate(docs, pairs)
      .select("doc_id").as[Long].collect().sorted
    // cluster {1,2,3} -> keep 1; {5,6} -> keep 5; 4 untouched
    assert(kept.toSeq === Seq(1L, 4L, 5L))
  }

  test("random graphs match a union-find ground truth") {
    // deterministic pseudo-random edge lists over 40 vertices; the
    // distributed label propagation must agree with local union-find
    // on every component assignment
    var state = 12345L
    def nextInt(bound: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (math.abs(state >> 33) % bound).toInt
    }
    for (trial <- 1 to 5) {
      val nEdges = 10 + nextInt(40)
      val edges = Seq.fill(nEdges) {
        val a = nextInt(40).toLong; val b = nextInt(40).toLong
        if (a < b) (a, b) else (b, a + 1) // avoid self-loops
      }
      // local union-find
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> find(v)).toMap
      val got = DupClusters.clusters(pairsDf(edges: _*))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"trial $trial, edges $edges")
    }
  }

  test("long chain converges within the iteration cap") {
    // path 0-1-2-...-30: worst-case diameter for min-label propagation
    val pairs = pairsDf((0L until 30L).map(i => i -> (i + 1)): _*)
    val got = DupClusters.clusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 31 && got.values.forall(_ == 0L))
  }

  test("deep chain: min-label refuses at the cap, large-star completes") {
    // path of depth 200 ≫ the 50-round cap: min-label propagates one hop
    // per round and must fail LOUDLY; large-star contracts exponentially
    // and must finish well inside the same cap
    val pairs = pairsDf((0L until 200L).map(i => i -> (i + 1)): _*)
    val e = intercept[IllegalArgumentException] {
      DupClusters.clusters(pairs).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    val got = DupClusters.clusters(pairs, strategy = "large-star")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 201 && got.values.forall(_ == 0L))
  }

  test("large-star matches min-label on random graphs") {
    var state = 98765L
    def nextInt(bound: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (math.abs(state >> 33) % bound).toInt
    }
    for (trial <- 1 to 3) {
      val edges = Seq.fill(12 + nextInt(30)) {
        val a = nextInt(40).toLong; val b = nextInt(40).toLong
        if (a < b) (a, b) else (b, a + 1)
      }
      val viaMinLabel = DupClusters.clusters(pairsDf(edges: _*))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaLargeStar = DupClusters
        .clusters(pairsDf(edges: _*), strategy = "large-star")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaLargeStar === viaMinLabel, s"trial $trial, edges $edges")
    }
  }

  test("large-star handles empty input and star-shaped components") {
    assert(DupClusters.clusters(pairsDf(),
      strategy = "large-star").count() === 0)
    // inverted star: high-id hub 50 connected to {1, 2, 3}
    val got = DupClusters.clusters(
        pairsDf(50L -> 1L, 50L -> 2L, 50L -> 3L), strategy = "large-star")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 50L -> 1L))
  }
}
