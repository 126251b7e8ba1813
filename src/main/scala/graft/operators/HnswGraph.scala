package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.dot

/** S11: HNSW-class graph ANN — the hierarchical navigable-graph serving
  * structure (Malkov & Yashunin 2016) re-expressed as Spark dataflow.
  * The industry-default high-recall server builds a layered proximity
  * graph and answers queries by greedy beam descent; this operator keeps
  * that STRUCTURE while replacing the sequential insert loop with a
  * batch-deterministic construction, so build and search are pure
  * dataflow (replayable, oracle-checkable, and parallel):
  *
  *  - LEVELS are assigned by id arithmetic, not RNG: node v reaches
  *    layer 1 iff v % stride == 0 and layer 2 iff v % 8·stride == 0,
  *    with [[strideFor]] derived from the corpus size so the upper-layer
  *    populations are bounded ABSOLUTELY (~768 / ~96 members at any
  *    scale) — decidable by every executor without coordination, and the
  *    entry point (lowest-id top-layer node, id 0) is a constant.
  *  - EDGES at layer l connect each member to its `m` most-cosine-similar
  *    same-layer members (ties → lower id). Layer 0 (everyone) draws
  *    candidates from a [[signCells]] sign-projection bucket equi-join
  *    whose bucket COUNT grows with the corpus ([[bitsFor]] — target
  *    ~64 members/bucket), so construction cost is ∝ n·64, never an
  *    all-pairs product and never the quadratic a FIXED bucket count
  *    degrades to (the 100 TB shape; upper layers use exact
  *    within-layer selection over their bounded populations).
  *  - SEARCH descends entry → layer 2 → 1 → 0 with a fixed beam
  *    schedule (one hop at layer 2 and two at layer 1 at beam
  *    `efUpper`, three hops at layer 0 at beam `ef0`): each hop is
  *    frontier ∪ frontier⋈adjacency
  *    re-ranked by similarity — a bounded chain of equi-joins on the
  *    graph table, one plan, no driver iteration. Fixed hop counts make
  *    the search path deterministic (and SQL-replayable) where true
  *    HNSW's "until no improvement" is data-dependent; recall floors vs
  *    the s01 brute answer are pinned in `HnswGraphSpec`.
  *
  * The graph is (layer, src, dst) rows — the persisted form follows the
  * s10 "index once, probe many" pattern (bucket by src and the search
  * hops join bucket-for-bucket).
  */
object HnswGraph {

  /** Number of sign-projection bits for a corpus of `n` vectors: the
    * smallest h ≥ 3 with 2^h ≥ n/64, i.e. ≤ ~128 members per bucket
    * with 2 memberships each (~256 candidates per vector — the edge
    * quality the recall floor was pinned against). Buckets GROW with
    * the corpus — a fixed bucket count would make per-bucket population
    * ∝ n and the layer-0 candidate join quadratic (the r8 scale probe
    * measured exactly that against the earlier 8-centroid rule: 8→118 s
    * from x1 to x10). Integer arithmetic so Spark and the SQL oracle
    * derive the identical h with no float-rounding edge at exact powers
    * of two. */
  def bitsFor(n: Long): Int = {
    var h = 3
    while ((1L << h) * 64 < n) h += 1
    h
  }

  /** Upper-layer stride for a corpus of `n` vectors: the smallest power
    * of two ≥ n/768 (min 8), so layer 1 (`id % stride == 0`) holds at
    * most ~768 members and layer 2 (`id % (8·stride) == 0`) ~96 —
    * bounded ABSOLUTELY, not proportionally, so the exact within-layer
    * selection stays O(1)-sized as the corpus grows (≤ ~768² pairs). */
  def strideFor(n: Long): Long = {
    var s = 8L
    while (s * 768 < n) s <<= 1
    s
  }

  /** Top layer of node `id` under the deterministic level rule. */
  def levelOf(id: Column, stride: Long = 8L): Column =
    when(id % (stride * 8) === 0, 2)
      .when(id % stride === 0, 1).otherwise(0)

  /** (vec_id, cid) with 2 rows per vector — the layer-0 candidate
    * constraint: cid is the h-bit string of sign(round(dot(v, dir_i),6))
    * over the h lowest-id vectors as projection directions, plus the
    * multiprobe bucket with the LEAST-CONFIDENT bit (min |dot|, ties →
    * lowest i) flipped. Deterministic, SQL-replayable, and balanced on
    * centered embeddings (measured: 20k vectors / h=10 → max bucket 71).
    * Scale shape: one broadcast of h direction vectors + a per-vector
    * aggregate — no shuffle keyed by anything bigger than vec_id. */
  def signCells(e: DataFrame, h: Int): DataFrame = {
    val dirs = e.where(col("vec_id") < h)
      .select(col("vec_id").as("i"), col("v").as("dv"))
    val bits = e.join(broadcast(dirs))
      .select(col("vec_id"), col("i"),
        round(dot(col("v"), col("dv")), 6).as("dt"))
      .select(col("vec_id"), col("i"),
        when(col("dt") >= 0, lit(1)).otherwise(lit(0)).as("b"),
        abs(col("dt")).as("conf"))
    bits.groupBy(col("vec_id"))
      .agg(sort_array(collect_list(
        struct(col("i"), col("b"), col("conf")))).as("xs"))
      .withColumn("fi",
        expr("array_min(transform(xs, x -> struct(x.conf, x.i))).i"))
      .select(col("vec_id"), explode(array(
        expr("concat_ws('', transform(xs, x -> cast(x.b as string)))"),
        expr("concat_ws('', transform(xs, x -> cast(" +
          "case when x.i = fi then 1 - x.b else x.b end as string)))")))
        .as("cid"))
  }

  /** Build the layered adjacency (layer, src, dst) for embeddings
    * `e` = (vec_id, v, nrm). `cells` = (vec_id, cid) with up to 2 rows
    * per vector ([[signCells]] — primary + multiprobe sign bucket)
    * constrains layer-0 candidate generation; `stride` is the
    * [[strideFor]] level rule the build and later appends must share. */
  def build(e: DataFrame, cells: DataFrame, m: Int = 6,
      stride: Long = 8L): DataFrame = {
    val byS = Window.partitionBy(col("src"))
      .orderBy(col("sim").desc, col("dst"))
    def topM(pairs: DataFrame, layer: Int): DataFrame =
      pairs
        .select(col("src"), col("dst"),
          round(dot(col("sv"), col("dv")) / (col("sn") * col("dn")), 6)
            .as("sim"))
        .distinct() // two shared cells → the same candidate pair twice
        .withColumn("rk", row_number().over(byS))
        .where(col("rk") <= m)
        .select(lit(layer).as("layer"), col("src"), col("dst"),
          col("sim"))
    // layer 0: candidates share a coarse cell (equi-join keyed by cid)
    val memb = e.join(cells, "vec_id")
      .select(col("cid"), col("vec_id"), col("v"), col("nrm"))
    val p0 = memb.as("a").join(memb.as("b"),
        col("a.cid") === col("b.cid") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("a.v").as("sv"),
        col("a.nrm").as("sn"), col("b.vec_id").as("dst"),
        col("b.v").as("dv"), col("b.nrm").as("dn"))
    // upper layers: ABSOLUTELY bounded by the stride rule (≤ ~768 and
    // ~96 members whatever the corpus size) → exact within-layer
    // selection stays constant-cost as the corpus grows
    def upper(layer: Int): DataFrame = {
      val mem = e.where(levelOf(col("vec_id"), stride) >= layer)
      mem.as("a").join(mem.as("b"),
          col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("src"), col("a.v").as("sv"),
          col("a.nrm").as("sn"), col("b.vec_id").as("dst"),
          col("b.v").as("dv"), col("b.nrm").as("dn"))
    }
    val fwd = topM(p0, 0)
      .unionByName(topM(upper(1), 1))
      .unionByName(topM(upper(2), 2))
    // bidirectional links, as in real HNSW (and as [[append]] already
    // does for delta nodes): without the reverse edges a node chosen BY
    // many neighbors but choosing none of them back is unreachable from
    // the entry-point descent. A popular node's in-degree is unbounded,
    // so the union is PRUNED back to the closest 2m per (layer, node) —
    // HNSW's M_max rule, keeping degree bounded at any scale.
    val bidir = fwd.unionByName(fwd.select(col("layer"),
        col("dst").as("src"), col("src").as("dst"), col("sim")))
      .groupBy(col("layer"), col("src"), col("dst"))
      .agg(max(col("sim")).as("sim"))
    bidir
      .withColumn("rk", row_number().over(Window
        .partitionBy(col("layer"), col("src"))
        .orderBy(col("sim").desc, col("dst"))))
      .where(col("rk") <= 2 * m)
      .select(col("layer"), col("src"), col("dst"))
  }

  /** Incremental maintenance — insert `delta` vectors into the standing
    * graph `table` without a rebuild (the s11 sibling of
    * [[IvfIndex.append]] / [[IncrementalDedup]]): each new node gets its
    * `m` best same-layer neighbors among the STANDING corpus members
    * sharing one of its 2 sign-projection cells (the build-time rule),
    * and for every chosen edge the REVERSE edge (standing → new) is
    * appended too — without it a new node is unreachable from the
    * entry-point descent. Append-only consequences, both standard for
    * incremental HNSW and documented here: standing nodes' out-degree
    * grows past `m` by the reverse edges until the next rebuild
    * re-prunes, and new nodes do not link to EACH OTHER within a batch
    * (delta batches are small by nature; a rebuild restores the exact
    * batch construction). The append serializes through
    * [[TableCommit]] — concurrent appenders get the protocol exception.
    * `cells` must cover corpus ∪ delta (vec_id, cid — 2 rows each). */
  def append(table: String, corpus: DataFrame, delta: DataFrame,
      cells: DataFrame, m: Int = 6, nBuckets: Int = 8,
      stride: Long = 8L): Long = {
    val spark = corpus.sparkSession
    val byS = Window.partitionBy(col("src"))
      .orderBy(col("sim").desc, col("dst"))
    def topM(pairs: DataFrame, layer: Int): DataFrame =
      pairs
        .select(col("src"), col("dst"),
          round(dot(col("sv"), col("dv")) / (col("sn") * col("dn")), 6)
            .as("sim"))
        .distinct()
        .withColumn("rk", row_number().over(byS))
        .where(col("rk") <= m)
        .select(lit(layer).as("layer"), col("src"), col("dst"))
    // layer 0: delta probes the standing members of its coarse cells
    val dMemb = delta.join(cells, "vec_id")
      .select(col("cid"), col("vec_id"), col("v"), col("nrm"))
    val cMemb = corpus.join(cells, "vec_id")
      .select(col("cid"), col("vec_id"), col("v"), col("nrm"))
    val p0 = dMemb.as("a").join(cMemb.as("b"),
        col("a.cid") === col("b.cid") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("a.v").as("sv"),
        col("a.nrm").as("sn"), col("b.vec_id").as("dst"),
        col("b.v").as("dv"), col("b.nrm").as("dn"))
    def upper(layer: Int): DataFrame = {
      val dm = delta.where(levelOf(col("vec_id"), stride) >= layer)
      val cm = corpus.where(levelOf(col("vec_id"), stride) >= layer)
      dm.as("a").join(cm.as("b"), col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("src"), col("a.v").as("sv"),
          col("a.nrm").as("sn"), col("b.vec_id").as("dst"),
          col("b.v").as("dv"), col("b.nrm").as("dn"))
    }
    val fwd = topM(p0, 0)
      .unionByName(topM(upper(1), 1))
      .unionByName(topM(upper(2), 2))
    val edges = fwd.unionByName(fwd.select(col("layer"),
        col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val base = TableCommit.epochOf(spark, table)
    TableCommit.commit(spark, table, base) {
      // match the standing table's bucket spec (appending unbucketed
      // rows to a bucketed table is rejected); appends add a file per
      // touched bucket — the scan's per-file sort order then degrades
      // until the next full rebuild re-compacts, exactly like
      // IvfIndex.append's small-files story
      edges.repartition(nBuckets, col("src"))
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .bucketBy(nBuckets, "src").sortBy("src")
        .format("parquet").saveAsTable(table)
      base + 1
    }
  }

  /** Beam-descend `qs` = (q, qv, qn) through the graph. Returns
    * (q, rk, nb, sim) — top-`k` neighbors per query, self excluded. */
  def search(adj: DataFrame, e: DataFrame, qs: DataFrame,
      efUpper: Int = 4, ef0: Int = 16, k: Int = 5): DataFrame = {
    val sim = round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6)
    // frontier columns: (q, qv, qn, node, sim)
    def score(cands: DataFrame): DataFrame =
      cands.join(e.withColumnRenamed("vec_id", "node"), "node")
        .select(col("q"), col("qv"), col("qn"), col("node"), sim.as("sim"))
    def hop(frontier: DataFrame, layer: Int, ef: Int): DataFrame = {
      val expanded = frontier
        .join(adj.where(col("layer") === layer)
            .select(col("src").as("node"), col("dst")),
          Seq("node"))
        .select(col("q"), col("qv"), col("qn"), col("dst").as("node"))
      val cand = score(expanded)
        .unionByName(frontier
          .select(col("q"), col("qv"), col("qn"), col("node"), col("sim")))
        .distinct()
      val w = Window.partitionBy(col("q"))
        .orderBy(col("sim").desc, col("node"))
      cand.withColumn("rk", row_number().over(w))
        .where(col("rk") <= ef)
        .drop("rk")
    }
    val entry = score(qs.select(col("q"), col("qv"), col("qn"),
      lit(0L).as("node")))
    val f2 = hop(entry, 2, efUpper)
    // two hops per navigating layer: one hop only reaches the entry
    // point's immediate neighborhood, which strands the descent far from
    // the query's region (observed as an unreachable exact-duplicate in
    // HnswGraphSpec); a second hop per layer restores the greedy-walk
    // depth true HNSW gets from its until-no-improvement loop while
    // keeping the schedule fixed (deterministic, SQL-replayable)
    val f1 = hop(hop(f2, 1, efUpper), 1, efUpper)
    val g1 = hop(f1, 0, ef0)
    val g2 = hop(hop(g1, 0, ef0), 0, ef0)
    val w = Window.partitionBy(col("q"))
      .orderBy(col("sim").desc, col("node"))
    g2.where(col("node") =!= col("q"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("q"), col("rk"), col("node").as("nb"), col("sim"))
  }
}
