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
  *    layer 1 iff v % 8 == 0 and layer 2 iff v % 64 == 0 — the same
  *    geometric layer populations (ratio 8 ≈ e^(1/mL)) as hash-seeded
  *    HNSW, decidable by every executor without coordination, and the
  *    entry point (lowest-id top-layer node, id 0) is a constant.
  *  - EDGES at layer l connect each member to its `m` most-cosine-similar
  *    same-layer members (ties → lower id). Layer 0 (everyone) draws
  *    candidates from a coarse-cell equi-join — each vector's 2 nearest
  *    of the s03 deterministic centroids — so construction is a bucketed
  *    join keyed by cell, never an all-pairs product (the 100 TB shape;
  *    upper layers are geometrically small, ~N/8 and ~N/64, and use
  *    exact within-layer selection).
  *  - SEARCH descends entry → layer 2 → 1 → 0 with a fixed beam
  *    schedule (one hop per upper layer at beam `efUpper`, two hops at
  *    layer 0 at beam `ef0`): each hop is frontier ∪ frontier⋈adjacency
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

  /** Top layer of node `id` under the deterministic level rule. */
  def levelOf(id: Column): Column =
    when(id % 64 === 0, 2).when(id % 8 === 0, 1).otherwise(0)

  /** Build the layered adjacency (layer, src, dst) for embeddings
    * `e` = (vec_id, v, nrm). `cells` = (vec_id, cid) with up to 2 rows
    * per vector (its 2 nearest coarse centroids) constrains layer-0
    * candidate generation. */
  def build(e: DataFrame, cells: DataFrame, m: Int = 6): DataFrame = {
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
        .select(lit(layer).as("layer"), col("src"), col("dst"))
    // layer 0: candidates share a coarse cell (equi-join keyed by cid)
    val memb = e.join(cells, "vec_id")
      .select(col("cid"), col("vec_id"), col("v"), col("nrm"))
    val p0 = memb.as("a").join(memb.as("b"),
        col("a.cid") === col("b.cid") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("a.v").as("sv"),
        col("a.nrm").as("sn"), col("b.vec_id").as("dst"),
        col("b.v").as("dv"), col("b.nrm").as("dn"))
    // upper layers: geometrically small → exact within-layer selection
    def upper(layer: Int): DataFrame = {
      val mem = e.where(levelOf(col("vec_id")) >= layer)
      mem.as("a").join(mem.as("b"),
          col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("src"), col("a.v").as("sv"),
          col("a.nrm").as("sn"), col("b.vec_id").as("dst"),
          col("b.v").as("dv"), col("b.nrm").as("dn"))
    }
    topM(p0, 0)
      .unionByName(topM(upper(1), 1))
      .unionByName(topM(upper(2), 2))
  }

  /** Incremental maintenance — insert `delta` vectors into the standing
    * graph `table` without a rebuild (the s11 sibling of
    * [[IvfIndex.append]] / [[IncrementalDedup]]): each new node gets its
    * `m` best same-layer neighbors among the STANDING corpus members
    * sharing one of its 2 coarse cells (the build-time candidate rule),
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
      cells: DataFrame, m: Int = 6, nBuckets: Int = 8): Long = {
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
      val dm = delta.where(levelOf(col("vec_id")) >= layer)
      val cm = corpus.where(levelOf(col("vec_id")) >= layer)
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
    val f1 = hop(f2, 1, efUpper)
    val g1 = hop(f1, 0, ef0)
    val g2 = hop(g1, 0, ef0)
    val w = Window.partitionBy(col("q"))
      .orderBy(col("sim").desc, col("node"))
    g2.where(col("node") =!= col("q"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("q"), col("rk"), col("node").as("nb"), col("sim"))
  }
}
