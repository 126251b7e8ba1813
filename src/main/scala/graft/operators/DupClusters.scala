package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a near-duplicate pair list — the step that
  * turns pairwise dedup output (d02/d03/d04-style `(a, b)` edges) into
  * actionable clusters: every document gets a cluster id (the minimum
  * doc id reachable through dup edges) and exactly one document per
  * cluster is canonical. Dropping every non-canonical row is then a
  * single anti-join.
  *
  * Algorithm: iterated min-label propagation. Each round every vertex
  * takes the minimum label among itself and its neighbors; a fixpoint is
  * a per-component constant label = the component's minimum id. Rounds
  * needed = graph diameter, and near-dup components are dense and tiny
  * (copies of one source text), so 2-4 rounds is typical — each round is
  * one shuffle join on `id`, nothing quadratic. The classic alternative
  * for adversarially long chains (large-star/small-star, which contracts
  * paths exponentially) plugs into the same loop shape; min-label is the
  * right default for dedup-shaped graphs.
  *
  * Scale notes: lineage is truncated every round with an eager
  * `localCheckpoint` — an iterative plan otherwise doubles in depth each
  * round and analysis time explodes. The per-round checkpoints store
  * MEMORY_ONLY: a label table is ~16 B per vertex, and the default
  * MEMORY_AND_DISK level write-through amplified host contention by a
  * measured 2-4× on the bench (r8's stage_dup_labels row) for data that
  * trivially fits memory; an evicted memory-only checkpoint block fails
  * the job loudly rather than silently recomputing truncated lineage —
  * at which point the right move is the cluster answer anyway:
  * `spark.sparkContext.setCheckpointDir` + reliable `checkpoint` so a
  * lost executor cannot drop a round's partitions mid-loop.
  */
object DupClusters {

  /** Cluster assignment for every vertex that appears in `pairs`:
    * (id, lbl) with lbl = min id of the component. `pairs` columns
    * `a`/`b` are one undirected edge per row.
    *
    * `strategy`:
    *  - `"min-label"` (default): O(diameter) rounds — right for dup
    *    components, which are dense near-cliques of one source text;
    *  - `"large-star"`: alternating large-star/small-star contraction
    *    (Kiveris et al., "Connected Components in MapReduce and Beyond"),
    *    O(log² n) rounds regardless of diameter — the fallback when the
    *    edge list is chain-shaped (e.g. similarity edges that form long
    *    drift paths) and min-label would hit its round cap. */
  def clusters(pairs: DataFrame, maxIter: Int = 50,
      strategy: String = "min-label"): DataFrame = strategy match {
    case "min-label" => clustersMinLabel(pairs, maxIter)
    case "large-star" => clustersLargeStar(pairs, maxIter)
    case other => throw new IllegalArgumentException(
      s"unknown strategy '$other' (want min-label or large-star)")
  }

  private def clustersMinLabel(pairs: DataFrame, maxIter: Int): DataFrame = {
    // The pair source is typically an expensive dedup pipeline (LSH band
    // join + exact verify), and the symmetric-edge union below scans it
    // TWICE — materialize it once first (the per-branch-recompute trap).
    val p = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    p.count()
    val edges = p.select(col("a").as("src"), col("b").as("dst"))
      .union(p.select(col("b").as("src"), col("a").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint(true, StorageLevel.MEMORY_ONLY)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      // min over own label and every neighbor's label
      val next = edges
        .join(labels, edges("dst") === labels("id"))
        .select(col("src").as("id"), col("lbl"))
        .union(labels)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .localCheckpoint(true, StorageLevel.MEMORY_ONLY)
      val changed = next.as("n").join(labels.as("o"), Seq("id"))
        .where(col("n.lbl") =!= col("o.lbl")).limit(1).count()
      // the old round's checkpoint blocks are reclaimed by the
      // ContextCleaner once this reassignment drops the last reference
      // (Dataset.unpersist would be a no-op — localCheckpoint blocks are
      // not CacheManager entries)
      labels = next
      done = changed == 0
      iter += 1
    }
    edges.unpersist()
    p.unpersist()
    // silent non-convergence would assign MULTIPLE canonicals to one
    // component and deduplicate() would keep extra copies — fail loudly
    require(done, s"label propagation did not converge within $maxIter " +
      "rounds (component diameter exceeds the cap); raise maxIter or " +
      "switch to large-star/small-star contraction for chain-shaped graphs")
    labels
  }

  /** Alternating large-star/small-star contraction. Each round:
    *  - LARGE-STAR: every node u connects its strictly-larger neighbors
    *    to m(u) = min(Γ(u) ∪ {u}) — long chains fold toward their minimum
    *    exponentially instead of one hop per round;
    *  - SMALL-STAR: on the resulting larger→smaller edges, every node
    *    connects its smaller neighbors (and itself) to its minimum
    *    neighbor — flattening partial stars.
    * The fixpoint is a star per component centered on the component min;
    * O(log² n) rounds on ANY graph shape (the paper's bound), each round
    * two shuffles. Same loud non-convergence contract as min-label. */
  private def clustersLargeStar(pairs: DataFrame, maxIter: Int): DataFrame = {
    val p = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    p.count()
    val vertices = p.select(col("a").as("id"))
      .union(p.select(col("b").as("id"))).distinct()
      .localCheckpoint(true, StorageLevel.MEMORY_ONLY)
    // canonical directed edges larger→smaller (self-loops dropped)
    var edges = p.select(greatest(col("a"), col("b")).as("u"),
        least(col("a"), col("b")).as("v"))
      .where(col("u") =!= col("v")).distinct()
      .localCheckpoint(true, StorageLevel.MEMORY_ONLY)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      // LARGE-STAR over the symmetric view: (v, m(u)) for v ∈ Γ(u), v > u.
      // m(u) ≤ u < v keeps the larger→smaller invariant.
      val sym = edges.select(col("u"), col("v"))
        .union(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val ls = sym.join(mins, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v")).distinct()
      // SMALL-STAR on larger→smaller edges: with m(u) = min smaller
      // neighbor, emit (v, m(u)) for the other smaller neighbors and
      // (u, m(u)) for u itself.
      val mins2 = ls.groupBy(col("u")).agg(min(col("v")).as("m"))
      val next = ls.join(mins2, "u").where(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(mins2.select(col("u"), col("m").as("v")))
        .distinct()
        .localCheckpoint(true, StorageLevel.MEMORY_ONLY)
      val grew = next.except(edges).limit(1).count()
      val shrank = edges.except(next).limit(1).count()
      edges = next
      done = grew == 0 && shrank == 0
      iter += 1
    }
    require(done, s"large-star contraction did not converge within " +
      s"$maxIter rounds; raise maxIter")
    // fixpoint = stars: each non-root points at its component min once
    // (groupBy-min guards the invariant anyway); roots label themselves
    val lbl = vertices.join(
        edges.groupBy(col("u")).agg(min(col("v")).as("parent"))
          .withColumnRenamed("u", "id"),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("parent"), col("id")).as("lbl"))
    p.unpersist()
    lbl
  }

  /** `docs` minus every non-canonical member of each dup cluster — the
    * deduplicated corpus. One anti-join against the cluster table. */
  def deduplicate(docs: DataFrame, pairs: DataFrame,
      key: String = "doc_id"): DataFrame = {
    val drop = clusters(pairs).where(col("id") =!= col("lbl"))
      .select(col("id").as(key))
    docs.join(drop, Seq(key), "left_anti")
  }
}
