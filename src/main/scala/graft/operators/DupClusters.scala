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
  * round and analysis time explodes. On a multi-executor cluster prefer
  * `spark.sparkContext.setCheckpointDir` + reliable `checkpoint` so a
  * lost executor cannot drop a round's partitions mid-loop.
  */
object DupClusters {

  /** Cluster assignment for every vertex that appears in `pairs`:
    * (id, cluster_id) with cluster_id = min id of the component.
    * `pairs` columns `a`/`b` are one undirected edge per row. */
  def clusters(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
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
      .localCheckpoint(true)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      // min over own label and every neighbor's label
      val next = edges
        .join(labels, edges("dst") === labels("id"))
        .select(col("src").as("id"), col("lbl"))
        .union(labels)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .localCheckpoint(true)
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

  /** `docs` minus every non-canonical member of each dup cluster — the
    * deduplicated corpus. One anti-join against the cluster table. */
  def deduplicate(docs: DataFrame, pairs: DataFrame,
      key: String = "doc_id"): DataFrame = {
    val drop = clusters(pairs).where(col("id") =!= col("lbl"))
      .select(col("id").as(key))
    docs.join(drop, Seq(key), "left_anti")
  }
}
