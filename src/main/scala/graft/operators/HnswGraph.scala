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
  *    scale) — decidable by every executor without coordination.
  *  - EDGES at layer 0 start from a [[signCells]] sign-projection
  *    bucket equi-join whose bucket COUNT grows with the corpus
  *    ([[bitsFor]] — never the quadratic a FIXED bucket count degrades
  *    to), then converge toward the true kNN graph through NN-descent
  *    refinement rounds (Dong et al. 2011) and are made NAVIGABLE by
  *    the RNG-rule diversity prune (the essence of HNSW's
  *    select-neighbors heuristic: a candidate covered by a
  *    better-ranked one is redundant — measured at the x10 corpus as
  *    recall@5 0.25 → 0.91 at the same degree). Upper layers use exact
  *    within-layer selection over their bounded populations. All
  *    stages linear in the corpus: n·(2M)² scored pairs per round,
  *    vectors broadcast (never shuffled per pair).
  *  - SEARCH lands by scoring EVERY layer-≥1 member exactly (bounded
  *    ≤ ~768 forever — the true landing optimum, where a fixed entry
  *    node measured recall collapse at x10) and then runs `hops0`
  *    fixed beam hops over the layer-0 graph: each hop is
  *    frontier ∪ frontier⋈adjacency re-ranked by similarity, frontier
  *    materialized per hop (a lazy chain doubles the plan per hop).
  *    Fixed hop counts make the search path deterministic (and
  *    SQL-replayable) where true HNSW's "until no improvement" is
  *    data-dependent; recall floors vs the s01 brute answer are pinned
  *    in `HnswGraphSpec`, and the recall/cost curves live in
  *    BASELINE.md §r9.
  *
  * The graph is (layer, src, dst) rows — the persisted form follows the
  * s10 "index once, probe many" pattern one step further (r11): the
  * standing table is PARTITIONED by (layer, pt = src mod [[ptFor]]),
  * so the landing's layer-≥1 scan prunes statically and a serving
  * micro-batch's hop joins prune dynamically to the frontier's
  * partitions ([[search]]'s `ptMod`/`serving`) — a 5-query batch reads
  * a corpus-size-independent slice of the adjacency instead of all
  * n·m rows per hop. Appends stay delta-sized end-to-end via the
  * standing membership satellites ([[writeMembership]] /
  * [[appendWithMembership]]).
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

  /** Src-hash partition count for the standing graph table: the
    * smallest power of two holding ~32 sources per partition, clamped
    * to [64, 65536]. This is the s10 law applied to the graph — the
    * serving read bound: a search hop expands a frontier of ≤ |Q|·ef0
    * nodes, and with the adjacency partitioned on `pt = src mod P` the
    * hop's scan prunes to the frontier's partitions (statically from
    * the driver-resident frontier in [[serveBeam]]; via DPP from the
    * frontier's re-stated bound in the batch path's `ptTagged`) —
    * ≤ |Q|·ef0·(n/P)·m ≈ |Q|·ef0·32·m rows,
    * CONSTANT in the corpus size once the law is past its clamp, where
    * the r10 layout re-scanned all n·m rows per hop per micro-batch
    * (the measured exp-1.75 residual). The 65536 cap keeps directory
    * counts sane (at 1 B vectors: ~15 k sources/partition, still a
    * ~0.05 % read for a 5-query batch). */
  def ptFor(n: Long): Long = {
    var p = 64L
    while (p * 32 < n && p < 65536L) p <<= 1
    p
  }

  /** Write the layered adjacency as THE standing graph layout: a
    * managed parquet table partitioned by (layer, pt) with
    * `pt = src mod ptFor(n)` — layer dirs give the landing's
    * layer-≥1 scan static pruning; pt dirs give the hop joins dynamic
    * pruning from the frontier ([[search]]'s `ptMod`). One file per
    * partition (the hash-repartition before a partitioned write —
    * [[PartitionedLayout]]'s discipline). The BUILD-TIME corpus size is
    * persisted as a `meta` commit-dir marker: [[append]] and the
    * streaming server re-derive bitsFor/strideFor/mFor/ptFor from the
    * size the STANDING graph was built from, never from the grown
    * corpus at restart (a re-derivation crossing a doubling/stride
    * boundary would append edges inconsistent with the standing
    * layers). */
  def writeGraph(graph: DataFrame, table: String, n: Long): Unit = {
    val spark = graph.sparkSession
    SnapshotMerge.dropTableAndLocation(spark, table)
    writeGraphData(graph, table, ptFor(n))
    TableCommit.writeMarker(spark, table, "meta", n.toString)
  }

  private def writeGraphData(graph: DataFrame, table: String,
      p: Long): Unit =
    graph
      .withColumn("pt", pmod(col("src"), lit(p)).cast("int"))
      .repartition(col("layer"), col("pt"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("layer", "pt")
      .format("parquet").saveAsTable(table)

  // DECISION (r11, closed r12): no pt-partitioned CORPUS layout — the
  // variant (per-hop scoring joins pruning the vector table like the
  // hops prune the adjacency) was built, measured, and REMOVED in r11:
  // at P = ptFor(n) the vector partitions are ~32 rows, and seven
  // per-search planned scans cost more than the bytes they save on
  // anything but cold object storage (SCALING_r11.json
  // serving_read_corpus_variant: x100 serve 22.3 s vs 5.9 s
  // adjacency-only). A correctness hazard compounds the cost: a corpus
  // written under an OLDER ptFor(n) than the graph's would make a
  // single-modulus pruned join silently drop score rows, so any
  // re-introduction would need a per-side persisted modulus marker.
  // r12 made the question moot for the serving path: the driver-beam
  // serve attaches vectors to ≤ |Q|·ef0·2m candidate ids per hop via a
  // broadcast semi-join, so the corpus scan it would have pruned is
  // already one columnar pass per hop with no shuffle — the remaining
  // benefit is cold-storage byte savings only, which local measurement
  // cannot justify. CLOSED: not worth it at any measured tier; revisit
  // only if a future object-store deployment shows the per-hop corpus
  // scan itself (not planning) dominating serve latency.

  /** (vec_id, cid) with 2 rows per vector — the layer-0 candidate
    * constraint: cid is the h-bit string of sign(round(dot(v, dir_i),6))
    * over the h lowest-id vectors as projection directions, plus the
    * multiprobe bucket with the LEAST-CONFIDENT bit (min |dot|, ties →
    * lowest i) flipped. Deterministic, SQL-replayable, and balanced on
    * centered embeddings (measured: 20k vectors / h=10 → max bucket 71).
    * Scale shape: one broadcast of h direction vectors + a per-vector
    * aggregate — no shuffle keyed by anything bigger than vec_id. */
  def signCells(e: DataFrame, h: Int): DataFrame =
    signCellsWith(e.where(col("vec_id") < h)
      .select(col("vec_id").as("i"), col("v").as("dv")), e)

  /** [[signCells]] with the projection directions supplied explicitly
    * — the delta-batch form: an appender derives cells for its few
    * vectors against the PERSISTED direction table
    * ([[dirsTable]]) without touching the corpus at all. */
  def signCellsWith(dirs: DataFrame, e: DataFrame): DataFrame = {
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

  /** Cosine-score candidate pairs (src, dst) against `e` = (vec_id, v,
    * nrm): (src, dst, sim) with the engine's canonical 6-rounding and
    * id-deterministic downstream tie-breaks. */
  private def scorePairs(e: DataFrame, pairs: DataFrame): DataFrame =
    // e is BROADCAST on both sides: the pair list is n·(2M)² rows of
    // two longs while the vector table is ~0.5 KB/row — shuffling
    // vectors per PAIR measured the x10→x30 probe edge at 8.7×/3×
    // (spill territory), where the broadcast keeps the shuffle at
    // pair-id width. The broadcast is also this form's CEILING: raw
    // 64-dim float64 rows cost ~0.5 KB, so the table outgrows a
    // multi-GB executor broadcast around ~10⁷ vectors — past that,
    // [[build]]'s `sq8 = true` broadcasts 8× smaller byte codes
    // ([[sq8Codes]]), and the next rung is s04's PQ codes (8–16 B/row,
    // multi-billion) under the same pairs-stay-two-longs shape
    pairs
      .join(broadcast(e.select(col("vec_id").as("src"),
        col("v").as("sv"), col("nrm").as("sn"))), "src")
      .join(broadcast(e.select(col("vec_id").as("dst"),
        col("v").as("dv"), col("nrm").as("dn"))), "dst")
      .select(col("src"), col("dst"),
        round(dot(col("sv"), col("dv")) / (col("sn") * col("dn")), 6)
          .as("sim"))

  /** SQ8 byte-code table for [[build]]'s pair scoring — the
    * broadcast-ceiling escape. Unit vectors floor-quantize per
    * dimension against corpus [mn, mx] bounds (the FAISS
    * ScalarQuantizer shape s07 uses as its storage tier), stored as
    * `array<tinyint>`: ~64 B/row against ~512 B of raw doubles, so the
    * broadcast that caps [[scorePairs]] reaches an ~8× larger corpus
    * before executor memory does. The bounds are inlined as plan
    * LITERALS (2·dims doubles — driver-trivial at any corpus size), so
    * the broadcast ships only vec_id + bytes. Quantized scoring makes
    * edge SELECTION approximate (~1 LSB per dimension); the stored
    * graph is ids only and [[search]] re-scores with exact vectors, so
    * the only effect is which edges exist — `HnswSq8BuildSpec`
    * measures the recall cost and pins determinism. */
  final case class Sq8(codes: DataFrame, mn: Array[Double],
      mx: Array[Double])

  def sq8Codes(e: DataFrame): Sq8 = {
    val unit = e.select(col("vec_id"),
      expr("transform(v, x -> x / nrm)").as("u"))
    val r = unit.select(posexplode(col("u")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .orderBy(col("i"))
      .collect()
    val mn = r.map(_.getDouble(1))
    val mx = r.map(_.getDouble(2))
    val coded = unit
      .withColumn("mnb", array(mn.toIndexedSeq.map(lit): _*))
      .withColumn("mxb", array(mx.toIndexedSeq.map(lit): _*))
      .withColumn("code", expr(
        """transform(sequence(1, size(u)), i ->
          |  cast(CASE WHEN element_at(mxb, i) > element_at(mnb, i)
          |       THEN cast(floor((element_at(u, i) - element_at(mnb, i))
          |                       * 255.0D
          |                       / (element_at(mxb, i)
          |                          - element_at(mnb, i)))
          |            as bigint) - 128L
          |       ELSE -128L END as tinyint))""".stripMargin))
      .select(col("vec_id"), col("code"))
    Sq8(coded, mn, mx)
  }

  /** PQ code table for [[build]]'s pair scoring — the rung past
    * [[Sq8]] on the broadcast-ceiling ladder (raw ~512 B/vector →
    * sq8 ~64 B → PQ codes [[PqM]]·4 bits ≈ 4–8 B semantic payload):
    * the s04 product quantizer applied to construction. Unit vectors
    * split into [[PqM]] subspaces; each subspace stores the id of its
    * nearest of [[PqEntries]] codebook entries (subspace slices of the
    * PqEntries lowest-id unit vectors — deterministic, no trained
    * k-means, the s04 rule), encoded exactly as s04 encodes (rounded
    * L2² argmin, ties → lowest entry). Pair scoring needs NO vector
    * arithmetic at all: all PqM·PqEntries² subspace dot products are
    * precomputed on the driver and inlined as one plan literal
    * (PqM·PqEntries² = 16·256 doubles ≈ 32 KB), so a pair's cosine is
    * PqM table lookups — the
    * asymmetric-distance trick with both sides quantized. `rnrm` (the
    * reconstruction norm) is stored per code so the cosine denominator
    * is one multiply. Edge selection gets coarser than sq8's ~1 LSB —
    * `HnswPqBuildSpec` measures the recall cost the same way. */
  final case class Pq(codes: DataFrame, subDots: Seq[Seq[Seq[Double]]])

  /** PQ subspaces: 64-dim embeddings → 4 dims per subspace, 16 entries
    * (4-bit codes) — 16 codes/vector, the 8–16 B/vector point of s04's
    * design range (BASELINE.md records trained 16×16 as the shipped
    * config). Codebooks are TRAINED ([[PqLloydRounds]]
    * Lloyd rounds per subspace): entries that are arbitrary vector
    * slices (s04's untrained rule, fine for its demonstration query)
    * measured build recall@5 0.572 on the 6k generated corpus — the
    * reconstruction error swamps edge selection — while two trained
    * rounds recover it (`HnswPqBuildSpec` pins the floor). Training is
    * cross-run DETERMINISTIC without any oracle contortions: slices
    * quantize to floor(x·1e6) integer-valued doubles, member sums are
    * exact (order-free), and mean = exact-sum / exact-count is one
    * deterministic division — the s08 replay argument, reused for
    * determinism rather than replay (a pq build has no SQL oracle; the
    * spec pins two builds identical instead). */
  val PqM = 16
  val PqEntries = 16
  val PqLloydRounds = 2

  def pqCodes(e: DataFrame): Pq = {
    import org.apache.spark.sql.expressions.{Window => W}
    val spark = e.sparkSession
    import spark.implicits._
    val unit = e.select(col("vec_id"),
      expr("transform(v, x -> x / nrm)").as("u"))
    val dim = unit.select(size(col("u"))).head().getInt(0)
    require(dim % PqM == 0, s"dim $dim not divisible by $PqM subspaces")
    val subDim = dim / PqM
    // quantized subspace slices — the training domain (scale cancels
    // in every cosine downstream, so nothing converts back)
    val qsub = unit.select(col("vec_id"),
        explode(sequence(lit(0), lit(PqM - 1))).as("m"),
        col("u"))
      .select(col("vec_id"), col("m"),
        expr(s"transform(slice(u, m * $subDim + 1, $subDim), " +
          "x -> cast(floor(x * 1000000D) as double))").as("qsv"))
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val l2 = round(aggregate(
      zip_with(col("qsv"), col("cvb"), (x, y) => (x - y) * (x - y)),
      lit(0.0d), (a, t) => a + t), 6)
    def assignTo(entries: DataFrame): DataFrame =
      qsub.join(broadcast(entries), "m")
        .select(col("vec_id"), col("m"), col("qsv"), col("pcid"),
          l2.as("d2"))
        .withColumn("rn", row_number().over(
          W.partitionBy(col("vec_id"), col("m"))
            .orderBy(col("d2").asc, col("pcid").asc)))
        .where(col("rn") === 1)
    var entries = qsub.where(col("vec_id") < PqEntries)
      .select(col("m"), col("vec_id").cast("int").as("pcid"),
        col("qsv").as("cvb"))
    for (_ <- 1 to PqLloydRounds)
      entries = assignTo(entries)
        .groupBy(col("m"), col("pcid"))
        .agg(graft.functions.ArrayElementSum.column(col("qsv")).as("s"),
          count(lit(1)).cast("double").as("c"))
        .select(col("m"), col("pcid"),
          expr("transform(s, x -> x / c)").as("cvb"))
        .localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // trained entries to the driver (M·16 rows), for the subspace-dot
    // literal; missing pcids (emptied clusters) keep a zero row so the
    // literal stays rectangular — codes never reference them
    val entryRows = entries.collect()
      .map(r => (r.getInt(0), r.getInt(1),
        r.getSeq[Double](2).toArray)).toSeq
    val cb = Array.fill(PqM, PqEntries)(Array.fill(subDim)(0.0d))
    entryRows.foreach { case (m, j, v) => cb(m)(j) = v }
    val subDots: Seq[Seq[Seq[Double]]] = (0 until PqM).map(m =>
      (0 until PqEntries).map(i => (0 until PqEntries).map { j =>
        var s = 0.0d; var d = 0
        while (d < subDim) { s += cb(m)(i)(d) * cb(m)(j)(d); d += 1 }
        s
      }))
    val code = assignTo(entries)
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("m"), col("pcid"))))
        .as("mc"))
      .select(col("vec_id"),
        expr("transform(mc, x -> cast(x.pcid as int))").as("code"))
    val L = typedLit(subDots)
    val codes = code.withColumn("rnrm",
      sqrt(aggregate(sequence(lit(0), lit(PqM - 1)), lit(0.0d),
        (acc, m) => acc + element_at(element_at(element_at(L, m + 1),
          element_at(col("code"), m + 1) + 1),
          element_at(col("code"), m + 1) + 1))))
    Pq(codes, subDots)
  }

  /** [[scorePairs]] over PQ codes: identical join shape, zero vector
    * bytes anywhere — sims are [[PqM]] lookups into the inlined
    * subspace-dot literal per pair. */
  private def scorePairsPq(q: Pq, pairs: DataFrame): DataFrame = {
    val L = typedLit(q.subDots)
    def adc(cs: String, cd: String) =
      aggregate(sequence(lit(0), lit(PqM - 1)), lit(0.0d),
        (acc, m) => acc + element_at(element_at(element_at(L, m + 1),
          element_at(col(cs), m + 1) + 1),
          element_at(col(cd), m + 1) + 1))
    pairs
      .join(broadcast(q.codes.select(col("vec_id").as("src"),
        col("code").as("sc"), col("rnrm").as("sn2"))), "src")
      .join(broadcast(q.codes.select(col("vec_id").as("dst"),
        col("code").as("dc"), col("rnrm").as("dn2"))), "dst")
      .select(col("src"), col("dst"),
        round(adc("sc", "dc") / (col("sn2") * col("dn2")), 6).as("sim"))
  }

  /** [[scorePairs]] over byte codes: identical join shape (pairs stay
    * two longs across the shuffle; the CODE table broadcasts), sims on
    * per-pair dequantized units — cosine directly, the normalization
    * already happened before quantizing. The dequantize-and-dot is ONE
    * codegen'd expression ([[graft.plans.Sq8Dot]]) — the r13 x300
    * campaign measured the interpreted higher-order form below pricing
    * each scored pair ~3–5× a primitive double dot (two `transform`
    * lambdas allocating a 64-double array per PAIR side), which left
    * the 600k-vector build unfinished at session cutoff; the codegen
    * kernel is bit-identical (`HnswSq8BuildSpec` pins it against
    * [[scorePairsSq8Interp]]) and keeps the hot loop primitive. */
  private[operators] def scorePairsSq8(q: Sq8,
      pairs: DataFrame): DataFrame =
    pairs
      .join(broadcast(q.codes.select(col("vec_id").as("src"),
        col("code").as("sc"))), "src")
      .join(broadcast(q.codes.select(col("vec_id").as("dst"),
        col("code").as("dc"))), "dst")
      .select(col("src"), col("dst"),
        round(graft.plans.Sq8Dot(col("sc"), col("dc"),
          q.mn.toIndexedSeq, q.mx.toIndexedSeq), 6).as("sim"))

  /** The interpreted higher-order-function form [[scorePairsSq8]]
    * replaced — kept ONLY as the parity reference `HnswSq8BuildSpec`
    * pins the codegen kernel against (same association, same fold
    * order, bit-identical results). Not on any production path. */
  private[operators] def scorePairsSq8Interp(q: Sq8,
      pairs: DataFrame): DataFrame = {
    def dq(c: String) =
      s"""transform(sequence(1, size($c)), i ->
         |  element_at(mnb, i)
         |  + (cast(element_at($c, i) as double) + 128.0D)
         |    * (element_at(mxb, i) - element_at(mnb, i)) / 255.0D)"""
        .stripMargin
    pairs
      .join(broadcast(q.codes.select(col("vec_id").as("src"),
        col("code").as("sc"))), "src")
      .join(broadcast(q.codes.select(col("vec_id").as("dst"),
        col("code").as("dc"))), "dst")
      .withColumn("mnb", array(q.mn.toIndexedSeq.map(lit): _*))
      .withColumn("mxb", array(q.mx.toIndexedSeq.map(lit): _*))
      .select(col("src"), col("dst"),
        round(dot(expr(dq("sc")), expr(dq("dc"))), 6).as("sim"))
  }

  /** Build the layered adjacency (layer, src, dst) for embeddings
    * `e` = (vec_id, v, nrm). `cells` = (vec_id, cid) with up to 2 rows
    * per vector ([[signCells]] — primary + multiprobe sign bucket)
    * seeds layer-0 candidate generation; `stride` is the [[strideFor]]
    * level rule the build and later appends must share.
    *
    * Layer 0 is REFINED by `nnRounds` rounds of NN-descent (Dong et
    * al. 2011, "Efficient k-nearest neighbor graph construction"):
    * each round scores every neighbor-of-a-neighbor (over the
    * SYMMETRIZED current graph) as a candidate and keeps the top `m`
    * per node. The sign buckets alone stop producing a navigable graph
    * as the corpus grows — [[bitsFor]] keeps per-bucket population
    * bounded, so at x10 (20k vectors, 512 buckets) bucket-mates are
    * only near-identicals and the r9 sweep measured recall@5 COLLAPSING
    * to 0.13 however deep the beam schedule; NN-descent converges the
    * edges toward the true kNN graph (the multiprobe flip-cell edges
    * connect Hamming-adjacent buckets, so candidates propagate
    * globally), restoring local navigability at ~n·(2m)² scored pairs
    * per round — linear in the corpus, each round one self-join + one
    * window, lineage truncated per round (the DupClusters pattern).
    *
    * DISK is the round's binding resource, not CPU: one unsliced round
    * is a single job whose ~n·(2m)² id-pair rows stay live across ~3
    * consecutive shuffles (expansion join, candidate distinct, scoring
    * window), so peak scratch is ~3× the pair volume — the r13 x300
    * build (600k vectors, m=46, ~5·10⁹ pairs/round) overran this
    * sandbox's ~80 GB free twice, with zstd shuffle compression
    * already on. [[slicesFor]] therefore splits every round (and the
    * diversity prune) by `src % k` into k SEQUENTIAL jobs of ≤ ~8·10⁸
    * pairs each: a node's pool depends only on its own candidate rows,
    * so per-slice top-2m per src is BIT-IDENTICAL to the global
    * computation (`HnswGraphSpec` pins slices=1 ≡ slices=4 adjacency
    * equality), each slice's shuffle files become garbage at its
    * checkpoint boundary, and peak scratch is bounded by the slice
    * size however large the corpus — the same bounded-scratch shape a
    * 1000-executor cluster needs so NN-descent scratch never exceeds
    * a fixed multiple of the slice, not of the corpus. `slices = 0`
    * (default) derives k from n·(2m)²; pass an explicit count only in
    * probes.
    *
    * `sq8 = true` swaps the refinement/prune scorer for the byte-code
    * form ([[sq8Codes]]/[[scorePairsSq8]]): same dataflow, the
    * broadcast ships ~64 B/vector instead of ~512 B — the path for a
    * corpus whose raw vector table outgrows executor memory. Default
    * false: s11/s12's oracle replays exact scoring.
    *
    * CONCURRENCY: a SLICED build (the `slices > 1` path — any corpus
    * past ~10⁵ vectors at its law degree) must be the only work on its
    * SparkContext. The per-slice scratch release diffs the context's
    * GLOBAL shuffle/broadcast id sets, so a concurrent query's shuffle
    * created inside a slice window is released under it (FetchFailed →
    * recompute — slow) and a concurrent query's BROADCAST is destroyed
    * under it, which FAILS that query outright (a destroyed broadcast
    * throws on re-read, it is not recomputed). Two graft builds on one
    * JVM serialize automatically (a JVM-wide lock guards the sliced
    * path); a concurrent non-build query cannot be detected from here
    * and is the caller's contract: run sliced builds as dedicated
    * offline jobs, exactly as a production index build would be
    * scheduled anyway.
    *
    * SIZE CEILING: [[slicesFor]] fails loudly past 64 slices —
    * n·(2m)² > 64·[[PoolPairsPerSlice]], ~4·10¹⁰ candidate pairs,
    * roughly n ≈ 2.4 M vectors at that size's law degree (m≈56 —
    * checked at slice derivation, BEFORE any multi-hour work starts).
    * Past it, one slice no longer fits the per-slice scratch bound
    * this sandbox measured (~15-25 GB at 8·10⁸ pairs). An ~x1000 run
    * (2 M vectors) needs either [[PoolPairsPerSlice]] raised to match
    * the host's real scratch (a cluster's executor-aggregate scratch
    * is 100-1000× this sandbox's — the constant, not the design, is
    * sandbox-sized), or two-level slicing (slice the EXPANSION side
    * `dst % j` within each src slice, bounding pairs by n·(2m)²/(k·j)
    * at the cost of j scans of the src slice) — design recorded here
    * so the wall has a plan behind the error message; implement only
    * when an x1000 probe is actually attempted. */
  def build(e: DataFrame, cells: DataFrame, m: Int = DefaultM,
      stride: Long = 8L, nnRounds: Int = DefaultNnRounds,
      sq8: Boolean = false, pq: Boolean = false,
      slices: Int = 0): DataFrame = {
    val scorer: DataFrame => DataFrame =
      if (pq) { val q = pqCodes(e); p => scorePairsPq(q, p) }
      else if (sq8) { val q = sq8Codes(e); p => scorePairsSq8(q, p) }
      else p => scorePairs(e, p)
    // `slices = 0` derives the count from an e.count() action — over an
    // UNPERSISTED caller frame that recomputes the whole upstream
    // lineage once per build, even when the answer is 1 slice. Callers
    // should pass a persisted frame (every call site in this repo does)
    // or an explicit `slices` count.
    val sl = if (slices > 0) slices else slicesFor(e.count(), m)
    // two sliced builds on one context would release each other's
    // scratch (global-diff tracking) — serialize them; the unsliced
    // path touches no global state and runs concurrently as before
    if (sl > 1) slicedBuildLock.synchronized(
      buildGraph(e, cells, m, stride, nnRounds, scorer, sl))
    else buildGraph(e, cells, m, stride, nnRounds, scorer, sl)
  }

  /** JVM-wide gate for the sliced-build path — see [[build]]'s
    * CONCURRENCY note. */
  private val slicedBuildLock = new Object

  private def buildGraph(e: DataFrame, cells: DataFrame, m: Int,
      stride: Long, nnRounds: Int, scorer: DataFrame => DataFrame,
      sl: Int): DataFrame = {
    val tracker = new ScratchTracker(e.sparkSession.sparkContext)
    def ckpt(df: DataFrame): DataFrame = df.localCheckpoint(true,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Sliced checkpoints go through the tracker so each slice job's
    // shuffle files and broadcasts are deterministically released the
    // moment its checkpoint exists, and the returned persisted-RDD ids
    // let the round loop drop superseded pools deterministically too —
    // peak scratch is bounded by the SLICE, not the corpus, enforced
    // rather than GC-dependent (this replaced r13's System.gc() nudge;
    // the release also destroys each slice's corpus broadcasts, which
    // removes the r13-measured raw-rung driver OOM: ~300 accumulated
    // ~300 MB broadcasts awaiting GC at the x300 geometry — the raw
    // scorer's remaining ceiling is one broadcast's size, ~0.5 KB·n,
    // past ~10⁷ vectors → pass sq8/pq). The unsliced path keeps the
    // plain eager checkpoint: one job, nothing to release mid-build,
    // byte-identical to the r13 behavior. Single-build assumption: a
    // CONCURRENT query's brand-new shuffle landing inside a slice
    // window would be released under it (recomputed via FetchFailed —
    // correct, slow); build is a heavyweight offline job.
    def ckptT(df: DataFrame): (DataFrame, Set[Int]) =
      if (sl <= 1) (ckpt(df), Set.empty[Int]) else tracker.ckpt(df)
    // run `f` over each src-residue slice as its OWN eagerly
    // checkpointed job, then union: all rows of one src share a slice,
    // so any per-src computation (top-2m window, crowd prune) is exact
    def bySlice(src: DataFrame, f: DataFrame => DataFrame)
        : (DataFrame, Set[Int]) =
      if (sl <= 1) ckptT(f(src))
      else {
        val parts = (0 until sl).map(i =>
          tracker.ckpt(f(src.where(pmod(col("src"), lit(sl)) === i))))
        (parts.map(_._1).reduce(_ unionByName _),
          parts.iterator.flatMap(_._2).toSet)
      }
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
    // as topM but without the layer tag and with a caller-chosen keep
    // count (the NN-descent pool is 2m wide)
    def topM2(pairs: DataFrame, keep: Int): DataFrame =
      pairs
        .select(col("src"), col("dst"),
          round(dot(col("sv"), col("dv")) / (col("sn") * col("dn")), 6)
            .as("sim"))
        .distinct()
        .withColumn("rk", row_number().over(byS))
        .where(col("rk") <= keep)
        .select(col("src"), col("dst"), col("sim"))
    // layer 0 seed: candidates share a coarse cell (equi-join on cid)
    val memb = e.join(cells, "vec_id")
      .select(col("cid"), col("vec_id"), col("v"), col("nrm"))
    val p0 = memb.as("a").join(memb.as("b"),
        col("a.cid") === col("b.cid") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("a.v").as("sv"),
        col("a.nrm").as("sn"), col("b.vec_id").as("dst"),
        col("b.v").as("dv"), col("b.nrm").as("dn"))
    // l0 carries a 2m-wide (src, dst, sim, rk) pool between rounds —
    // the final round's pool feeds the diversity prune below, and the
    // FULL pool symmetrizes and expands: an expansion from only the
    // top-m edges was tried and measured recall@5 0.912 → 0.735 at
    // x10 (the mid-pool candidates are exactly where diversity comes
    // from), while the pair volume is fine once scorePairs broadcasts
    // the vectors (the x30 superlinearity was vector bytes per pair,
    // not pair count)
    var (l0, l0Ids) = ckptT(topM2(p0, 2 * m)
      .withColumn("rk", row_number().over(byS)))
    for (_ <- 1 to nnRounds) {
      // sym is re-read by every slice's expansion join (the bc side is
      // always the FULL symmetrized graph — only the ab side slices),
      // so materialize it once per round as its own checkpointed job;
      // unsliced builds keep it lazy (plan-level exchange reuse already
      // dedups the self-joined distinct inside the single round job)
      val symRaw = l0.select(col("src"), col("dst"))
        .unionByName(l0.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
      val (sym, symIds) =
        if (sl <= 1) (symRaw, Set.empty[Int]) else tracker.ckpt(symRaw)
      // sym holds the previous pool's edges — the old pool's checkpoint
      // blocks feed nothing else (rounds re-score every kept pair), so
      // drop them now instead of waiting for the collector
      if (sl > 1) tracker.free(l0Ids)
      val (nl0, nIds) = bySlice(sym, ab => {
        val non = ab.as("ab").join(sym.as("bc"),
            col("ab.dst") === col("bc.src") &&
              col("ab.src") =!= col("bc.dst"))
          .select(col("ab.src").as("src"), col("bc.dst").as("dst"))
        scorer(ab.unionByName(non).distinct())
          .withColumn("rk", row_number().over(byS))
          .where(col("rk") <= 2 * m)
      })
      if (sl > 1) tracker.free(symIds)
      l0 = nl0
      l0Ids = nIds
    }
    // DIVERSITY (RNG-rule) prune — the piece that makes a proximity
    // graph NAVIGABLE rather than merely accurate (Malkov's
    // select-neighbors heuristic / DiskANN's alpha-prune, in the
    // similarity domain): within each node's ranked candidate pool,
    // drop candidate a when some better-ranked candidate b already
    // covers it (sim(a, b) > sim(src, a)) — a's direction is redundant
    // with b's, and keeping it crowds out the mid-similarity edge a
    // greedy walk needs to make progress. Measured at the x10 corpus:
    // recall@5 0.25 → 0.9+ at the same degree budget. Cost: pool is
    // 2m per node → ≤ n·(2m)²/2 pair scorings, linear in the corpus.
    val ranked = l0 // (src, dst, sim, rk) — rk maintained through rounds
    // sliced like the rounds: crowding is per-src (both crowd sides
    // share src), so a src slice prunes exactly as the global job
    // would; the covered-pair scoring dedups within its slice only —
    // a (adst, bdst) pair crowding srcs in two slices is scored twice,
    // same sim both times (bounded re-compute, zero correctness edge).
    // The PRUNED parts' checkpoint blocks stay persisted — the returned
    // plan reads them; only the superseded pool is dropped below.
    val (prunedL0, _) = bySlice(ranked, rs => {
      val crowd = rs.as("a").join(rs.as("b"),
          col("a.src") === col("b.src") && col("b.rk") < col("a.rk"))
        .select(col("a.src").as("src"), col("a.dst").as("adst"),
          col("a.sim").as("sima"), col("b.dst").as("bdst"))
      val covered = scorer(crowd
          .select(col("adst").as("src"), col("bdst").as("dst")).distinct())
        .withColumnRenamed("sim", "simab")
        .withColumnRenamed("src", "adst")
        .withColumnRenamed("dst", "bdst")
      val pruned = crowd.join(covered, Seq("adst", "bdst"))
        .where(col("simab") > col("sima"))
        .select(col("src"), col("adst").as("dst")).distinct()
      rs.join(pruned, Seq("src", "dst"), "left_anti")
        .withColumn("rk2", row_number().over(Window
          .partitionBy(col("src")).orderBy(col("rk"))))
        .where(col("rk2") <= m)
        .select(col("src"), col("dst"), col("sim"))
    })
    if (sl > 1) tracker.free(l0Ids)
    l0 = prunedL0
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
    val fwd = l0.select(lit(0).as("layer"), col("src"), col("dst"),
        col("sim"))
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
    * `m` best same-layer neighbors among the standing corpus members AND
    * ITS OWN BATCH sharing one of its 2 sign-projection cells (the
    * build-time rule — within-batch linking means two near-dup arrivals
    * in one batch find each other without waiting for a rebuild), and
    * for every chosen edge the REVERSE edge (standing → new) is appended
    * too — without it a new node is unreachable from the entry-point
    * descent. Reverse edges onto one standing node are pruned to its
    * `m` best PER BATCH (sims are in hand for exactly the new edges, so
    * this is the strongest prune an append-only write can apply — the
    * 2m M_max invariant over the union of old + new edges needs the old
    * edges' sims, i.e. a rewrite), so a standing node's out-degree grows
    * by at most m per append until [[compact]] re-prunes globally —
    * bounded-per-batch, documented, and spec-pinned. The append
    * serializes through [[TableCommit]] — concurrent appenders get the
    * protocol exception. `cells` must cover corpus ∪ delta (vec_id,
    * cid — 2 rows each). */
  def append(table: String, corpus: DataFrame, delta: DataFrame,
      cells: DataFrame, m: Int = DefaultM,
      stride: Long = 8L): Long = {
    val spark = corpus.sparkSession
    // the partition modulus is the STANDING table's, persisted at
    // build/compact time — deriving it from the grown corpus would
    // scatter delta edges across partitions the searches don't probe
    val ptMod = TableCommit.readMarker(spark, table, "meta") match {
      case Some(v) => ptFor(v.toLong)
      case None => throw new IllegalStateException(
        s"graph table '$table' has no build-meta marker — it was not " +
          "written by HnswGraph.writeGraph/compact; rebuild it before " +
          "appending")
    }
    // layer 0: delta probes standing ∪ batch members of its coarse cells
    val dMemb = delta.join(cells, "vec_id")
      .select(col("cid"), col("vec_id"), col("v"), col("nrm"))
    val cMemb = corpus.join(cells, "vec_id")
      .select(col("cid"), col("vec_id"), col("v"), col("nrm"))
    val bMemb = cMemb.unionByName(dMemb)
    // the DELTA side broadcasts: append is the streaming path, so the
    // delta is micro-batch-sized while the standing corpus is the big
    // table — without the hint the cid equi-join is free to shuffle
    // the CORPUS's vectors once per batch (the same defect class the
    // r9 x30 probe caught in build, and exactly what a small-stats
    // streaming frame fails to auto-broadcast). With it, standing
    // vectors are only SCANNED; no vector column crosses a shuffle
    // (pinned by `QueryMetricsSpec`). A corpus-sized backfill delta
    // belongs in [[build]]/[[compact]], not here
    val p0 = broadcast(dMemb.as("a")).join(bMemb.as("b"),
        col("a.cid") === col("b.cid") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("a.v").as("sv"),
        col("a.nrm").as("sn"), col("b.vec_id").as("dst"),
        col("b.v").as("dv"), col("b.nrm").as("dn"))
    def upper(layer: Int): DataFrame = {
      val dm = delta.where(levelOf(col("vec_id"), stride) >= layer)
      val cm = corpus.unionByName(delta)
        .where(levelOf(col("vec_id"), stride) >= layer)
      // both sides are small (delta-sized / stride-bounded ≤ ~768) —
      // broadcast the delta side so the nested-loop stays shuffle-free
      broadcast(dm.as("a")).join(cm.as("b"),
          col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("src"), col("a.v").as("sv"),
          col("a.nrm").as("sn"), col("b.vec_id").as("dst"),
          col("b.v").as("dv"), col("b.nrm").as("dn"))
    }
    appendEdges(table, p0, upper, m, ptMod)()
  }

  /** Satellite tables of a standing graph, keyed off the graph table's
    * name: cell membership (cid-hash-partitioned), the bounded
    * layer-≥1 member set, and the sign-projection direction vectors. */
  def membTable(table: String): String = s"${table}_memb"
  def upperTable(table: String): String = s"${table}_upper"
  def dirsTable(table: String): String = s"${table}_dirs"

  /** Materialize the standing corpus's cell membership as a
    * `mb = hash(cid) mod ptFor(n)`-partitioned table, plus the two tiny
    * satellites appends need (layer-≥1 members; direction vectors) —
    * the design BASELINE.md §r10 named: with these standing,
    * [[appendWithMembership]] touches NO corpus-wide frame at all. One
    * corpus⋈cells pass at write time — the same pass [[append]] paid
    * per BATCH (its 1.2n-capped vector exchange), now paid once per
    * build/compact. Membership is 2 rows per vector (primary +
    * multiprobe cell), so the table is ~2× the corpus vector bytes —
    * at 100 TB that is a big table, which is exactly why it is
    * partitioned by the cell hash: a delta batch's probe prunes to its
    * own cells' partitions (DPP from the broadcast delta), reading
    * ~|delta cells|·(2n/P) rows instead of 2n. */
  def writeMembership(e: DataFrame, cells: DataFrame, table: String,
      n: Long): Unit = {
    val spark = e.sparkSession
    val p = ptFor(n)
    val stride = strideFor(n)
    SnapshotMerge.dropTableAndLocation(spark, membTable(table))
    e.join(cells, "vec_id")
      .select(col("cid"), col("vec_id"), col("v"), col("nrm"))
      .withColumn("mb", pmod(hash(col("cid")), lit(p)).cast("int"))
      .repartition(col("mb"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("mb")
      .format("parquet").saveAsTable(membTable(table))
    SnapshotMerge.dropTableAndLocation(spark, upperTable(table))
    e.where(levelOf(col("vec_id"), stride) >= 1)
      .select(col("vec_id"), col("v"), col("nrm"))
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet").saveAsTable(upperTable(table))
    SnapshotMerge.dropTableAndLocation(spark, dirsTable(table))
    e.where(col("vec_id") < bitsFor(n))
      .select(col("vec_id"), col("v"))
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet").saveAsTable(dirsTable(table))
    TableCommit.writeMarker(spark, membTable(table), "meta", n.toString)
  }

  /** [[append]] against the STANDING satellites instead of a corpus
    * frame — the production streaming form: the delta derives its own
    * cells from the persisted directions, probes only its cells'
    * membership partitions (DPP from the broadcast delta — the same
    * pruning shape as [[search]]'s hops), takes upper-layer candidates
    * from the bounded standing upper table, and absorbs itself into
    * the satellites inside the same commit so the NEXT batch probes
    * it. Per-batch cost is delta-sized everywhere: no corpus-wide
    * scan, no corpus-wide vector exchange (`QueryMetricsSpec` caps the
    * vector-carrying shuffle records at a small multiple of |delta|,
    * where [[append]]'s membership attach was capped at 1.2·n). */
  def appendWithMembership(table: String, delta: DataFrame,
      m: Int = DefaultM, stride: Long = 8L): Long = {
    val spark = delta.sparkSession
    val mt = membTable(table)
    val nGraph = TableCommit.readMarker(spark, table, "meta") match {
      case Some(v) => v.toLong
      case None => throw new IllegalStateException(
        s"graph table '$table' has no build-meta marker")
    }
    val nMemb = TableCommit.readMarker(spark, mt, "meta") match {
      case Some(v) => v.toLong
      case None => throw new IllegalStateException(
        s"membership table '$mt' has no build-meta marker — write it " +
          "with HnswGraph.writeMembership before appending")
    }
    // Both markers carry the n the artifact was LAST built from, and
    // every healthy flow writes them with the same value (build,
    // streaming bootstrap, compact+rebuild). A crash between a
    // compact's graph swap and its writeMembership rebuild leaves them
    // disagreeing — and nothing downstream would notice: appends would
    // link with stale cells/stride, a silent quality bleed. Fail loudly
    // instead; recovery is re-running writeMembership from the current
    // corpus (what the crashed step was about to do).
    if (nGraph != nMemb) throw new IllegalStateException(
      s"graph '$table' (build-meta n=$nGraph) and its membership " +
        s"satellites (n=$nMemb) disagree — a compact likely crashed " +
        "between the graph swap and the satellite rebuild; re-run " +
        "HnswGraph.writeMembership from the current corpus before " +
        "appending")
    val ptMod = ptFor(nGraph)
    val p = ptFor(nMemb)
    // cross-session appends — and a compact's writeMembership rebuild
    // of all three satellites — leave this session's listings stale
    spark.catalog.refreshTable(mt)
    spark.catalog.refreshTable(upperTable(table))
    spark.catalog.refreshTable(dirsTable(table))
    val dirs = spark.table(dirsTable(table))
      .select(col("vec_id").as("i"), col("v").as("dv"))
    val dCells = signCellsWith(dirs, delta)
    val dMemb = delta.join(dCells, "vec_id")
      .select(col("cid"), col("vec_id"), col("v"), col("nrm"))
      .withColumn("mb", pmod(hash(col("cid")), lit(p)).cast("int"))
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the probe side RECOMPUTES mb rather than reusing dMemb's column:
    // the tautological (pmod ≥ 0) bound is the selectivity marker the
    // partition-pruning rule needs (see search's ptTagged), and over
    // the stored column the checkpoint's own constraint makes it
    // provably redundant — PruneFilters then deletes it and DPP never
    // fires (measured: the probe scan lost its dynamicpruning filter)
    val probeCells = dMemb.select(col("cid")).distinct()
      .withColumn("mb", pmod(hash(col("cid")), lit(p)).cast("int"))
      .where(col("mb") >= 0)
    val sMatched = spark.table(mt)
      .join(broadcast(probeCells), Seq("mb", "cid"))
      .select(col("cid"), col("vec_id"), col("v"), col("nrm"))
    val bMemb = sMatched
      .unionByName(dMemb.drop("mb"))
    val p0 = broadcast(dMemb.as("a")).join(bMemb.as("b"),
        col("a.cid") === col("b.cid") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("a.v").as("sv"),
        col("a.nrm").as("sn"), col("b.vec_id").as("dst"),
        col("b.v").as("dv"), col("b.nrm").as("dn"))
    def upper(layer: Int): DataFrame = {
      val dm = delta.where(levelOf(col("vec_id"), stride) >= layer)
      val cm = spark.table(upperTable(table))
        .unionByName(delta.select(col("vec_id"), col("v"), col("nrm"))
          .where(levelOf(col("vec_id"), stride) >= 1))
        .where(levelOf(col("vec_id"), stride) >= layer)
      broadcast(dm.as("a")).join(cm.as("b"),
          col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("src"), col("a.v").as("sv"),
          col("a.nrm").as("sn"), col("b.vec_id").as("dst"),
          col("b.v").as("dv"), col("b.nrm").as("dn"))
    }
    appendEdges(table, p0, upper, m, ptMod) { () =>
      // absorb the delta into the satellites — same epoch as the edges
      dMemb.repartition(col("mb"))
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .partitionBy("mb")
        .format("parquet").saveAsTable(mt)
      val du = delta.select(col("vec_id"), col("v"), col("nrm"))
        .where(levelOf(col("vec_id"), stride) >= 1)
      if (!du.isEmpty)
        du.coalesce(1).write
          .mode(org.apache.spark.sql.SaveMode.Append)
          .format("parquet").saveAsTable(upperTable(table))
      spark.catalog.refreshTable(mt)
      spark.catalog.refreshTable(upperTable(table))
    }
  }

  /** Shared tail of [[append]]/[[appendWithMembership]]: forward top-m
    * per delta node, per-batch reverse prune, and the committed
    * partition-spec-matching write (delta edges land as one new file
    * per TOUCHED partition — non-touched partitions keep their files
    * byte-identical; the per-partition file count degrades until the
    * next [[compact]] rebuild restores one file each, exactly like
    * IvfIndex.append's small-files story). `alsoCommit` runs inside
    * the same commit — the membership path appends its satellite
    * tables there so one epoch covers the whole batch. */
  private def appendEdges(table: String, p0: DataFrame,
      upper: Int => DataFrame, m: Int, ptMod: Long)(
      alsoCommit: () => Unit = () => ()): Long = {
    val spark = p0.sparkSession
    val byS = Window.partitionBy(col("src"))
      .orderBy(col("sim").desc, col("dst"))
    def topM(pairs: DataFrame): DataFrame =
      pairs
        .select(col("src"), col("dst"),
          round(dot(col("sv"), col("dv")) / (col("sn") * col("dn")), 6)
            .as("sim"))
        .distinct()
        .withColumn("rk", row_number().over(byS))
        .where(col("rk") <= m)
        .drop("rk")
    val fwd = topM(p0).withColumn("layer", lit(0))
      .unionByName(topM(upper(1)).withColumn("layer", lit(1)))
      .unionByName(topM(upper(2)).withColumn("layer", lit(2)))
    // reverse edges: a popular standing node would otherwise take one
    // reverse edge per delta admirer — keep only its m best this batch
    val rev = fwd.select(col("layer"), col("dst").as("src"),
        col("src").as("dst"), col("sim"))
      .groupBy(col("layer"), col("src"), col("dst"))
      .agg(max(col("sim")).as("sim"))
      .withColumn("rk", row_number().over(Window
        .partitionBy(col("layer"), col("src"))
        .orderBy(col("sim").desc, col("dst"))))
      .where(col("rk") <= m)
    val edges = fwd.select(col("layer"), col("src"), col("dst"))
      .unionByName(rev.select(col("layer"), col("src"), col("dst")))
      .distinct()
    val base = TableCommit.epochOf(spark, table)
    TableCommit.commit(spark, table, base) {
      edges
        .withColumn("pt", pmod(col("src"), lit(ptMod)).cast("int"))
        .repartition(col("layer"), col("pt"))
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .partitionBy("layer", "pt")
        .format("parquet").saveAsTable(table)
      alsoCommit()
      base + 1
    }
  }

  /** Rebuild-compact the standing graph `table` from the CURRENT corpus
    * (standing ∪ everything appended since the last build) — the
    * [[IvfIndex.compact]] equivalent a standing serving index needs:
    * [[append]] leaves one file per touched bucket per batch, lets
    * standing out-degrees drift up to m per batch past the 2m M_max
    * prune, and never links old nodes TOWARD new regions; a periodic
    * rebuild restores the exact batch construction (file count back to
    * one per bucket, every degree re-pruned to ≤ 2m, edges globally
    * re-ranked). The heavy build runs OUTSIDE the [[TableCommit]] lock
    * against a stage table; only the O(1) catalog swap + epoch bump are
    * inside — a concurrent [[append]] racing the swap loses cleanly with
    * the protocol exception (its edges were based on the superseded
    * graph). `baseEpoch` is the epoch the rebuild's CORPUS READ was
    * based on (pass what you read before deriving `e`; defaults to the
    * epoch at call time) — an append landing between that read and this
    * commit fails the CAS, because the rebuilt graph would silently
    * drop the appended vectors. Returns the new epoch. */
  def compact(table: String, e: DataFrame, cells: DataFrame, m: Int = DefaultM,
      stride: Long = 8L, baseEpoch: Option[Long] = None,
      n: Long = -1L): Long = {
    val spark = e.sparkSession
    val base = baseEpoch.getOrElse(TableCommit.epochOf(spark, table))
    val nVecs = if (n >= 0) n else e.count()
    val stage = s"${table}_c${java.lang.Long.toHexString(System.nanoTime())}"
    writeGraphData(
      build(e, cells, m = m, stride = stride), stage, ptFor(nVecs))
    // The cleanup catch must distinguish WHERE the failure happened: before
    // the standing table is dropped (CAS loss, pre-drop failure), the stage
    // table is garbage — drop it. But once dropTableAndLocation has deleted
    // the standing table, the stage table is the ONLY surviving copy of the
    // graph: dropping it on a failed RENAME would destroy both copies and
    // force a full rebuild from the corpus. Leave it and surface its name.
    @volatile var standingDropped = false
    try {
      TableCommit.commit(spark, table, base) {
        // dropTableAndLocation, not bare DROP: from a FRESH JVM the
        // in-memory catalog never registered the standing table, so
        // DROP is a no-op while its warehouse directory survives and
        // fails the stage rename with LOCATION_ALREADY_EXISTS (caught
        // by the table-compact CLI smoke test)
        SnapshotMerge.dropTableAndLocation(spark, table)
        standingDropped = true
        spark.sql(s"ALTER TABLE `$stage` RENAME TO `$table`")
        // RENAME on a PARTITIONED managed table moves the directory but
        // the in-memory catalog keeps each partition's OLD location —
        // scans then list the vanished stage dirs and read empty
        // (measured: post-swap count 0, warehouse files intact).
        // Re-discover the partitions from the moved directory.
        spark.sql(s"MSCK REPAIR TABLE `$table`")
        // the rebuilt graph's constants are derived from nVecs — record
        // it so later appends/servers share them (the one legitimate
        // point where a standing graph's constants may change). A crash
        // between the rename and this write leaves the PREVIOUS build's
        // marker standing; the next compact heals it.
        TableCommit.writeMarker(spark, table, "meta", nVecs.toString)
        base + 1
      }
    } catch {
      case t: Throwable if standingDropped =>
        throw new IllegalStateException(
          s"compact of `$table` failed AFTER the standing table was " +
            s"dropped; the rebuilt graph survives as `$stage` — rename it " +
            s"to `$table` manually (ALTER TABLE RENAME) to recover", t)
      case t: Throwable =>
        spark.sql(s"DROP TABLE IF EXISTS `$stage`")
        throw t
    }
  }

  /** Default beam schedule — ONE definition shared by [[search]], the
    * s11 query, its SQL oracle generator, and the streaming server, so
    * the Scala path and the DuckDB replay cannot drift. Chosen from the
    * measured recall/cost curve (`HnswSweep`, recorded in BASELINE.md):
    * recall@5 vs the s01 brute answer at sf0.01 is 0.94 here, vs 0.75
    * at the r8 schedule (efUpper 4 / ef0 16 / 3 layer-0 hops). */
  val DefaultEfUpper = 8
  val DefaultEf0 = 64
  val DefaultHops0 = 6
  /** Graph degree parameter (HNSW's M): forward edges per node after
    * the diversity prune; total degree bounded by 2M. 16 is the real
    * HNSW's default neighborhood for this dimensionality — the r9 x10
    * sweep measured recall@5 0.62 at M=8 vs 0.91 at M=16 under the
    * same schedule. Shared with the SQL oracle generator like the
    * schedule constants below. */
  val DefaultM = 16
  /** Corpus-scaled graph degree — the SUBLINEAR search-width law. At a
    * FIXED degree, recall under the fixed beam schedule decays as the
    * corpus grows (measured on the generated corpus, default schedule:
    * M=16 → 0.912 @ 20k but 0.786 @ 60k), and recovering it through
    * beam width alone needs ef0 ∝ n (64 @ 20k → 160 @ 60k — the r9
    * sweep), which converges the per-query scoring on brute force.
    * Degree is the lever that does NOT grow with n: the x30 sweep
    * measured, at the same default schedule over 60k vectors, recall@5
    * 0.786 / 0.923 / 0.970 at M = 16 / 24 / 32 with scored-nodes/query
    * 6.8k / 9.6k / 12.2k — per-query cost ∝ M (the hop expansion is
    * ef0·2M candidates, corpus-independent), so growing M with log n
    * keeps recall at the floor while scored/query grows O(log n),
    * sublinear where a beam-width law is linear.
    *
    * The rule: M = 16 + [[MPerDoubling]] per corpus DOUBLING above
    * 16 Ki vectors, with the step DOUBLING (a second [[MPerDoubling]]
    * per doubling) past the [[MSuperAfter]]-th doubling (~524 Ki
    * vectors). Integer-only, like [[bitsFor]]/[[strideFor]], so Spark
    * and the SQL oracle derive the identical M with no float edge:
    * 500 → 16, 20k → 21, 60k → 26, 200k → 36, 524k → 41, 600k → 51,
    * 1 B → 151 — degree, build cost per node, and scored-nodes/query
    * all O(log n) (the superlinear tail doubles the CONSTANT, not the
    * growth class). The base step is 5, not 4, because the x100 sweep
    * measured the 0.9 floor BETWEEN the two laws at 200k vectors:
    * M=32 (step 4) → recall@5 0.891 / 12.6k scored per query, M=36
    * (step 5) → 0.918 / 14.0k (BASELINE.md §r10; brute at that size
    * scores 200k, so the search still touches only ~7% of the corpus
    * and the fraction SHRINKS as n grows).
    *
    * The superlinear tail is MEASURED, not styled (r14→r15): at step
    * 5 flat, the floor holds through 200k (0.961/0.936/0.915 at
    * 20k/60k/200k) and READS 0.8818 AT 600k (m=46) — erosion
    * attributed to the law's slope, not the sq8 build scoring (an x30
    * quantized build read 0.938 vs raw 0.936 — SCALING_r14.json
    * `x30_sq8_attribution`); the erosion per doubling steepens past
    * 200k (−0.011/doubling before, −0.017 after). The named m=51
    * probe (r15, SCALING_r15.json `x300_degree_law_m51`) measured
    * recall@5 0.9081 at 600k with serving still corpus-flat
    * (2.65 s/5-query trigger) — the floor restored at exactly the
    * doubled step, so the law takes it: +10/doubling past b=5,
    * measured at b=6, conservative extrapolation beyond (recall is
    * monotone in M at fixed schedule — every sweep since r9; a
    * future >1M probe can only relax it). Graphs at ≤524k vectors
    * derive the SAME degree as before — every standing graph and
    * recorded law point below b=6 is untouched by construction. */
  val MPerDoubling = 5
  /** Corpus doublings (above 16 Ki) after which [[mFor]]'s step
    * doubles — the r15 measured break point of the flat-step law. */
  val MSuperAfter = 5
  def mFor(n: Long): Int = {
    var b = 0
    while ((16384L << b) < n) b += 1
    DefaultM + MPerDoubling * b +
      MPerDoubling * math.max(0, b - MSuperAfter)
  }
  /** NN-descent refinement rounds in [[build]] — shared with the SQL
    * oracle generator like the schedule constants above. */
  val DefaultNnRounds = 3

  /** Scratch-disk bound for one [[build]] NN-descent slice job, in
    * candidate id-pair rows. One round holds ~3 consecutive shuffles of
    * its pair volume live at once (expansion join, candidate distinct,
    * scoring window), so peak scratch ≈ 3 · pairs · ~15 B compressed;
    * 8·10⁸ keeps a slice's footprint ~15-25 GB — the r13 x300 build
    * (5·10⁹ pairs/round unsliced) twice overran ~80 GB free before
    * slicing, and fit with room at 7 slices. */
  val PoolPairsPerSlice = 800000000L

  /** Slice count for [[build]]'s NN-descent rounds and diversity prune
    * over `n` vectors at degree `m`: enough src-residue slices that one
    * slice's ~n·(2m)²/k candidate pairs stay under
    * [[PoolPairsPerSlice]]. The count is capped at 64 (past that,
    * per-job overhead beats scratch savings), and the cap is LOUD: a
    * corpus needing more slices would silently exceed the per-slice
    * pair bound and erode the scratch guarantee the slicing exists for
    * (the r13 verdict's missing #4), so it fails with instructions
    * instead of overrunning the disk. Integer-only like the sibling
    * laws. */
  def slicesFor(n: Long, m: Int): Int = {
    val pairs = n * (2L * m) * (2L * m)
    val k = (pairs + PoolPairsPerSlice - 1) / PoolPairsPerSlice
    require(k <= 64L,
      s"slicesFor(n=$n, m=$m) needs $k src-residue slices, past the " +
        s"64-slice cap: one capped slice would hold ~${pairs / 64} " +
        s"candidate pairs > PoolPairsPerSlice ($PoolPairsPerSlice) and " +
        "the per-slice scratch-disk bound would silently erode. Raise " +
        "PoolPairsPerSlice (re-measuring a slice's scratch footprint) " +
        "or the cap before building a corpus this large on one node; " +
        "on a real cluster, raise PoolPairsPerSlice to match executor-" +
        "aggregate scratch")
    math.max(1L, k).toInt
  }

  /** Deterministic scratch release for [[build]]'s sliced jobs — the
    * replacement for the r13 `System.gc()` slice-boundary nudge. Each
    * method is a thin composition over [[org.apache.spark.graft.SparkScratch]]
    * (the `private[spark]` bridge); see its scaladoc for the safety
    * argument (released state is dead by the checkpoint construction;
    * a pathological re-read degrades to recompute, never corruption). */
  private final class ScratchTracker(sc: org.apache.spark.SparkContext) {
    import org.apache.spark.graft.SparkScratch
    /** Run `body` (Spark jobs ENDING in an eager checkpoint), then
      * synchronously delete the shuffle files and broadcast blocks
      * those jobs registered. */
    def released[T](body: => T): T = {
      val s0 = SparkScratch.shuffleIds(sc)
      val b0 = SparkScratch.broadcastIds(sc)
      val out = body
      SparkScratch.release(sc,
        SparkScratch.shuffleIds(sc) -- s0,
        SparkScratch.broadcastIds(sc) -- b0)
      out
    }
    /** Eager MEMORY_AND_DISK localCheckpoint with its job's scratch
      * released, returning the checkpointed frame plus the persisted-
      * RDD ids backing it — so [[free]] can drop the blocks the moment
      * the last consumer has materialized. */
    def ckpt(df: DataFrame): (DataFrame, Set[Int]) = {
      val r0 = sc.getPersistentRDDs.keySet.toSet
      val out = released(df.localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      (out, sc.getPersistentRDDs.keySet.toSet -- r0)
    }
    /** Unpersist checkpoint blocks by RDD id. Only call once every
      * consumer of those frames has materialized — a localCheckpoint's
      * lineage is truncated, so freed blocks are UNRECOVERABLE: a
      * consumer that lazily reads a freed frame fails at runtime
      * ("checkpoint block not found"), it does not recompute. The
      * invariant is enforced by call-site ordering in [[buildGraph]]'s
      * round loop (each free names the frame it retires and why it is
      * dead); any future edit that adds a LAZY reader of a prior
      * round's pool or sym (e.g. reusing them after the loop) must
      * move or drop the corresponding free. `HnswGraphSpec`'s sliced-
      * build spec reads the returned graph after the loop, covering
      * the happy path. */
    def free(ids: Set[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id)
        .foreach(_.unpersist(blocking = false)))
  }

  /** Descend `qs` = (q, qv, qn) through the graph. Returns
    * (q, rk, nb, sim) — top-`k` neighbors per query, self excluded.
    *
    * LANDING: the upper layers are uniform id-samples whose populations
    * [[strideFor]] bounds ABSOLUTELY (layer 1 ≤ ~768 at any corpus
    * size), so the search scans every layer-≥1 member EXACTLY and
    * keeps the top `efUpper` per query — the true layer-1 optimum, at
    * a broadcast-sized O(768·|Q|) cost forever. Beam-navigating the
    * upper layers instead (the r8 design, entry pinned at node 0) was
    * measured COLLAPSING at the x10 corpus: recall@5 0.13, because a
    * fixed hop budget cannot cover a growing graph distance from one
    * fixed entry. True HNSW buys global navigation with an unbounded
    * until-no-improvement walk; a fixed-depth replayable schedule buys
    * it with the exact scan of the bounded sample instead.
    *
    * FINAL MILE: `hops0` fixed beam hops over the NN-descent-refined
    * layer-0 graph, beam `ef0` — deterministic, SQL-replayable; the
    * recall/cost curve over (efUpper, ef0, hops0) is recorded by
    * `HnswSweep` (BASELINE.md) and the defaults sit at its knee
    * (recall@5 ≥ 0.9 vs the s01 brute answer).
    *
    * Each hop's frontier is MATERIALIZED (eager memory-only
    * localCheckpoint): a hop reads its frontier twice (the expansion
    * join and the re-rank union), so a fully lazy chain doubles the
    * plan per hop — 2^hops copies of the scan by the final re-rank,
    * and driver-side planning, not execution, dominated the r8 s11 row
    * (measured: search seconds DOUBLED per added hop with lazy plans;
    * flat per hop materialized). Frontiers are k·ef-row tables —
    * driver-adjacent scale — and checkpoint blocks free with the
    * ContextCleaner once the result is consumed. */
  /** Measurement collector for [[search]] (dev/probe only — `HnswSweep`
    * and the metrics specs): raw counts of candidate rows fed to the
    * scoring kernel, landing + per hop. Filled by extra count() actions
    * on the (checkpointed) frontiers, so production searches pass None
    * and pay nothing. scored-nodes/query is THE sublinearity number the
    * scale story rests on: a graph index whose per-query scoring
    * converges to the corpus size is brute force with extra steps. */
  final class SearchStats {
    var queries: Long = 0L
    var landingScored: Long = 0L
    var hopScored: List[Long] = Nil
    /** Adjacency rows a partition-pruned hop SCAN reads (partition
      * granularity — what DPP admits), one entry per hop; equals the
      * full layer-0 row count when `ptMod` is 0. scoredPerQuery is the
      * per-query sublinearity number; this is the per-BATCH scan bound
      * the r10 layout lacked (it re-read all n·m rows per hop however
      * small the query batch). */
    var hopAdjRead: List[Long] = Nil
    def scoredPerQuery: Double =
      if (queries == 0) 0.0
      else (landingScored + hopScored.sum).toDouble / queries
  }

  /** `ptMod` > 0 enables partition pruning against a [[writeGraph]]
    * layout: each hop's frontier derives `pt = node mod ptMod` and the
    * expansion equi-join includes it, so the scan of the (layer, pt)-
    * partitioned adjacency prunes to the frontier's partitions.
    * `serving = true` switches to the DRIVER-BEAM form ([[serveBeam]])
    * — correct only for micro-batch-sized query sets (the streaming
    * server's case: the |Q|·ef0-row frontier and the ≤ |Q|·ef0·2m
    * scored candidates per hop round-trip through the driver); a
    * corpus-sized probe set must leave it false. */
  def search(adj: DataFrame, e: DataFrame, qs: DataFrame,
      efUpper: Int = DefaultEfUpper, ef0: Int = DefaultEf0, k: Int = 5,
      hops0: Int = DefaultHops0, stats: Option[SearchStats] = None,
      ptMod: Long = 0L, serving: Boolean = false)
      : DataFrame =
    if (serving) serveBeam(adj, e, qs, efUpper, ef0, k, hops0, stats,
      ptMod)
    else searchBatch(adj, e, qs, efUpper, ef0, k, hops0, stats, ptMod)

  private def searchBatch(adj: DataFrame, e: DataFrame, qs: DataFrame,
      efUpper: Int, ef0: Int, k: Int, hops0: Int,
      stats: Option[SearchStats], ptMod: Long): DataFrame = {
    val sim = round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6)
    val qVecs = qs.select(col("q"), col("qv"), col("qn"))
    // frontiers are SLIM — (q, node, sim), three narrow columns. The
    // r10 shape carried (qv, qn) in every frontier row, so each hop
    // moved the 0.5 KB query vector through the expansion join, the
    // vector attach AND the dedup shuffle — at x30 that is ~15 GB of
    // qv bytes per hop where the ids are ~0.5 GB (the residual behind
    // the batch row's exp 1.75/1.64). Vectors now meet a candidate
    // exactly once: ids dedup first, then one attach of (v, nrm) by
    // node and (qv, qn) by q scores the genuinely-new candidates.
    // qVecs is explicitly BROADCAST: the candidate intermediate
    // (q, node, v, nrm) is |Q|·ef0·2m rows CARRYING the 0.5 KB corpus
    // vector, and without the hint the q-join silently degrades to a
    // shuffle join the moment the query-vector frame crosses the 10 MB
    // auto-broadcast default — |Q| ≈ 20k at 64 dims — exchanging tens
    // of GB of vector bytes per hop (measured at x100, |Q| = 28.6k:
    // 263.8 → 97.4 s for the full search, the x30→x100 slope dropping
    // from 1.87 to below the n·m work law; the r11 slim-frontier fix
    // removed exactly this class from the frontier side, this is the
    // query side of the same bug). Contract: the
    // query set must be broadcastable (|Q|·~0.5 KB ≤ executor memory)
    // — true for every serving batch and probe set; a corpus-ALL
    // query join is the declared-quadratic brute tier's job (s01).
    def score(ids: DataFrame): DataFrame =
      ids.join(e.withColumnRenamed("vec_id", "node"), "node")
        .join(broadcast(qVecs), "q")
        .select(col("q"), col("node"), sim.as("sim"))
    // Rank a candidate frame to its top `ef` per query, DEDUPING
    // (q, node) first: duplicate vec_id rows in `e` (the streaming
    // ingest's documented at-least-once replay window leaves
    // byte-identical corpus rows standing until the next compact)
    // would otherwise score the same (q, node) twice and occupy two
    // beam ranks — serving one neighbor twice and evicting a genuine
    // one. Replayed rows are byte-identical → identical sims → the
    // duplicates are ADJACENT in the rank window's own (sim desc,
    // node) order, so a lag-filter inside that window dedups with ZERO
    // extra exchange (a dropDuplicates would re-shuffle every hop's
    // candidates by (q, node) — measured +0.4 s on the sf0.1 s11 row).
    def topEf(cand: DataFrame, ef: Int): DataFrame = {
      val w = Window.partitionBy(col("q"))
        .orderBy(col("sim").desc, col("node"))
      cand
        .withColumn("prevn", lag(col("node"), 1).over(w))
        .where(col("prevn").isNull || col("prevn") =!= col("node"))
        .drop("prevn")
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= ef)
        .drop("rk")
    }
    // the frontier reaching a hop is an eager localCheckpoint, which
    // truncates its lineage to a bare LogicalRDD — erasing the
    // `rk <= ef` Filter that made it selective. Spark's partition-
    // pruning rule only builds a DPP subquery when the build side has
    // a selective predicate, so re-state the (tautological — pmod is
    // non-negative) bound the checkpoint erased: the frontier IS ef-
    // bounded, the optimizer just can no longer see why.
    def ptTagged(f: DataFrame): DataFrame = f
      .withColumn("pt", pmod(col("node"), lit(ptMod)).cast("int"))
      .where(col("pt") >= 0)
    def hop(frontier: DataFrame, layer: Int, ef: Int): DataFrame = {
      val adj0 = adj.where(col("layer") === layer)
      val fIds = frontier.select(col("q"), col("node"))
      val expanded =
        if (ptMod > 0) {
          ptTagged(fIds)
            .join(adj0.select(col("pt"), col("src").as("node"),
              col("dst")), Seq("pt", "node"))
            .select(col("q"), col("dst").as("node"))
        } else fIds
          .join(adj0.select(col("src").as("node"), col("dst")),
            Seq("node"))
          .select(col("q"), col("dst").as("node"))
      stats.foreach { st =>
        st.hopScored ::= expanded.count()
        st.hopAdjRead ::= (if (ptMod > 0) {
          val pts = frontier
            .select(pmod(col("node"), lit(ptMod)).cast("int").as("pt"))
            .distinct().collect().map(r => Int.box(r.getInt(0))).toSeq
          adj0.where(col("pt").isin(pts: _*)).count()
        } else adj0.count())
      }
      // already-ranked frontier members keep their sims; only the
      // genuinely-new candidate ids pay the vector attach
      val newIds = expanded.distinct()
        .join(fIds, Seq("q", "node"), "left_anti")
      val cand = score(newIds)
        .unionByName(frontier.select(col("q"), col("node"), col("sim")))
      topEf(cand, ef)
        .localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    // landing: exact scan of the bounded layer-≥1 sample (see
    // scaladoc). Node 0 is unioned unconditionally: a corpus smaller
    // than ~2·stride has layer-1 MEMBERS but no layer-1 EDGES, so the
    // adjacency-derived set alone would be empty and the search would
    // silently return nothing — with the entry node the layer-0 hops
    // still cover such tiny graphs (and this matches the SQL oracle,
    // whose landing scans the stride rule's members directly)
    val l1 = adj.where(col("layer") >= 1)
      .select(col("src")).distinct().withColumnRenamed("src", "node")
      .unionByName(e.where(col("vec_id") === 0)
        .select(col("vec_id").as("node")))
      .distinct()
    stats.foreach { st =>
      st.queries = qs.count()
      st.landingScored = st.queries * l1.count()
    }
    val entry = topEf(score(qs.select(col("q")).join(l1)), efUpper)
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val g = (1 to hops0).foldLeft(entry)((f, _) => hop(f, 0, ef0))
    val w = Window.partitionBy(col("q"))
      .orderBy(col("sim").desc, col("node"))
    g.where(col("node") =!= col("q"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("q"), col("rk"), col("node").as("nb"), col("sim"))
  }

  /** The DRIVER-BEAM serving search — [[searchBatch]]'s semantics for
    * micro-batch-sized query sets, restructured so a small serve batch
    * pays a small CONSTANT instead of the batch path's orchestration
    * floor. The r11 pruned serving path already read a corpus-size-
    * independent ~318k adjacency rows per hop, yet a 5-query batch
    * still cost a flat 5.2–6.3 s at every scale (SCALING_r11.json
    * `serving_read`): 7 sequential Spark jobs, each with an eager
    * localCheckpoint barrier, a window exchange+sort, and a freshly
    * planned partitioned scan. The beam state is |Q|·ef0 slim rows —
    * driver-resident scale — so this form keeps it ON the driver:
    *
    *  - the frontier is a local relation (no checkpoint, no lineage
    *    blow-up — each hop's plan starts from a literal);
    *  - the frontier's partitions are known on the driver, so the hop
    *    scan is STATICALLY pruned (`pt IN (...)` partition filter at
    *    plan time — stronger than the r11 broadcast-DPP, which needed
    *    the `pt >= 0` PruneFilters workaround to fire at all);
    *  - per hop, the pruned adjacency scan ⋈ broadcast(frontier)
    *    expansion feeds one columnar corpus pass ⋈ broadcast(query
    *    vectors) — zero shuffle exchanges — and the beam re-rank
    *    (sim desc, node asc — row_number's exact order) runs in
    *    driver memory. For |Q| ≤ 16 the expansion pairs detour
    *    through the driver and dedup against a cross-hop seen set
    *    before scoring (halves scored rows; measured win at 1–5
    *    queries); larger batches keep the expansion fused as a
    *    broadcast subtree (the explicit detour measured 21.5 → 37.6 s
    *    at |Q| = 513 — LocalRelation plan bloat + single-threaded
    *    boxed dedup);
    *  - hops stop at the beam FIXPOINT (no unseen expansion pair, or
    *    an unchanged frontier) instead of always running the hops0
    *    schedule — provably the identical answer (see the in-body
    *    proof sketch), typically saving 1–2 of the 6 scheduled hops;
    *  - duplicate (q, node) rows — possible only from the ingest
    *    replay window's byte-identical corpus duplicates — dedup on
    *    the driver, mirroring [[searchBatch]]'s score() dedup.
    *
    * Sims are computed by the SAME Spark expressions (6-rounded
    * cosines) and ranked with the same comparator, so results are
    * bit-identical to [[searchBatch]] — pinned by `HnswPruneSpec` and
    * `ScaleRecallGateSpec`. Scale contract: |Q| must be micro-batch-
    * sized (the streaming server's case); per-hop driver traffic is
    * |Q|·ef0·2m id-width rows (~37 KB/query), and the cluster-side
    * work per hop is one pruned adjacency scan + one corpus pass —
    * corpus-size-independent reads once [[ptFor]]'s law passes its
    * clamp, exactly as the r11 layout measured.
    *
    * DECISION RECORD — the ~1.4 s single-query floor (r13). The
    * per-trigger wall at |Q| ≤ 5 is ~13 sequential tiny Spark
    * executions (landing id-collect + landing score + per hop an
    * expand and a score) at ~0.1 s scheduling+planning each; the work
    * inside them is microseconds at micro-batch scale. Measured this
    * round on the standing x100 graph (SCALING_r13.json):
    * the cross-hop seen-set dedup HALVED scored candidates
    * (scored_per_q 14.3k → 7.3k) without moving the wall; the beam
    * fixpoint rarely arrives before the 6-hop schedule ends at this
    * geometry (new candidates keep appearing, they just keep losing);
    * and the explicit expansion detour is a measured REGRESSION past
    * |Q| ≈ 32 (21.5 → 37.6 s at 513 — hence the hybrid). Going below
    * ~1 s therefore means deleting EXECUTIONS, not work: score hops on
    * the driver against a node→(v, nrm) cache (6 of the 13 executions
    * gone, plus the landing pair via the upper satellite). That needs
    * (a) a bit-exact driver replica of the 6-rounded cosine and
    * (b) a corpus-version invalidation contract the serve() API
    * deliberately does not have (the corpus is a caller-owned
    * DataFrame; only the caller knows when the table underneath
    * changed — appends would silently serve stale vectors). The next
    * consumer who needs interactive (<1 s) single-query ANN should add
    * a ServingContext(corpusVersion) handle rather than bend this
    * path; micro-batch pipelines amortize the constant (22.6 q/s at
    * |Q| = 513). */
  private def serveBeam(adj: DataFrame, e: DataFrame, qs: DataFrame,
      efUpper: Int, ef0: Int, k: Int, hops0: Int,
      stats: Option[SearchStats], ptMod: Long): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, IntegerType,
      StructField, StructType}
    import scala.jdk.CollectionConverters._
    val spark = adj.sparkSession
    val sim = round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6)
    // ONE collect of the micro-batch query vectors; every hop's scoring
    // join reuses them as a broadcast local relation (the streaming
    // source is never re-evaluated per hop)
    val qProj = qs.select(col("q"), col("qv"), col("qn"))
    val qRows = qProj.collect()
    // loud bound instead of a driver OOM: per-hop driver traffic is
    // |Q|·ef0·2m id-width rows, fine for any micro-batch but not for a
    // corpus-sized probe set — that caller wants the batch dataflow
    require(qRows.length <= 65536,
      s"serving search is for micro-batch query sets (got " +
        s"${qRows.length} queries); pass serving = false for " +
        "corpus-sized probe sets")
    val qLocal = spark.createDataFrame(
      java.util.Arrays.asList(qRows: _*), qProj.schema)
    val e2 = e.select(col("vec_id").as("node"), col("v"), col("nrm"))
    val idSchema = StructType(Seq(
      StructField("q", qProj.schema("q").dataType),
      StructField("node", e2.schema("node").dataType)))
    def asLong(v: Any): Long = v match {
      case l: Long => l
      case i: Int => i.toLong
      case s: Short => s.toLong
      case b: Byte => b.toLong
      case other => throw new IllegalArgumentException(
        s"non-integral id in serving search: $other")
    }
    // id equality across numeric widths WITHOUT asLong: query ids are
    // not part of the integral-node-id contract (searchBatch compares
    // node =!= q generically), so the self-exclusion must not throw on
    // a non-integral q — numeric pairs compare by value, anything else
    // by boxed equality (never equal to an integral node id, i.e. no
    // exclusion — the right degenerate answer for a q outside the
    // corpus id space).
    def sameId(a: Any, b: Any): Boolean = (a, b) match {
      case (x: java.lang.Number, y: java.lang.Number) =>
        x.longValue == y.longValue
      case _ => a == b
    }
    // row_number's exact order: sim DESC (java Double.compare — the
    // same total order Spark sorts doubles by), ties → node ASC
    def beamOrder(a: (Any, Any, Double), b: (Any, Any, Double)): Boolean = {
      val c = java.lang.Double.compare(b._3, a._3)
      if (c != 0) c < 0 else asLong(a._2) < asLong(b._2)
    }
    // per-q top-`keep` with the (q, node) dedup: sort FIRST, then keep
    // the first (= best-ranked) copy per node — identical replayed rows
    // have identical sims so this equals keep-any under the contract,
    // and stays deterministic (keep-max) even if a contract-violating
    // duplicate carried a different sim
    def topPerQ(rows: Seq[(Any, Any, Double)], keep: Int)
        : Seq[(Any, Any, Double)] =
      rows.groupBy(_._1).valuesIterator.flatMap { rs =>
        rs.sortWith(beamOrder).distinctBy(r => r._2).take(keep)
      }.toSeq
    def collect3(df: DataFrame): Seq[(Any, Any, Double)] =
      df.collect().toSeq.map(r => (r.get(0), r.get(1), r.getDouble(2)))
    // LANDING (two jobs, both shuffle-free): the layer-≥1 member ids
    // are ABSOLUTELY bounded (strideFor: ≤ ~864 at any corpus size) —
    // collect them (one statically layer-pruned scan) and dedup on the
    // driver, then score them exactly: e2 is the streamed side, the
    // bounded id set ∪ the node-0 fallback (see searchBatch's scaladoc)
    // and the query vectors broadcast as local relations
    val zeroId: Any = e2.schema("node").dataType match {
      case org.apache.spark.sql.types.LongType => 0L
      case org.apache.spark.sql.types.IntegerType => 0
      case dt => throw new IllegalArgumentException(
        s"unsupported vec_id type in serving search: $dt")
    }
    val l1Ids = (adj.where(col("layer") >= 1).select(col("src"))
      .collect().map(_.get(0)).toSeq :+ zeroId).distinct
    val l1Local = spark.createDataFrame(
      java.util.Arrays.asList(l1Ids.map(Row(_)): _*),
      StructType(Seq(StructField("node", e2.schema("node").dataType))))
    val entryScored = collect3(
      e2.join(broadcast(l1Local), "node")
        .crossJoin(broadcast(qLocal))
        .select(col("q"), col("node"), sim.as("sim")))
    stats.foreach { st =>
      st.queries = qRows.length.toLong
      st.landingScored = entryScored.size.toLong
    }
    var frontier = topPerQ(entryScored, efUpper)
    // Cross-hop SEEN set + fixpoint termination — both provably
    // result-identical to the fixed hops0 schedule, both driver-only:
    //  - a (q, node) dropped from the hop beam can never re-enter it:
    //    the ef0-th frontier sim is monotone non-decreasing across
    //    hops (the beam only ever absorbs better candidates), and sims
    //    are static — so re-scoring an already-seen pair can only lose
    //    again, and filtering expansion against ALL seen pairs (batch
    //    filters against the current frontier only) changes no
    //    frontier. Seeded from the post-entry frontier, NOT all landing
    //    candidates: the entry beam keeps efUpper < ef0, so a landing
    //    candidate outside the entry top-efUpper may legitimately
    //    re-enter the wider hop beam (batch re-scores it; we must too).
    //  - once an expansion yields no unseen pair, the frontier is a
    //    FIXPOINT: the next hop would expand the same frontier against
    //    a seen-set that only grew — the remaining hops are identity,
    //    so stopping early returns the identical answer (measured on
    //    the standing x100 graph: typical micro-batches converge in
    //    3-5 of the 6 scheduled hops; SCALING_r13.json serving rows).
    val seen = scala.collection.mutable.HashSet[(Any, Any)]()
    seen ++= frontier.iterator.map(t => (t._1, t._2))
    var hopsRun = 0
    var fixpoint = false
    // TWO hop forms, selected by |Q| (measured on the standing x100
    // graph — SCALING_r13.json serving_qscale):
    //  - DRIVER-DEDUP (|Q| ≤ 16): expansion pairs collect explicitly
    //    and dedup against `seen` before the corpus pass — halves the
    //    scored candidate volume (scored_per_q 14.3k → 7.3k at x100,
    //    5-query batch) and detects the fixpoint BEFORE paying the
    //    score job; |Q| = 1 serves in 1.33 s vs the r12 1.43 s.
    //  - FUSED (larger |Q|): the expansion stays a broadcast subtree
    //    inside the score job — the r12 shape. The explicit round-trip
    //    was MEASURED a regression past |Q| ≈ 32 (|Q| = 513: 21.5 →
    //    37.6 s): a |Q|·ef0·2m-row LocalRelation per hop is plan-
    //    serialization bloat the BroadcastExchange collect never pays,
    //    and the single-threaded driver dedup of ~1M boxed pairs costs
    //    more than the duplicate scoring it saves. Large batches stop
    //    on an UNCHANGED FRONTIER instead (one score job later than
    //    the small-|Q| detector, same fixpoint argument).
    val driverDedup = qRows.length <= 16
    while (hopsRun < hops0 && !fixpoint) {
      hopsRun += 1
      val fLocal = spark.createDataFrame(
        java.util.Arrays.asList(frontier.map(t => Row(t._1, t._2)): _*),
        idSchema)
      val adj0 = {
        val a = adj.where(col("layer") === 0)
        if (ptMod > 0) {
          // the frontier is driver-resident, so its partitions are too:
          // a literal `pt IN (...)` prunes the scan at PLAN time — no
          // DPP subquery, nothing for PruneFilters to delete. When the
          // frontier already covers most partitions (a wide |Q| on a
          // small P) the filter saves nothing and only bloats the plan
          // literal — skip it; pruning changes the scan, never the
          // answer, so the two branches are result-identical.
          val pts = frontier
            .map(t => (((asLong(t._2) % ptMod) + ptMod) % ptMod).toInt)
            .distinct.map(Int.box)
          if (pts.size.toLong * 4 >= ptMod * 3) a
          else a.where(col("pt").isin(pts: _*))
        } else a
      }
      val expansion = adj0
        .join(broadcast(fLocal.withColumnRenamed("node", "src")), "src")
        .select(col("q"), col("dst").as("node"))
      if (driverDedup) {
        // the pairs round-trip through the driver explicitly — the
        // same rows the fused form's BroadcastExchange collects — then
        // dedup against the cross-hop seen set, mirroring
        // searchBatch's distinct + left_anti newIds
        val exPairs = expansion
          .collect().map(r => (r.get(0), r.get(1)))
          .distinct.filterNot(seen)
        // the |Q|·ef0·degree bound that makes the driver beam safe, as
        // a LOUD invariant rather than scaladoc: the graph build caps
        // the layer-0 degree (mFor ≤ ~64 with reverse edges), so a
        // local relation past frontier·1024 means a corpus-sized frame
        // is about to be broadcast — fail before the driver does.
        require(exPairs.length <= math.max(1, frontier.length) * 1024,
          s"serving expansion exploded: ${exPairs.length} pairs from " +
            s"a ${frontier.length}-row frontier — adjacency degree is " +
            "not bounded; use the batch dataflow (serving = false)")
        if (exPairs.isEmpty) fixpoint = true
        else {
          seen ++= exPairs
          val exLocal = spark.createDataFrame(
            java.util.Arrays.asList(exPairs.map(p => Row(p._1, p._2)): _*),
            idSchema)
          val scored = collect3(
            e2.join(broadcast(exLocal), "node")
              .join(broadcast(qLocal), "q")
              .select(col("q"), col("node"), sim.as("sim")))
          stats.foreach { st =>
            st.hopScored ::= scored.size.toLong
            st.hopAdjRead ::= adj0.count()
          }
          frontier = topPerQ(scored ++ frontier, ef0)
        }
      } else {
        val scored = collect3(
          e2.join(broadcast(expansion), "node")
            .join(broadcast(qLocal), "q")
            .select(col("q"), col("node"), sim.as("sim")))
        stats.foreach { st =>
          st.hopScored ::= scored.size.toLong
          st.hopAdjRead ::= adj0.count()
        }
        val next = topPerQ(scored ++ frontier, ef0)
        if (next.toSet == frontier.toSet) fixpoint = true
        frontier = next
      }
    }
    // FINAL (no extra job): top-k per q from the driver-resident beam
    val outSchema = StructType(Seq(
      StructField("q", qProj.schema("q").dataType),
      StructField("rk", IntegerType, nullable = false),
      StructField("nb", e2.schema("node").dataType),
      StructField("sim", DoubleType)))
    val outRows = frontier.groupBy(_._1).valuesIterator.flatMap { rs =>
      rs.filter(t => !sameId(t._2, t._1))
        .sortWith(beamOrder).take(k).zipWithIndex
        .map { case ((q, node, s), i) => Row(q, i + 1, node, s) }
    }.toSeq
    spark.createDataFrame(
      java.util.Arrays.asList(outRows: _*), outSchema)
  }
}
