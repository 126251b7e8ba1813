package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions.{dot, toDouble}

/** The CI gate for GENERATED-CORPUS recall — the regression class no
  * sf0.01 spec can catch. History that motivates it: r8 shipped an s11
  * design whose sf0.01 recall (0.75) looked like a schedule-tuning
  * matter, and the r9 scale probe then measured 0.05–0.25 at x10 — the
  * sign-bucket edges degrade as [[HnswGraph.bitsFor]] splits buckets
  * into near-identical members, which only MANIFESTS past ~10k vectors.
  * Every schedule/build change since has had its recall claims proven
  * on the generated corpus by hand-run sweeps; this spec moves the
  * x10-scale floor into `sbt test`, so the next change that holds at
  * sf0.01 but collapses at scale fails before a probe has to find it.
  * Verified discriminating: at this corpus the r8 degree (m=6) measures
  * far below the floor while the derived [[HnswGraph.mFor]] degree
  * clears it with margin (the r9 x10 sweep: M=8 → 0.62, M=16 → 0.91).
  *
  * The corpus is [[graft.ScaleData]]'s x10 embeddings slice (20k
  * vectors, pure function of (seed, id) — no files, identical on every
  * machine), probes every 53rd vector (378 queries — enough that the
  * floor sits ~8σ under the expected value), and the build runs the
  * derived constants ([[HnswGraph.mFor]]/bitsFor/strideFor) exactly as
  * s11 does.
  */
class ScaleRecallGateSpec extends SparkSpec {

  test("x10 generated-corpus recall@5 stays above the 0.85 floor " +
      "under the derived build constants") {
    import spark.implicits._
    val n = 20000L
    val e = spark.range(n).map(i => graft.ScaleData.emb(i))
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .persist()
    e.count()
    val m = HnswGraph.mFor(n)
    assert(m > HnswGraph.DefaultM,
      "the x10 corpus must exercise the degree law's first step")
    val cells = HnswGraph.signCells(e, HnswGraph.bitsFor(n))
    val adj = HnswGraph.build(e, cells, m = m,
      stride = HnswGraph.strideFor(n)).persist()
    assert(adj.count() > 0)
    val qs = e.where(col("vec_id") % 53 === 0)
      .select(col("vec_id").as("q"), col("v").as("qv"),
        col("nrm").as("qn"))
      .persist()
    val nQ = qs.count()
    val w = Window.partitionBy(col("q"))
      .orderBy(col("sim").desc, col("nb"))
    val brute = qs.join(e, col("vec_id") =!= col("q"))
      .select(col("q"), col("vec_id").as("nb"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6)
          .as("sim"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 5).select(col("q"), col("nb"))
    val ann = HnswGraph.search(adj, e, qs).select(col("q"), col("nb"))
      .persist()
    val recall = ann.intersect(brute).count().toDouble / (5.0 * nQ)
    info(f"x10 recall@5 = $recall%.3f over $nQ probes (m=$m)")
    assert(recall >= 0.85,
      f"recall@5 $recall%.3f at the x10 generated corpus fell below " +
        "the 0.85 scale floor — the design regressed in exactly the " +
        "way sf0.01 specs cannot see")

    // the SERVING path at the same scale (the r11 verdict's item 6):
    // the driver-beam + statically-pruned form must answer EXACTLY like
    // the batch path over the standing partitioned layout — so its
    // recall is the batch recall, and a pruning change that silently
    // drops partitions (the PruneFilters/MSCK class of bug r11
    // documented) fails here, at x10, in CI. A micro-batch-sized probe
    // subset keeps the serving contract honest (|Q| ≤ ~32).
    val table = "scale_gate_serving"
    SnapshotMerge.dropTableAndLocation(spark, table)
    HnswGraph.writeGraph(adj, table, n)
    val standing = spark.table(table)
    val ptMod = HnswGraph.ptFor(n)
    val qsServe = qs.where(col("q") % 530 === 0) // 38 of the 378 probes
    val served = HnswGraph.search(standing, e, qsServe,
      ptMod = ptMod, serving = true)
    val batchOnStanding = HnswGraph.search(standing, e, qsServe)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("q"), col("rk"), col("nb")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    assert(key(served) === key(batchOnStanding),
      "serving path diverged from the batch search over the standing " +
        "partitioned layout at x10 — pruning changed an answer")
    val servedRecall = served.select(col("q"), col("nb"))
      .intersect(brute.join(qsServe.select(col("q")), "q"))
      .count().toDouble / (5.0 * qsServe.count())
    info(f"x10 SERVING recall@5 = $servedRecall%.3f over " +
      f"${qsServe.count()} probes")
    assert(servedRecall >= 0.85,
      f"serving recall@5 $servedRecall%.3f fell below the 0.85 floor")
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    e.unpersist(); adj.unpersist(); qs.unpersist(); ann.unpersist()
  }
}
