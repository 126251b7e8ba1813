package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions.{dot, toDouble}

/** [[HnswGraph.build]]'s `sq8 = true` scorer — the broadcast-ceiling
  * escape for corpora whose raw vector table (~0.5 KB/row) outgrows
  * executor memory. The byte-code broadcast is 8× smaller; the cost is
  * approximate edge SELECTION (search still re-scores exact vectors),
  * so the spec measures exactly that: search recall over a quantized-
  * build graph vs the brute answer, on a generated corpus large enough
  * (6k vectors) that the NN-descent refinement — the part whose scoring
  * was quantized — is what the edges come from, not the seed buckets.
  * Determinism and the tinyint storage width are pinned alongside. */
class HnswSq8BuildSpec extends SparkSpec {

  private val n = 6000L

  private def corpus: DataFrame = {
    import spark.implicits._
    spark.range(n).map(i => graft.ScaleData.emb(i))
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
  }

  test("sq8 codes: tinyint storage, bounds reconstruct the range " +
      "endpoints exactly") {
    val e = corpus.limit(64).persist()
    e.count()
    val q = HnswGraph.sq8Codes(e)
    val f = q.codes.schema("code").dataType
    assert(f === org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.ByteType, containsNull = false) ||
      f.simpleString.startsWith("array<tinyint>"),
      s"code column must store bytes, got ${f.simpleString}")
    // a dimension's min and max quantize to the interval endpoints
    assert(q.mn.length === q.mx.length)
    assert(q.mn.zip(q.mx).forall { case (a, b) => a <= b })
    e.unpersist()
  }

  test("codegen sq8 pair scorer (Sq8Dot) is bit-identical to the " +
      "interpreted HOF form it replaced") {
    val e = corpus.where(col("vec_id") < 2000).persist()
    e.count()
    val q = HnswGraph.sq8Codes(e)
    // a deterministic 38k-pair probe set spanning the id space
    val pairs = e.select(col("vec_id").as("src"))
      .crossJoin(spark.range(1, 21).select(col("id").as("k")))
      .select(col("src"),
        pmod(col("src") * 31 + col("k") * 97, lit(2000L)).as("dst"))
      .where(col("src") =!= col("dst"))
    val cg = HnswGraph.scorePairsSq8(q, pairs)
    val hof = HnswGraph.scorePairsSq8Interp(q, pairs)
    assert(cg.count() === hof.count())
    assert(cg.exceptAll(hof).count() === 0L &&
      hof.exceptAll(cg).count() === 0L,
      "codegen dequantize-and-dot must reproduce the interpreted " +
        "form's sims bit-for-bit (same association, same fold order)")
    e.unpersist()
  }

  test("Sq8Dot fails loudly on a code/bounds length mismatch instead " +
      "of truncating to a plausible-but-wrong similarity") {
    import spark.implicits._
    // 2-byte codes against 3-dim bounds: the r14 form silently looped
    // min(len) elements; a corrupt code array or stale mn/mx must throw
    val rows = Seq((Seq[Byte](1, 2), Seq[Byte](3, 4))).toDF("a", "b")
    val bad = rows.select(graft.plans.Sq8Dot(col("a"), col("b"),
      Seq(0.0, 0.0, 0.0), Seq(1.0, 1.0, 1.0)).as("s"))
    val ex = intercept[Exception] { bad.collect() }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c =>
      c.isInstanceOf[IllegalArgumentException] &&
        c.getMessage.contains("Sq8Dot")),
      s"expected a loud Sq8Dot length error, got $ex")
  }

  test("quantized-scoring build: deterministic, and search recall@5 " +
      "over its graph stays within noise of the exact-scoring build") {
    val e = corpus.persist()
    e.count()
    val cells = HnswGraph.signCells(e, HnswGraph.bitsFor(n)).persist()
    val m = HnswGraph.mFor(n)
    val stride = HnswGraph.strideFor(n)
    val adj8a = HnswGraph.build(e, cells, m = m, stride = stride,
      sq8 = true).persist()
    val edges = adj8a.count()
    assert(edges > 0)
    val adj8b = HnswGraph.build(e, cells, m = m, stride = stride,
      sq8 = true)
    assert(adj8b.exceptAll(adj8a).count() === 0 &&
      adj8a.exceptAll(adj8b).count() === 0,
      "two quantized builds must produce the identical graph")

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
    val ann8 = HnswGraph.search(adj8a, e, qs).select(col("q"), col("nb"))
    val recall8 = ann8.intersect(brute).count().toDouble / (5.0 * nQ)
    info(f"sq8-build recall@5 = $recall8%.3f over $nQ probes (m=$m)")
    assert(recall8 >= 0.9,
      f"recall@5 $recall8%.3f under quantized edge selection fell " +
        "below the 0.9 floor — the ~1-LSB scoring error is supposed " +
        "to be selection-invisible at this scale")
    e.unpersist(); cells.unpersist(); adj8a.unpersist()
    qs.unpersist(); brute.unpersist()
  }
}
